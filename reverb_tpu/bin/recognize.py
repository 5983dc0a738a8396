"""Batch dataset decoding for WER evaluation.

Parity: asr/wenet/bin/recognize.py:29-368 — decode a raw/shard data list with
one or more modes (augmentation disabled, static batching) and write one
`text` file per mode under result_dir/<mode>/.
"""

from __future__ import annotations

import argparse
import logging
import os

import yaml


def get_args(argv=None):
    p = argparse.ArgumentParser(description='batch recognize with reverb-tpu')
    p.add_argument('--config', required=True, help='train/model config yaml')
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--data_type', default='raw', choices=['raw', 'shard'])
    p.add_argument('--test_data', required=True)
    p.add_argument('--result_dir', required=True)
    p.add_argument('--modes', nargs='+', default=['attention_rescoring'])
    p.add_argument('--batch_size', type=int, default=16)
    p.add_argument('--beam_size', type=int, default=10)
    p.add_argument('--ctc_weight', type=float, default=0.1)
    p.add_argument('--reverse_weight', type=float, default=0.0)
    p.add_argument('--blank_penalty', type=float, default=0.0)
    p.add_argument('--length_penalty', type=float, default=0.0)
    p.add_argument('--verbatimicity', type=float, default=1.0)
    p.add_argument('--override_config', action='append', default=[])
    # HLG decoding (reference recognize.py --hlg/--word/--*_scale flags)
    p.add_argument('--hlg', default='', help='HLG graph (OpenFST text)')
    p.add_argument('--word', default='', help='word symbol table path')
    p.add_argument('--lm_scale', type=float, default=0.0)
    p.add_argument('--decoder_scale', type=float, default=0.0)
    p.add_argument('--r_decoder_scale', type=float, default=0.0)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    import numpy as np

    from reverb_tpu.cli.reverb import get_blank_id
    from reverb_tpu.convert.torch_ckpt import load_reverb_checkpoint, load_npz
    from reverb_tpu.data.dataset import Dataset
    from reverb_tpu.decode.api import decode
    from reverb_tpu.models.asr_model import ModelConfig
    from reverb_tpu.text.tokenizer import init_tokenizer
    from reverb_tpu.utils.config import override_config

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    configs = override_config(configs, args.override_config)
    tokenizer = init_tokenizer(configs)
    configs, blank_id = get_blank_id(configs, tokenizer.symbol_table)
    configs['output_dim'] = len(tokenizer.symbol_table)

    # test pipeline: no augmentation, static batch (recognize.py:196-233)
    conf = dict(configs['dataset_conf'])
    for k in ('spec_aug', 'spec_sub', 'spec_trim', 'speed_perturb',
              'apply_telephony', 'apply_rir', 'shuffle'):
        conf[k] = False
    conf['sort'] = False
    conf['cycle'] = 1
    conf['batch_conf'] = {'batch_type': 'static',
                          'batch_size': args.batch_size}
    ds = Dataset(args.data_type, args.test_data, tokenizer, conf,
                 partition=False)

    cfg = ModelConfig.from_config(configs)
    if args.checkpoint.endswith('.npz'):
        params, _ = load_npz(args.checkpoint)
    else:
        params = load_reverb_checkpoint(args.checkpoint)
    if 'global_cmvn' not in params.get('encoder', {}):
        cmvn_conf = configs.get('cmvn_conf', {}) or {}
        if cmvn_conf.get('cmvn_file'):
            from reverb_tpu.frontend.cmvn import load_cmvn
            mean, istd = load_cmvn(cmvn_conf['cmvn_file'],
                                   cmvn_conf.get('is_json_cmvn', True))
            params['encoder']['global_cmvn'] = {'mean': mean, 'istd': istd}

    files = {}
    for mode in args.modes:
        d = os.path.join(args.result_dir, mode)
        os.makedirs(d, exist_ok=True)
        files[mode] = open(os.path.join(d, 'text'), 'w', encoding='utf8')

    cat_embs = np.asarray([args.verbatimicity, 1 - args.verbatimicity],
                          np.float32)
    hlg_graph, word_table = None, {}
    if any(m.startswith('hlg') for m in args.modes):
        from reverb_tpu.decode.hlg import Fst
        hlg_graph = Fst.load(args.hlg)
        if args.word:
            with open(args.word, encoding='utf8') as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        word_table[int(parts[1])] = parts[0]
    n = 0
    for batch in ds:
        results = decode(
            params, cfg, args.modes, batch['feats'], batch['feats_lengths'],
            beam_size=args.beam_size, ctc_weight=args.ctc_weight,
            reverse_weight=args.reverse_weight,
            blank_penalty=args.blank_penalty,
            length_penalty=args.length_penalty, cat_embs=cat_embs,
            hlg_graph=hlg_graph, hlg_lm_scale=args.lm_scale,
            hlg_decoder_scale=args.decoder_scale,
            hlg_r_decoder_scale=args.r_decoder_scale)
        for mode in args.modes:
            for key, res in zip(batch['keys'], results[mode]):
                if mode.startswith('hlg'):
                    # hlg results carry word ids (get_texts semantics)
                    text = ' '.join(word_table.get(w, str(w))
                                    for w in res.tokens)
                else:
                    text, _ = tokenizer.detokenize(res.tokens)
                files[mode].write(f'{key} {text}\n')
        n += len(batch['keys'])
        logging.info('decoded %d utterances', n)
    for f in files.values():
        f.close()


if __name__ == '__main__':
    main()
