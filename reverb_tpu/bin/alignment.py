"""CTC forced alignment → Praat TextGrid.

Parity: asr/wenet/bin/alignment.py — align reference transcripts to audio
with viterbi CTC (decode/ctc_utils.py runs the DP on device) and write one
TextGrid per utterance.
"""

from __future__ import annotations

import argparse
import logging
import os


def _write_textgrid(path, intervals, duration):
    """intervals: list of (start_s, end_s, label)."""
    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"', '',
             'xmin = 0', f'xmax = {duration}', 'tiers? <exists>', 'size = 1',
             'item []:', '    item [1]:', '        class = "IntervalTier"',
             '        name = "tokens"', '        xmin = 0',
             f'        xmax = {duration}',
             f'        intervals: size = {len(intervals)}']
    for i, (s, e, label) in enumerate(intervals, 1):
        lines += [f'        intervals [{i}]:', f'            xmin = {s}',
                  f'            xmax = {e}',
                  f'            text = "{label}"']
    with open(path, 'w', encoding='utf8') as f:
        f.write('\n'.join(lines) + '\n')


def get_args(argv=None):
    p = argparse.ArgumentParser(description='CTC forced alignment')
    p.add_argument('--config', required=True)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--data_type', default='raw', choices=['raw', 'shard'])
    p.add_argument('--input_file', required=True, help='data list to align')
    p.add_argument('--result_dir', required=True)
    p.add_argument('--frame_rate', type=float, default=0.04,
                   help='seconds per encoder frame (4x subsample × 10 ms)')
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from reverb_tpu.cli.reverb import get_blank_id
    from reverb_tpu.convert.torch_ckpt import load_npz, load_reverb_checkpoint
    from reverb_tpu.data.dataset import Dataset
    from reverb_tpu.decode.api import encode_and_ctc
    from reverb_tpu.decode.ctc_utils import force_align, gen_ctc_peak_time
    from reverb_tpu.models.asr_model import ModelConfig
    from reverb_tpu.text.tokenizer import init_tokenizer

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    tokenizer = init_tokenizer(configs)
    configs, blank_id = get_blank_id(configs, tokenizer.symbol_table)
    configs['output_dim'] = len(tokenizer.symbol_table)
    cfg = ModelConfig.from_config(configs)
    params = (load_npz(args.checkpoint)[0] if args.checkpoint.endswith('.npz')
              else load_reverb_checkpoint(args.checkpoint))

    conf = dict(configs['dataset_conf'])
    for k in ('spec_aug', 'spec_sub', 'spec_trim', 'speed_perturb',
              'apply_telephony', 'apply_rir', 'shuffle', 'sort'):
        conf[k] = False
    conf['cycle'] = 1
    conf['batch_conf'] = {'batch_type': 'static', 'batch_size': 1}
    ds = Dataset(args.data_type, args.input_file, tokenizer, conf,
                 partition=False)
    os.makedirs(args.result_dir, exist_ok=True)

    cat = jnp.array([1.0, 0.0], jnp.float32)
    for batch in ds:
        _, enc_lens, ctc_probs = encode_and_ctc(
            params, cfg, jnp.asarray(batch['feats']),
            jnp.asarray(batch['feats_lengths']), cat)
        T = int(enc_lens[0])
        y = batch['target'][0][:batch['target_lengths'][0]].tolist()
        ali = force_align(np.asarray(ctc_probs[0][:T]), y, blank_id)
        tokens = tokenizer.ids2tokens(y)
        peaks = gen_ctc_peak_time(ali, blank_id)
        intervals = []
        for tok, t in zip(tokens, peaks):
            s = t * args.frame_rate
            intervals.append((round(s, 3), round(s + args.frame_rate, 3),
                              tok))
        key = batch['keys'][0]
        _write_textgrid(os.path.join(args.result_dir, f'{key}.TextGrid'),
                        intervals, T * args.frame_rate)
        logging.info('aligned %s (%d tokens)', key, len(tokens))


if __name__ == '__main__':
    main()
