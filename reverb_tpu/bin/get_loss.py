"""Per-utterance loss scoring for data filtering.

Parity: asr/wenet/bin/get_loss.py — run the model over a data list and emit
`key loss loss_att loss_ctc` per utterance (used to mine bad transcripts).
"""

from __future__ import annotations

import argparse
import logging


def get_args(argv=None):
    p = argparse.ArgumentParser(description='score per-utterance losses')
    p.add_argument('--config', required=True)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--data_type', default='raw', choices=['raw', 'shard'])
    p.add_argument('--test_data', required=True)
    p.add_argument('--output', required=True)
    p.add_argument('--batch_size', type=int, default=8)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import yaml

    from reverb_tpu.cli.reverb import get_blank_id
    from reverb_tpu.convert.torch_ckpt import load_npz, load_reverb_checkpoint
    from reverb_tpu.data.dataset import Dataset
    from reverb_tpu.models.asr_model import ModelConfig, compute_loss
    from reverb_tpu.text.tokenizer import init_tokenizer

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    tokenizer = init_tokenizer(configs)
    configs, _ = get_blank_id(configs, tokenizer.symbol_table)
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
    ds = Dataset(args.data_type, args.test_data, tokenizer, conf,
                 partition=False)

    @jax.jit
    def loss_fn(params, batch):
        out = compute_loss(params, cfg, batch, rng=None)
        return out

    with open(args.output, 'w') as out:
        for batch in ds:
            db = {k: jnp.asarray(v) for k, v in batch.items()
                  if hasattr(v, 'dtype')}
            m = loss_fn(params, db)
            out.write(f"{batch['keys'][0]} {float(m['loss']):.4f} "
                      f"{float(m['loss_att']):.4f} "
                      f"{float(m['loss_ctc']):.4f}\n")


if __name__ == '__main__':
    main()
