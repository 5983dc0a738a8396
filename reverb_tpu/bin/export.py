"""`reverb-export`: export the serving function set to disk.

Parity target: the reference export layer (SURVEY.md §2.8) —
bin/export_jit.py (TorchScript) and bin/export_onnx_{cpu,gpu,bpu}.py /
export_ipex.py, which split the model into encoder/ctc/decoder subgraphs
with explicit cache tensors.  TPU-native artifact set:

  - `--format stablehlo` (default): one portable serialized-StableHLO file
    per subgraph (encoder_chunk / ctc_activation / attention_decoder) with
    weights baked in as constants + a manifest.json — the ONNX-file
    analogue, reloadable with reverb_tpu.export.aot.load_serialized;
  - `--format aot`: AOT-compile the same set for the local backend and
    prime a persistent XLA compilation cache directory, so serving
    processes start without online compilation (TorchScript-warm-start
    analogue).
"""

from __future__ import annotations

import argparse
import sys


def get_args(argv=None):
    p = argparse.ArgumentParser(description='export serving functions')
    p.add_argument('--config', required=True, help='train/config yaml')
    p.add_argument('--checkpoint', required=True, help='.npz or .pt ckpt')
    p.add_argument('--output_dir', required=True)
    p.add_argument('--format', choices=['stablehlo', 'aot'],
                   default='stablehlo')
    p.add_argument('--chunk_size', type=int, default=16,
                   help='decoding chunk (encoder frames)')
    p.add_argument('--num_left_chunks', type=int, default=16)
    p.add_argument('--batch_size', type=int, default=1)
    p.add_argument('--rescoring_nbest', type=int, default=10)
    p.add_argument('--max_hyp_len', type=int, default=64)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from reverb_tpu.cli.reverb import ReverbASR
    from reverb_tpu.export import aot

    model = ReverbASR(args.config, args.checkpoint)
    kw = dict(chunk_size=args.chunk_size,
              num_left_chunks=args.num_left_chunks,
              batch_size=args.batch_size,
              rescoring_nbest=args.rescoring_nbest,
              max_hyp_len=args.max_hyp_len)
    if args.format == 'stablehlo':
        paths = aot.serialize_serving_functions(
            model.params, model.model_config, args.output_dir, **kw)
        for name, path in sorted(paths.items()):
            print(f'exported {name} -> {path}')
    else:
        aot.enable_persistent_cache(args.output_dir)
        compiled, info = aot.export_serving_functions(
            model.params, model.model_config, **kw)
        for name in sorted(compiled):
            print(f'compiled {name} (cache primed in {args.output_dir})')
        print(f"window={info['window']} cache_t={info['cache_t']}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
