"""CLI parity with asr/wer_evaluation/aggregate_scoring.py: micro-average WER
across fstalign JSON logs."""

from __future__ import annotations

import argparse
from pathlib import Path

from reverb_tpu.eval.wer import WERAggregator


def main(argv=None):
    p = argparse.ArgumentParser(
        description='Aggregate WER over fstalign JSON outputs.')
    p.add_argument('fstalign_out', type=Path)
    args = p.parse_args(argv)
    agg = WERAggregator().aggregate_dir(args.fstalign_out)
    print(agg.summary())


if __name__ == '__main__':
    main()
