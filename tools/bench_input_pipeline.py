"""Training input-pipeline throughput vs the flagship step appetite.

The train step consumes B×T feature frames per step; the host-side pipeline
(audio decode → fbank → spec_aug → shuffle → sort → batch, data/dataset.py)
must produce them faster than the device consumes them or the trainer
starves (the classic way a 38%-MFU step becomes a 15%-MFU run).  Reference
counterpart: torch DataLoader workers over dataset/datapipes.py.

Builds a synthetic raw-list corpus of ~5.1 s utterances (the flagship's
B=16×512-frame batch shape), runs the REAL Dataset chain with the flagship
dataset_conf, and reports:
  - utterances/s and feature-frames/s through the full chain
  - audio-seconds/s (pipeline xRT)
  - headroom = produced frames/s ÷ consumed frames/s at the measured
    flagship step time (tools/bench_train_mfu.py)

Prints one JSON line.  CPU-only (the pipeline is host-side by design).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import wave as wave_mod
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000
UTT_S = 5.12                   # → ~512 fbank frames, the bench batch shape


def build_corpus(root: Path, n: int) -> Path:
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        wav = root / f'u{i:05d}.wav'
        if not wav.exists():
            x = (rng.randn(int(UTT_S * SR)) * 0.1).astype(np.float32)
            with wave_mod.open(str(wav), 'wb') as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SR)
                w.writeframes((x * 32000).astype(np.int16).tobytes())
        txt = ' '.join('word%d' % rng.randint(50) for _ in range(12))
        lines.append(json.dumps({'key': f'u{i:05d}', 'wav': str(wav),
                                 'txt': txt}))
    lst = root / 'data.list'
    lst.write_text('\n'.join(lines) + '\n')
    return lst


class _CharTokenizer:
    """Minimal stand-in (the tokenize stage is not the cost being measured;
    sentencepiece adds ~µs/utt)."""

    def tokenize(self, txt):
        toks = list(txt.replace(' ', '_'))
        return toks, [ord(c) % 1000 for c in toks]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--n_utts', type=int, default=512)
    p.add_argument('--batch_size', type=int, default=16)
    p.add_argument('--num_workers', type=int, default=8)
    p.add_argument('--step_ms', type=float, default=112.5,
                   help='measured flagship step time (bench_train_mfu)')
    p.add_argument('--workdir', default='/tmp/reverb_input_bench')
    p.add_argument('--device_feats', action='store_true',
                   help='bench the host side of dataset_conf.device_feats '
                        '(fbank+spec_aug move on-device; host ships raw '
                        'PCM + frame counts)')
    args = p.parse_args(argv)

    from reverb_tpu.data.dataset import Dataset

    lst = build_corpus(Path(args.workdir), args.n_utts)
    conf = {
        'fbank_conf': {'num_mel_bins': 80, 'frame_length': 25,
                       'frame_shift': 10, 'dither': 0.1},
        'filter_conf': {'max_length': 2000, 'min_length': 10},
        'spec_aug': True,
        'spec_aug_conf': {'num_t_mask': 2, 'num_f_mask': 2,
                          'max_t': 50, 'max_f': 10},
        'shuffle': True, 'shuffle_conf': {'shuffle_size': 1500},
        'sort': True, 'sort_conf': {'sort_size': 500},
        'batch_conf': {'batch_type': 'static',
                       'batch_size': args.batch_size},
        'num_workers': args.num_workers,
        'cycle': 10_000,           # loop the list; we stop on wall time
        'list_shuffle': False,
        'device_feats': args.device_feats,
    }
    ds = Dataset('raw', str(lst), _CharTokenizer(), conf,
                 partition=False).prefetch(8)

    it = iter(ds)
    # warm: first batches pay file-open + thread-pool spin-up
    for _ in range(4):
        next(it)

    t0 = time.perf_counter()
    frames = utts = 0
    batches = 0
    while time.perf_counter() - t0 < 15.0:
        b = next(it)
        frames += int(np.sum(b['feats_lengths']))
        utts += int(b['feats'].shape[0])
        batches += 1
    dt = time.perf_counter() - t0

    frames_per_s = frames / dt
    appetite = args.batch_size * 512 / (args.step_ms / 1e3)
    what = ('raw-PCM host side of device_feats' if args.device_feats
            else 'host fbank+spec_aug+sort+batch')
    print(json.dumps({
        'metric': 'train input pipeline throughput '
                  f'({what}, {args.num_workers} workers)',
        'value': round(frames_per_s, 0),
        'unit': 'feature frames/s',
        'utts_per_s': round(utts / dt, 1),
        'audio_xrt': round(utts * UTT_S / dt, 1),
        'step_appetite_frames_per_s': round(appetite, 0),
        'headroom': round(frames_per_s / appetite, 2),
        'batches': batches,
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
