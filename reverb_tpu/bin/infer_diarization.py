"""Diarization inference: audio files → RTTM per file.

Parity: diarization/infer_pyannote3.0.py:17-45 — same CLI shape
(`audios... --out-dir DIR --pipeline-model NAME`); models load from an .npz
checkpoint dir instead of a HF pyannote pipeline.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description='Run diarization on audio files')
    p.add_argument('audios', nargs='+')
    p.add_argument('--out-dir', type=Path, required=True)
    p.add_argument('--model-dir', type=Path, default=None,
                   help='dir with segmentation.npz + embedding.npz '
                        '(random init if absent — for smoke runs)')
    p.add_argument('--pipeline-model', type=str, default='reverb-diar-v1',
                   help='accepted for CLI parity')
    p.add_argument('--segmentation-ckpt', type=str, default=None,
                   help='pyannote-format PyanNet checkpoint (.ckpt/.bin), '
                        'e.g. a released Revai/reverb-diarization model')
    p.add_argument('--embedding-ckpt', type=str, default=None,
                   help='wespeaker ResNet34 embedding checkpoint (.pt)')
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    import jax
    import numpy as np

    from reverb_tpu.convert.torch_ckpt import load_npz
    from reverb_tpu.diar.models import (init_embedding_model,
                                        init_segmentation)
    from reverb_tpu.diar.pipeline import Diarizer, write_rttm
    from reverb_tpu.frontend.audio import load_audio, resample, to_mono

    if args.segmentation_ckpt:
        # released pyannote/wespeaker-format checkpoints (diar/pyannet.py)
        diar = Diarizer.from_pyannote_checkpoints(args.segmentation_ckpt,
                                                  args.embedding_ckpt)
    else:
        if args.model_dir and (args.model_dir / 'segmentation.npz').exists():
            seg_params, _ = load_npz(args.model_dir / 'segmentation.npz')
            emb_params, _ = load_npz(args.model_dir / 'embedding.npz')
        else:
            seg_params = init_segmentation(jax.random.PRNGKey(0))
            emb_params = init_embedding_model(jax.random.PRNGKey(1))
        diar = Diarizer(seg_params, emb_params)
    for audio in args.audios:
        print('Processing', audio)
        x, sr = load_audio(audio)
        x = to_mono(x)
        if sr != 16000:
            x = resample(x, sr, 16000)
        segments = diar(np.asarray(x, np.float32), 16000)
        uri = os.path.splitext(os.path.basename(audio))[0]
        with open(args.out_dir / f'{uri}.rttm', 'w') as f:
            write_rttm(f, segments, uri)


if __name__ == '__main__':
    main()
