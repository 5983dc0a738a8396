"""Pseudo-streaming demo: cut audio into chunks and transcribe incrementally.

Parity: examples/stream.py:26-53 of the reference (10 s chunks transcribed
while playing) — here the chunks feed the true streaming encoder path.
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', required=True, help='model dir')
    p.add_argument('--audio_file', required=True)
    p.add_argument('--chunk_secs', type=float, default=10.0)
    args = p.parse_args()

    import numpy as np
    from reverb_tpu.cli.model import StreamingASR
    from reverb_tpu.cli.reverb import load_model
    from reverb_tpu.frontend.audio import load_audio, resample, to_mono

    model = load_model(args.model)
    stream = StreamingASR(model)
    wave, sr = load_audio(args.audio_file)
    wave = to_mono(wave)
    if sr != 16000:
        wave = resample(wave, sr, 16000)
    chunk = int(args.chunk_secs * 16000)
    for i in range(0, len(wave), chunk):
        stream.accept_waveform(wave[i:i + chunk])
        print(f'[{i / 16000:7.1f}s] {stream.text()}')
    print('FINAL:', stream.text(mode='attention_rescoring'))


if __name__ == '__main__':
    main()
