"""Host-side audio IO: WAV/PCM decode + resampling.

The reference delegates to torchaudio/sox (asr/wenet/cli/reverb.py:122-128,
asr/wenet/dataset/processor.py:179-211). Here decode runs on host (CPU) —
audio bytes never belong on a TPU — while everything after the raw waveform
is device-side. WAV parsing is stdlib/NumPy; other containers (mp3/flac/ogg)
are decoded through an external ffmpeg binary when present.

Returned waveforms are float32 in [-1, 1) normalized scale; multiply by
1<<15 before fbank to match the reference's int16-scale features
(processor.py:361, cli/reverb.py:122 normalize=False).
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import subprocess

import numpy as np
from scipy import signal as _signal


class AudioDecodeError(RuntimeError):
    pass


def _parse_wav(data: bytes):
    """Minimal RIFF/WAVE parser: PCM16/24/32, float32, mono/multi-channel."""
    if len(data) < 44 or data[:4] != b'RIFF' or data[8:12] != b'WAVE':
        raise AudioDecodeError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos:pos + 4]
        size = struct.unpack('<I', data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if chunk_id == b'fmt ':
            fmt = struct.unpack('<HHIIHH', body[:16])
        elif chunk_id == b'data':
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise AudioDecodeError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(raw) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1  # assume PCM subtype
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(raw, dtype='<i2').astype(np.float32) / (1 << 15)
        elif bits == 32:
            x = np.frombuffer(raw, dtype='<i4').astype(np.float32) / (1 << 31)
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = np.where(x >= (1 << 23), x - (1 << 24), x).astype(np.float32)
            x /= (1 << 23)
        else:
            raise AudioDecodeError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(raw, dtype='<f4').astype(np.float32)
    else:
        raise AudioDecodeError(f"unsupported WAV format code {audio_format}")
    if channels > 1:
        x = x.reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, sample_rate


def _ffmpeg_decode(path: str, target_rate: int | None = None):
    ffmpeg = shutil.which('ffmpeg')
    if ffmpeg is None:
        raise AudioDecodeError(
            f"cannot decode {path!r}: not a WAV and no ffmpeg binary available")
    cmd = [ffmpeg, '-v', 'error', '-i', path, '-f', 'f32le', '-acodec',
           'pcm_f32le']
    if target_rate:
        cmd += ['-ar', str(target_rate)]
    cmd += ['-ac', '1', 'pipe:1']
    out = subprocess.run(cmd, capture_output=True, check=False)
    if out.returncode != 0:
        raise AudioDecodeError(out.stderr.decode(errors='replace'))
    x = np.frombuffer(out.stdout, dtype='<f4').reshape(-1, 1)
    return x, (target_rate or 16000)


def load_audio(path: str, start: float | None = None, end: float | None = None):
    """Load an audio file → (waveform (T, C) float32 in [-1,1), sample_rate).

    start/end are optional sub-segment bounds in seconds
    (reference processor.py:179-211 decode_wav start/end support).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == '.wav':
        with open(path, 'rb') as f:
            x, sr = _parse_wav(f.read())
    else:
        x, sr = _ffmpeg_decode(path)
    if start is not None or end is not None:
        s = int((start or 0) * sr)
        e = int(end * sr) if end is not None else x.shape[0]
        x = x[s:e]
    return x, sr


def to_mono(x: np.ndarray) -> np.ndarray:
    """Average channels → (T,) (the reference uses channel 0 of torchaudio.load;
    kaldi.fbank averages — we take channel 0 for parity with fbank's behavior
    of operating on waveform[0])."""
    return x[:, 0] if x.ndim == 2 else x


def resample(x: np.ndarray, orig_rate: int, new_rate: int) -> np.ndarray:
    """Polyphase sinc resampling (host-side, scipy).

    Functional parity with torchaudio.transforms.Resample
    (cli/reverb.py:126-128); exact filter taps differ but the passband is
    equivalent (WER-neutral; validated by round-trip tests).
    """
    if orig_rate == new_rate:
        return x
    g = np.gcd(int(orig_rate), int(new_rate))
    up, down = new_rate // g, orig_rate // g
    return _signal.resample_poly(x, up, down, axis=0).astype(np.float32)


def load_for_asr(path: str, resample_rate: int = 16000) -> np.ndarray:
    """Load + mono + resample → int16-scale float32 (T,) ready for fbank."""
    x, sr = load_audio(path)
    x = to_mono(x)
    if sr != resample_rate:
        x = resample(x, sr, resample_rate)
    return (x * (1 << 15)).astype(np.float32)
