"""ctypes bindings for the native host audio runtime (native/reverb_native.cpp).

Auto-builds the shared library with g++ on first use; every entry point has
a pure-python fallback (frontend/audio.py, frontend/fbank.py) so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / 'native' / 'reverb_native.cpp'
_LIB = _REPO_ROOT / 'native' / 'libreverb_native.so'
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', str(_SRC),
             '-o', str(_LIB)], check=True, capture_output=True)
        return True
    except Exception as e:                       # noqa: BLE001
        logging.warning('reverb_native build failed (%r); using python '
                        'fallbacks', e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        lib = ctypes.CDLL(str(_LIB))
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.rn_decode_wav.argtypes = [ctypes.c_char_p, ctypes.c_int64, f32p,
                                      i64p, i32p, i32p]
        lib.rn_decode_wav.restype = ctypes.c_int
        lib.rn_resample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                    ctypes.c_int32, f32p, i64p]
        lib.rn_resample.restype = ctypes.c_int
        lib.rn_fbank.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int32, ctypes.c_float,
                                 ctypes.c_float, f32p, i64p]
        lib.rn_fbank.restype = ctypes.c_int
        _lib = lib
        return _lib


def _fp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_wav(data: bytes):
    """WAV bytes → (float32 (T, C) in [-1,1), sample_rate); None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.rn_decode_wav(data, len(data), None, ctypes.byref(n),
                           ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f'rn_decode_wav failed rc={rc}')
    out = np.empty((n.value, ch.value), np.float32)
    rc = lib.rn_decode_wav(data, len(data), _fp(out), ctypes.byref(n),
                           ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f'rn_decode_wav failed rc={rc}')
    return out, int(sr.value)


def resample(x: np.ndarray, sr_in: int, sr_out: int):
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n_out = ctypes.c_int64()
    lib.rn_resample(_fp(x), len(x), sr_in, sr_out, None,
                    ctypes.byref(n_out))
    out = np.empty((n_out.value,), np.float32)
    rc = lib.rn_resample(_fp(x), len(x), sr_in, sr_out, _fp(out),
                         ctypes.byref(n_out))
    if rc != 0:
        raise ValueError(f'rn_resample failed rc={rc}')
    return out


def fbank(wave: np.ndarray, sample_rate: int = 16000, num_bins: int = 80,
          frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0):
    """int16-scale float32 waveform → (T, num_bins) log-mel; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    wave = np.ascontiguousarray(wave, np.float32)
    nf = ctypes.c_int64()
    lib.rn_fbank(_fp(wave), len(wave), sample_rate, num_bins,
                 frame_length_ms, frame_shift_ms, None, ctypes.byref(nf))
    out = np.empty((nf.value, num_bins), np.float32)
    rc = lib.rn_fbank(_fp(wave), len(wave), sample_rate, num_bins,
                      frame_length_ms, frame_shift_ms, _fp(out),
                      ctypes.byref(nf))
    if rc != 0:
        raise ValueError(f'rn_fbank failed rc={rc}')
    return out
