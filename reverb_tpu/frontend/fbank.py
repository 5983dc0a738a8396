"""Kaldi-compatible log-mel filterbank features, TPU-native.

Implements the exact feature definition the reference model was trained on —
torchaudio.compliance.kaldi.fbank with (num_mel_bins=80, frame_length=25 ms,
frame_shift=10 ms, dither=0, energy_floor=0, sample_frequency=16000) on
int16-scaled waveforms (reference: asr/wenet/cli/reverb.py:113-140,
asr/wenet/dataset/processor.py:343-371) — as a single fused, jittable JAX
function. The whole frontend (framing → DC removal → preemphasis → povey
window → rFFT(512) → power → mel → log) lowers to one XLA program: framing is
a gather, the FFT is XLA's native rfft, and the mel projection is a (F,257)x
(257,80) matmul that rides the MXU.

Kaldi algorithm reference (public spec): kaldi/src/feat/feature-window.{h,cc},
feature-fbank.cc, mel-computations.cc. Written from the spec, not ported.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    dither: float = 0.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0: offset from Nyquist
    use_power: bool = True
    snip_edges: bool = True
    # torchaudio's EPSILON = smallest float32 eps (get_epsilon); log floor.
    epsilon: float = float(np.finfo(np.float32).eps)
    # Spectrum backend: None = auto (DFT-as-matmul on TPU, rfft elsewhere).
    # XLA's TPU FFT is slow for small batched transforms; a 512-point rDFT
    # as two f32 matmuls rides the MXU ~5x faster.  True/False to force.
    use_dft_matmul: bool | None = None

    @property
    def window_size(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def window_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def padded_window_size(self) -> int:
        n = 1
        while n < self.window_size:
            n *= 2
        return n


def num_frames(num_samples: int, cfg: FbankConfig = FbankConfig()) -> int:
    """Frame count for snip_edges=True (kaldi feature-window.h NumFrames)."""
    if num_samples < cfg.window_size:
        return 0
    return 1 + (num_samples - cfg.window_size) // cfg.window_shift


def _povey_window(n: int) -> np.ndarray:
    # (0.5 - 0.5 cos(2 pi i / (N-1)))^0.85  — kaldi feature-window.cc
    i = np.arange(n, dtype=np.float64)
    return ((0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))) ** 0.85).astype(
        np.float32)


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=8)
def mel_banks(cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    """(num_bins, padded_window_size//2) triangular mel weights, kaldi-style.

    The Nyquist fft bin is excluded (weight handled by zero-padding the last
    column at application time), matching torchaudio.compliance.kaldi.fbank.
    """
    num_fft_bins = cfg.padded_window_size // 2
    nyquist = 0.5 * cfg.sample_rate
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_low = _mel_scale(cfg.low_freq)
    mel_high = _mel_scale(high_freq)
    delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    fft_freqs = (np.arange(num_fft_bins, dtype=np.float64)
                 * cfg.sample_rate / cfg.padded_window_size)
    mel = _mel_scale(fft_freqs)[None, :]  # (1, F)

    b = np.arange(cfg.num_mel_bins, dtype=np.float64)[:, None]
    left = mel_low + b * delta
    center = mel_low + (b + 1) * delta
    right = mel_low + (b + 2) * delta
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _rdft_matrices(n: int):
    """(n, n//2) cos/sin bases of the real DFT (Nyquist bin excluded, as in
    mel_banks).  Used where jnp.fft.rfft is slower than two MXU matmuls."""
    k = np.arange(n // 2, dtype=np.float64)
    t = np.arange(n, dtype=np.float64)[:, None]
    ang = -2.0 * np.pi * t * k[None, :] / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _power_spectrum(frames: jax.Array, cfg: FbankConfig) -> jax.Array:
    """(…, padded_window_size) windowed frames → (…, pw//2) power spectrum."""
    use_dft = cfg.use_dft_matmul
    if use_dft is None:
        use_dft = jax.default_backend() == 'tpu'
    n = cfg.padded_window_size
    if use_dft:
        cr, ci = _rdft_matrices(n)
        re = jnp.matmul(frames, jnp.asarray(cr), precision='highest')
        im = jnp.matmul(frames, jnp.asarray(ci), precision='highest')
        return re * re + im * im
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return power[..., : n // 2]  # drop Nyquist bin


def _frame_signal(wave: jax.Array, n_frames: int, cfg: FbankConfig) -> jax.Array:
    """Overlapping frames via shift-aligned reshape + row slices.

    A (T,W) gather runs at ~60 GB/s on TPU (scalarized row fetches); slicing
    a (nb, shift) reshape into k overlapping row-ranges and concatenating is
    plain HBM-bandwidth copies (~10x faster).  Frame t = blocks t..t+k of the
    shift-strided wave, exactly the samples [t·shift, t·shift+W).
    """
    shift, size = cfg.window_shift, cfg.window_size
    k_full, rem = divmod(size, shift)
    nb = n_frames - 1 + k_full + (1 if rem else 0)
    w = wave
    if nb * shift > w.shape[0]:
        w = jnp.pad(w, (0, nb * shift - w.shape[0]))
    b = w[: nb * shift].reshape(nb, shift)
    parts = [b[i: i + n_frames] for i in range(k_full)]
    if rem:
        parts.append(b[k_full: k_full + n_frames, :rem])
    return jnp.concatenate(parts, axis=1)


def compute_fbank(wave: jax.Array,
                  cfg: FbankConfig = FbankConfig(),
                  n_frames: int | None = None) -> jax.Array:
    """Log-mel fbank of a 1-D waveform (int16-scale float32).

    Args:
      wave: (num_samples,) float32, already scaled to int16 range (the caller
        multiplies normalized audio by 1<<15 — processor.py:361).
      n_frames: static frame count; defaults to num_frames(len(wave)).
    Returns:
      (n_frames, num_mel_bins) float32.
    """
    if n_frames is None:
        n_frames = num_frames(wave.shape[0], cfg)
    wave = wave.astype(jnp.float32)
    frames = _frame_signal(wave, n_frames, cfg)  # (T, W)

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if cfg.preemphasis != 0.0:
        first = frames[:, :1] - cfg.preemphasis * frames[:, :1]
        rest = frames[:, 1:] - cfg.preemphasis * frames[:, :-1]
        frames = jnp.concatenate([first, rest], axis=1)

    window = jnp.asarray(_povey_window(cfg.window_size))
    frames = frames * window[None, :]

    pad = cfg.padded_window_size - cfg.window_size
    if pad > 0:
        frames = jnp.pad(frames, ((0, 0), (0, pad)))

    power = _power_spectrum(frames, cfg)
    if not cfg.use_power:
        power = jnp.sqrt(power)

    banks = jnp.asarray(mel_banks(cfg))  # (M, F)
    mel = power @ banks.T
    return jnp.log(jnp.maximum(mel, cfg.epsilon))


def compute_fbank_batch(waves: jax.Array, cfg: FbankConfig = FbankConfig()
                        ) -> jax.Array:
    """(B, num_samples) → (B, T, M); frame count from the padded length."""
    return jax.vmap(lambda w: compute_fbank(w, cfg))(waves)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _compute_fbank_jit(wave, cfg: FbankConfig, n_frames: int):
    return compute_fbank(wave, cfg, n_frames)


def compute_fbank_compiled(wave, cfg: FbankConfig = FbankConfig(),
                           n_frames: int | None = None,
                           pad_to: int = 16000) -> jax.Array:
    """Jit-compiled fbank with a bounded compile count.

    `compute_fbank` called bare runs every op EAGERLY — one device dispatch
    per op, which over a remote-TPU link costs seconds per call.  This
    wrapper (a) jits the whole kernel into one program and (b) pads the
    wave to a multiple of `pad_to` samples so arbitrary audio lengths hit a
    small set of compiled shapes; the true frame count is sliced off the
    padded result (frames [0, n) read only samples [0, len(wave)), so
    padding zeros never affect them).
    """
    wave = np.asarray(wave, np.float32)
    n = num_frames(len(wave), cfg) if n_frames is None else n_frames
    L = max(int(-(-max(len(wave), 1) // pad_to)) * pad_to, pad_to)
    if L != len(wave):
        wpad = np.zeros((L,), np.float32)
        wpad[:len(wave)] = wave
    else:
        wpad = wave
    out = _compute_fbank_jit(jnp.asarray(wpad), cfg, num_frames(L, cfg))
    return out[:n]


@functools.lru_cache(maxsize=8)
def dct_matrix(num_ceps: int, num_mel_bins: int) -> np.ndarray:
    """(num_mel_bins, num_ceps) kaldi DCT-II basis: ortho-normalized rows,
    C0 row = sqrt(1/N) (kaldi feat/mel-computations ComputeDctMatrix /
    torchaudio _get_dct_matrix semantics)."""
    n = np.arange(num_mel_bins, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / num_mel_bins * (n[None, :] + 0.5) * k)  # (C, M)
    dct *= np.sqrt(2.0 / num_mel_bins)
    dct[0, :] = np.sqrt(1.0 / num_mel_bins)
    return dct.T.astype(np.float32)                              # (M, C)


@functools.lru_cache(maxsize=8)
def lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    """Cepstral liftering 1 + (Q/2)·sin(πi/Q) (kaldi ComputeLifterCoeffs)."""
    i = np.arange(num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(np.pi * i / q)).astype(np.float32)


def compute_mfcc(wave: jax.Array, cfg: FbankConfig = FbankConfig(),
                 num_ceps: int = 13, cepstral_lifter: float = 22.0,
                 n_frames: int | None = None) -> jax.Array:
    """Kaldi-compatible MFCC (torchaudio.compliance.kaldi.mfcc semantics,
    use_energy=False): log-mel fbank → DCT-II → cepstral liftering.

    Reference consumer: asr/wenet/dataset/processor.py:385-416
    (`compute_mfcc`, feats_type 'mfcc').  Jittable; the DCT is one
    (T,M)x(M,C) matmul.
    """
    assert num_ceps <= cfg.num_mel_bins, (num_ceps, cfg.num_mel_bins)
    logmel = compute_fbank(wave, cfg, n_frames)                  # (T, M)
    feat = logmel @ jnp.asarray(dct_matrix(num_ceps, cfg.num_mel_bins))
    if cepstral_lifter != 0.0:
        feat = feat * jnp.asarray(lifter_coeffs(num_ceps, cepstral_lifter))
    return feat


def mfcc_numpy(wave: np.ndarray, cfg: FbankConfig = FbankConfig(),
               num_ceps: int = 13, cepstral_lifter: float = 22.0
               ) -> np.ndarray:
    """Host-side MFCC mirroring compute_mfcc (data-pipeline path)."""
    assert num_ceps <= cfg.num_mel_bins, (num_ceps, cfg.num_mel_bins)
    feat = fbank_numpy(wave, cfg) @ dct_matrix(num_ceps, cfg.num_mel_bins)
    if cepstral_lifter != 0.0:
        feat = feat * lifter_coeffs(num_ceps, cepstral_lifter)[None, :]
    return feat.astype(np.float32)


def fbank_numpy(wave: np.ndarray, cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    """Pure-NumPy reference path (host-side; used for tests and small files)."""
    T = num_frames(len(wave), cfg)
    if T == 0:
        return np.zeros((0, cfg.num_mel_bins), dtype=np.float32)
    wave = wave.astype(np.float32)
    shift, size = cfg.window_shift, cfg.window_size
    idx = np.arange(T)[:, None] * shift + np.arange(size)[None, :]
    frames = wave[idx]
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis:
        out = frames.copy()
        out[:, 0] -= cfg.preemphasis * frames[:, 0]
        out[:, 1:] -= cfg.preemphasis * frames[:, :-1]
        frames = out
    frames = frames * _povey_window(size)[None, :]
    padded = np.zeros((T, cfg.padded_window_size), dtype=np.float32)
    padded[:, :size] = frames
    spec = np.fft.rfft(padded, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2)[:, : cfg.padded_window_size // 2]
    if not cfg.use_power:
        power = np.sqrt(power)
    mel = power @ mel_banks(cfg).T
    return np.log(np.maximum(mel, cfg.epsilon)).astype(np.float32)
