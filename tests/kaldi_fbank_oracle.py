"""Test-only transliteration of torchaudio.compliance.kaldi.fbank in torch.

torchaudio is not installable in this environment, so this module re-states
its fbank pipeline (which itself transliterates kaldi
feature-window.{h,cc} / feature-fbank.cc / mel-computations.cc) step by step
in torch ops, to serve as an INDEPENDENT oracle for
reverb_tpu/frontend/fbank.py (which was written against the kaldi C++ spec).
Reference consumers of the exact torchaudio semantics:
asr/wenet/cli/reverb.py:130-138, asr/wenet/dataset/processor.py:343-371.

Scope: the parameter subset the reference uses — window_type='povey',
snip_edges=True, raw_energy/use_energy defaults (energy unused),
round_to_power_of_two=True, vtln_warp=1.0, subtract_mean=False,
use_log_fbank=True, htk_compat=False, channel=-1 on mono input.
"""

import math

import torch

EPSILON = torch.finfo(torch.float).eps
MS_TO_SEC = 0.001


def _next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2 ** (x - 1).bit_length()


def _get_strided(waveform: torch.Tensor, window_size: int,
                 window_shift: int) -> torch.Tensor:
    """snip_edges=True framing: m = 1 + (n - size) // shift full windows,
    no padding (kaldi feature-window.h NumFrames)."""
    num_samples = waveform.size(0)
    if num_samples < window_size:
        return torch.empty((0, window_size), dtype=waveform.dtype)
    m = 1 + (num_samples - window_size) // window_shift
    return waveform.as_strided((m, window_size), (window_shift, 1))


def _povey_window(window_size: int) -> torch.Tensor:
    # hann_window(periodic=False)^0.85 == (0.5 - 0.5 cos(2πi/(N-1)))^0.85
    return torch.hann_window(window_size, periodic=False,
                             dtype=torch.get_default_dtype()).pow(0.85)


def _get_window(waveform: torch.Tensor, padded_window_size: int,
                window_size: int, window_shift: int, dither: float,
                remove_dc_offset: bool, preemphasis_coefficient: float
                ) -> torch.Tensor:
    strided = _get_strided(waveform, window_size, window_shift)
    if dither != 0.0:
        strided = strided + dither * torch.randn(strided.shape)
    if remove_dc_offset:
        strided = strided - torch.mean(strided, dim=1).unsqueeze(1)
    if preemphasis_coefficient != 0.0:
        # replicate-pad one sample on the left: frame[0] -= c * frame[0]
        offset_strided = torch.nn.functional.pad(
            strided.unsqueeze(0), (1, 0), mode='replicate').squeeze(0)
        strided = strided - preemphasis_coefficient * offset_strided[:, :-1]
    strided = strided * _povey_window(window_size).unsqueeze(0)
    if padded_window_size != window_size:
        strided = torch.nn.functional.pad(
            strided.unsqueeze(0), (0, padded_window_size - window_size),
            mode='constant', value=0).squeeze(0)
    return strided


def _mel_scale(freq):
    return 1127.0 * (1.0 + freq / 700.0).log() if torch.is_tensor(freq) \
        else 1127.0 * math.log(1.0 + freq / 700.0)


def get_mel_banks(num_bins: int, window_length_padded: int,
                  sample_freq: float, low_freq: float, high_freq: float
                  ) -> torch.Tensor:
    """(num_bins, window_length_padded//2) triangular weights; fft bins run
    0..nyquist-exclusive (the Nyquist column is appended as zeros by the
    caller) — kaldi mel-computations.cc MelBanks with vtln_warp=1."""
    assert num_bins > 3
    assert window_length_padded % 2 == 0
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    assert 0.0 <= low_freq < nyquist and low_freq < high_freq <= nyquist

    fft_bin_width = sample_freq / window_length_padded
    mel_low_freq = _mel_scale(low_freq)
    mel_high_freq = _mel_scale(high_freq)
    mel_freq_delta = (mel_high_freq - mel_low_freq) / (num_bins + 1)

    bin = torch.arange(num_bins, dtype=torch.float64).unsqueeze(1)
    left_mel = mel_low_freq + bin * mel_freq_delta          # (num_bins, 1)
    center_mel = mel_low_freq + (bin + 1.0) * mel_freq_delta
    right_mel = mel_low_freq + (bin + 2.0) * mel_freq_delta

    mel = _mel_scale(fft_bin_width * torch.arange(
        num_fft_bins, dtype=torch.float64)).unsqueeze(0)    # (1, F)

    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    bins = torch.max(torch.zeros(1, dtype=torch.float64),
                     torch.min(up_slope, down_slope))
    return bins.to(torch.get_default_dtype())


def fbank(waveform: torch.Tensor, num_mel_bins: int = 23,
          frame_length: float = 25.0, frame_shift: float = 10.0,
          dither: float = 0.0, energy_floor: float = 1.0,
          sample_frequency: float = 16000.0, low_freq: float = 20.0,
          high_freq: float = 0.0, preemphasis_coefficient: float = 0.97,
          remove_dc_offset: bool = True, use_power: bool = True,
          use_log_fbank: bool = True) -> torch.Tensor:
    """waveform (1, n) or (n,) int16-scale float → (m, num_mel_bins)."""
    del energy_floor   # only affects use_energy=True, which reverb never sets
    if waveform.dim() == 2:
        waveform = waveform[0]
    window_shift = int(sample_frequency * frame_shift * MS_TO_SEC)
    window_size = int(sample_frequency * frame_length * MS_TO_SEC)
    padded_window_size = _next_power_of_2(window_size)

    strided = _get_window(waveform, padded_window_size, window_size,
                          window_shift, dither, remove_dc_offset,
                          preemphasis_coefficient)

    spectrum = torch.fft.rfft(strided).abs()
    if use_power:
        spectrum = spectrum.pow(2.0)

    mel_energies = get_mel_banks(num_mel_bins, padded_window_size,
                                 sample_frequency, low_freq, high_freq)
    # pad the (excluded) Nyquist column with zeros → (num_bins, F+1)
    mel_energies = torch.nn.functional.pad(mel_energies, (0, 1),
                                           mode='constant', value=0)
    mel_energies = torch.mm(spectrum, mel_energies.T)
    if use_log_fbank:
        mel_energies = torch.max(
            mel_energies, torch.tensor(EPSILON, dtype=mel_energies.dtype)
        ).log()
    return mel_energies
