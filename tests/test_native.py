"""Native C++ audio runtime vs python reference implementations."""

import numpy as np
import pytest

from reverb_tpu import native
from reverb_tpu.frontend.fbank import FbankConfig, fbank_numpy
from tests.helpers import write_wav


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip('native lib unavailable (no toolchain)')
    return lib


def test_native_decode_wav(lib, tmp_path):
    path = write_wav(tmp_path / 'x.wav', seconds=0.3, freq=500)
    data = open(path, 'rb').read()
    out, sr = native.decode_wav(data)
    assert sr == 16000
    assert out.shape == (4800, 1)
    from reverb_tpu.frontend.audio import _parse_wav
    ref, sr2 = _parse_wav(data)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_resample(lib):
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample(x, 16000, 8000)
    assert abs(len(y) - 8000) <= 2
    # a 440 Hz tone must survive a 2x downsample nearly unchanged
    t2 = np.arange(len(y)) / 8000
    ref = np.sin(2 * np.pi * 440 * t2)
    # ignore filter edges
    err = np.abs(y[200:-200] - ref[200:-200]).max()
    assert err < 0.05, err


def test_native_fbank_matches_python(lib):
    rng = np.random.RandomState(0)
    wave = (rng.randn(8000) * 1000).astype(np.float32)
    ours = native.fbank(wave)
    ref = fbank_numpy(wave, FbankConfig())
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)
