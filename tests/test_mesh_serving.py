"""Data-parallel serving over a device mesh: ReverbASR(data_parallel=N)
shards the long-form chunk batch along a ('data',) mesh and GSPMD partitions
every decode program.  CTM output must be byte-identical to single-device
serving — including when the chunk count does not divide the mesh (padded
zero-length rows are dropped).

The reference serves on one device (asr/wenet/cli/reverb.py); this capability
is TPU-native (jax.sharding over ICI).
"""

import jax
import pytest

from tests.helpers import build_tiny_model_dir, write_wav


@pytest.fixture(scope='module')
def model_dir(tmp_path_factory):
    return build_tiny_model_dir(tmp_path_factory.mktemp('meshmodel'))


@pytest.fixture(scope='module')
def wav(tmp_path_factory):
    # 3 s @ chunk_size 67 → 299 fbank frames → 5 chunks: exercises both the
    # divisible (dp padding 5→8 rows) and multi-batch paths below.
    return write_wav(tmp_path_factory.mktemp('audio') / 'mesh.wav',
                     seconds=3.0)


@pytest.fixture()
def _restore_pallas():
    from reverb_tpu.ops import flash_attention as fa
    prev = fa._OVERRIDE
    yield
    fa._OVERRIDE = prev


MODES = ['ctc_prefix_beam_search', 'attention_rescoring', 'ctc_greedy_search']
CHUNK = 67


def _transcribe(model_dir, wav, batch_size=None, **kwargs):
    from reverb_tpu.cli.reverb import ReverbASR
    model = ReverbASR(str(model_dir / 'config.yaml'),
                      str(model_dir / 'model.npz'), **kwargs)
    return model.transcribe_modes(str(wav), MODES, format='ctm',
                                  chunk_size=CHUNK,
                                  batch_size=batch_size), model


def test_mesh_serving_ctm_identity(model_dir, wav, _restore_pallas):
    assert len(jax.devices()) >= 4, 'conftest forces 8 CPU devices'
    ref, _ = _transcribe(model_dir, wav)
    out, model = _transcribe(model_dir, wav, data_parallel=4)
    assert model.mesh is not None and model.mesh.devices.size == 4
    # params replicated on the mesh
    leaf = jax.tree_util.tree_leaves(model.params)[0]
    assert len(leaf.sharding.device_set) == 4
    for mode, a, b in zip(MODES, ref, out):
        assert a == b, f'{mode} CTM differs under mesh serving'


def test_mesh_serving_uneven_batch(model_dir, wav, _restore_pallas):
    # explicit batch_size 3 with dp=4: every batch is padded 3→4 rows, and
    # the final batch of the 5-chunk file is padded 2→4
    ref, _ = _transcribe(model_dir, wav, batch_size=3)
    out, _ = _transcribe(model_dir, wav, batch_size=3, data_parallel=4)
    for a, b in zip(ref, out):
        assert a == b


def test_mesh_serving_rejects_oversized_mesh(model_dir):
    from reverb_tpu.cli.reverb import ReverbASR
    with pytest.raises(ValueError, match='data_parallel'):
        ReverbASR(str(model_dir / 'config.yaml'),
                  str(model_dir / 'model.npz'),
                  data_parallel=1 + len(jax.devices()))
