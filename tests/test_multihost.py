"""Multi-host (multi-process) training glue: 2 jax.distributed processes ×
4 CPU devices must produce the same losses as 1 process × 8 devices
(VERDICT r1 item 3; reference counterpart: torch DDP init_distributed +
DistributedSampler, utils/train_utils.py:199-212, 301-349).

The per-process batch→global-array glue under test is
parallel/mesh.py put_batch (jax.make_array_from_process_local_data), driven
exactly as Executor drives it.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute tier: pytest -m 'not slow' skips


def global_batch(cfg, B=8, T=67, L=5, seed=0):
    """Deterministic global batch shared by every process."""
    rng = np.random.RandomState(100 + seed)
    return {
        'feats': rng.randn(B, T, 80).astype(np.float32),
        'feats_lengths': np.full((B,), T, np.int32),
        'target': rng.randint(1, cfg.vocab_size - 2, (B, L)).astype(np.int32),
        'target_lengths': np.full((B,), L, np.int32),
        'cat_embs': np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1)),
    }


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_matches_single_process(tmp_path):
    import jax
    import jax.numpy as jnp
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_tiny
    from reverb_tpu.parallel.mesh import (make_mesh, param_shardings,
                                          put_batch)
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step)

    # ---- single-process baseline: 8 local devices, full global batch ----
    conf = reverb_tiny()
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    mesh = make_mesh()
    params = jax.device_put(params, param_shardings(params, mesh))
    step_fn = jax.jit(make_train_step(cfg, tx))
    want = []
    with jax.set_mesh(mesh):
        for i in range(3):
            db = put_batch(global_batch(cfg, seed=i), mesh)
            params, opt_state, m = step_fn(params, opt_state, db,
                                           jnp.asarray(i),
                                           jax.random.PRNGKey(i))
            want.append(float(m['loss']))

    # ---- 2 × 4-device jax.distributed processes, per-process slices ----
    port = _free_port()
    coord = f'127.0.0.1:{port}'
    out = tmp_path / 'mh.json'
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, 'tests', 'multihost_worker.py')
    env = dict(os.environ, PYTHONPATH=root)
    env.pop('XLA_FLAGS', None)       # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, '2', str(pid), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    logs = [p.communicate(timeout=800)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    got = json.loads(out.read_text())['losses']

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
