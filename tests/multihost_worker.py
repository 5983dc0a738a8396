"""Worker process for tests/test_multihost.py: one of N jax.distributed
processes over a shared CPU device mesh.

Usage: python tests/multihost_worker.py <coordinator> <nproc> <pid> <out.json>

Each process contributes its per-process slice of the same deterministic
global batch through `Executor`'s put_batch glue
(jax.make_array_from_process_local_data) and runs identical train steps;
the parent asserts the resulting losses equal the single-process run.
"""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4'
                           ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)


def main(coordinator: str, nproc: int, pid: int, out_path: str):
    jax.distributed.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_tiny
    from reverb_tpu.parallel.mesh import (make_mesh, param_shardings,
                                          put_batch)
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step)
    from tests.test_multihost import global_batch

    conf = reverb_tiny()
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)

    mesh = make_mesh()                      # data axis = all 4*nproc devices
    params = jax.device_put(params, param_shardings(params, mesh))
    step_fn = jax.jit(make_train_step(cfg, tx))

    losses = []
    with jax.set_mesh(mesh):
        for i in range(3):
            batch = global_batch(cfg, seed=i)
            B = batch['feats'].shape[0]
            lo, hi = pid * B // nproc, (pid + 1) * B // nproc
            local = {k: np.asarray(v[lo:hi]) for k, v in batch.items()}
            db = put_batch(local, mesh)
            params, opt_state, m = step_fn(params, opt_state, db,
                                           jnp.asarray(i),
                                           jax.random.PRNGKey(i))
            losses.append(float(m['loss']))

    if pid == 0:
        with open(out_path, 'w') as f:
            json.dump({'losses': losses}, f)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
