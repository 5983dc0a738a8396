# bisect the Mosaic SIGABRT: compile the forward kernel alone, then backtrace
import numpy as np, jax, jax.numpy as jnp
from reverb_tpu.ops.beam_scan import beam_scan_forward, beam_backtrace
B, T, K2, K, L = 2, 16, 3, 3, 8
logp = jnp.zeros((B, T, K2), jnp.float32)
idx = jnp.zeros((B, T, K2), jnp.int32)
ts = jnp.zeros((B, T), jnp.int32)
on = jnp.ones((B, T), bool)
acc = jnp.zeros((B, T), jnp.float32)
import sys
which = sys.argv[1]
if which == 'fwd':
    f, e = beam_scan_forward(logp, idx, ts, on, acc, jnp.zeros((B, T), bool), K, 0, False)
    jax.block_until_ready(f['plen']); print('fwd OK')
else:
    f, e = beam_scan_forward(logp, idx, ts, on, acc, jnp.zeros((B, T), bool), K, 0, True)
    order = jnp.zeros((B, K), jnp.int32)
    p, t = beam_backtrace(jax.tree.map(jnp.asarray, e), order, jnp.zeros((B, K), bool), L, False)
    jax.block_until_ready(p); print('bt OK')
