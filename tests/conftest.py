"""Test configuration: force an 8-virtual-device CPU platform BEFORE any test
imports run, so multi-chip sharding semantics are testable without TPUs
(SURVEY.md §4 implication (b)).

The container's sitecustomize pre-registers a TPU backend and forces
jax_platforms at interpreter startup; plain env vars are too late, so we
override through jax.config (conftest runs before test modules import jax
for real)."""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
