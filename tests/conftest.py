"""Test environment: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY §4: multi-host collectives tested via
xla_force_host_platform_device_count).

Note: the axon TPU PJRT plugin ignores the JAX_PLATFORMS env var, so we must
also set the config flag after importing jax.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# deterministic, torch-comparable matmuls in parity tests
jax.config.update('jax_default_matmul_precision', 'highest')
