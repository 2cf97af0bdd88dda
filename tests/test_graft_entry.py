"""Regression tests for the driver entry points in __graft_entry__.py.

The driver runs ``dryrun_multichip(n_devices=8)`` on a host with a single
TPU chip; round 1 failed because the function assumed >=8 devices already
existed (VERDICT.md weak#1). These tests pin both the in-process path and
the self-provisioning subprocess path.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, example_args = entry()
    out = jax.jit(fn)(*example_args)
    assert jax.numpy.isfinite(out)


def test_dryrun_multichip_in_process():
    # conftest provisions 8 virtual CPU devices, so this exercises the
    # direct path (no subprocess).
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_from_one_device():
    # Reproduce the driver environment: an outer process that sees a
    # single device must re-exec on a virtual 8-CPU mesh and succeed.
    env = dict(os.environ)
    flags = ' '.join(
        f for f in env.get('XLA_FLAGS', '').split()
        if 'xla_force_host_platform_device_count' not in f)
    env['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=1').strip()
    env['JAX_PLATFORMS'] = 'cpu'
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        'assert len(jax.devices()) == 1, jax.devices()\n'
        'from __graft_entry__ import dryrun_multichip\n'
        'dryrun_multichip(8)\n')
    proc = subprocess.run([sys.executable, '-c', code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'dryrun_multichip(8) OK' in proc.stdout


def test_dryrun_multichip_subprocess_propagates_failure():
    # A failing inner run must surface as an exception, not silent rc=0.
    from __graft_entry__ import _dryrun_subprocess
    import __graft_entry__ as ge
    orig = ge._dryrun_impl.__name__
    assert orig == '_dryrun_impl'
    with pytest.raises(RuntimeError, match='subprocess failed'):
        # n_devices=0 makes create_mesh/assert fail inside the child
        _dryrun_subprocess(0)
