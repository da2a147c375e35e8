"""
Driver entry-point guards (__graft_entry__.py).

The driver validates the multi-chip sharding path by running
``dryrun_multichip(N)`` in a fresh process with ``JAX_PLATFORMS=cpu``
and ``--xla_force_host_platform_device_count=N``. The axon TPU plugin,
when installed, overrides the JAX_PLATFORMS *env var* at import time —
so the entry script must force the CPU platform itself or the dryrun
comes up with one real chip and fails its mesh reshape. These tests pin
that guard.
"""

import os
import subprocess
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _hostile_env():
    """Environment with NO cpu-platform hints — the axon plugin (if
    present) gets to claim the default platform, as it does when the
    driver's env request is overridden."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO_ROOT + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    return env


def test_ensure_devices_forces_cpu_in_hostile_env():
    code = (
        "import __graft_entry__ as g\n"
        "jax = g._ensure_devices(8)\n"
        "assert len(jax.devices()) >= 8, jax.devices()\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('GUARD-OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=_REPO_ROOT,
        env=_hostile_env(), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "GUARD-OK" in proc.stdout


def test_ensure_devices_noop_when_backend_already_up():
    # in the pytest process the CPU backend with 8 virtual devices is
    # already initialized (conftest.py); the guard must fall through
    # its RuntimeError branch and succeed on the device-count check
    import __graft_entry__ as g

    jax = g._ensure_devices(8)
    assert len(jax.devices()) >= 8


def test_entry_is_jittable():
    import jax

    import __graft_entry__ as g

    fn, example_args = g.entry()
    value = jax.jit(fn)(*example_args)
    assert np.isfinite(float(value))
