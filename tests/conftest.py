"""
Test configuration: force the CPU backend with 8 virtual devices so
sharding/multi-chip code paths are exercised without TPU hardware (and so
tests don't round-trip every op through the TPU tunnel), and enable x64 so
float64 oracle comparisons are meaningful.

Must run before jax is imported anywhere. Note the session environment may
pre-set JAX_PLATFORMS (e.g. to the axon TPU plugin), so override, don't
setdefault.
"""

import os

# several tests spawn worker subprocesses from temp directories; when
# running from a plain source checkout (package not pip-installed) they
# need the repo root on PYTHONPATH to import evcouplings_tpu
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_existing = os.environ.get("PYTHONPATH")
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + ((os.pathsep + _existing) if _existing else "")
)

# escape hatch for the opt-in on-device runs (e.g. the full-length
# family fit, test_real_alignment.py): EVCTPU_TEST_ON_DEVICE=1 keeps
# the session backend (the real TPU via the axon plugin) instead of
# forcing the 8-virtual-device CPU. x64 stays off there — TPUs have
# no f64 units, and the on-device tests do not use the f64 oracles.
_ON_DEVICE = bool(os.environ.get("EVCTPU_TEST_ON_DEVICE"))

if not _ON_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    assert jax.default_backend() == "cpu"


def _ensure_native_extensions():
    """Build the C parser extensions in-place if absent so the native
    IO tests run instead of skipping (no-op when a toolchain or the
    sources are unavailable — tests then skip as before)."""
    import glob
    import subprocess
    import sys

    # check for the compiled artifacts WITHOUT importing the package:
    # importing evcouplings_tpu.native caches HAVE_NATIVE=False before
    # a rebuild could land, so a find_spec probe would defeat itself
    native_dir = os.path.join(_REPO_ROOT, "evcouplings_tpu", "native")
    if (glob.glob(os.path.join(native_dir, "_fasta*.so"))
            and glob.glob(os.path.join(native_dir, "_stockholm*.so"))):
        return
    try:
        proc = subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_REPO_ROOT, capture_output=True, timeout=300,
        )
        if proc.returncode != 0:
            # make a silently-degraded CI run visible: without this,
            # a broken toolchain reverts the native IO tests to
            # skipping with no trace in the log
            tail = proc.stderr.decode(errors="replace").strip()
            print(
                "WARNING: native extension build failed (rc={}); "
                "native IO tests will skip. stderr tail: {}".format(
                    proc.returncode, tail[-300:]),
                file=sys.stderr,
            )
    except Exception as exc:
        print(
            "WARNING: native extension build did not run ({}); "
            "native IO tests will skip.".format(exc),
            file=sys.stderr,
        )


_ensure_native_extensions()
