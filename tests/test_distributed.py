"""
True multi-process data parallelism: two OS processes (one CPU device
each) form a jax.distributed cluster with Gloo collectives — the CPU
stand-in for a multi-host TPU pod slice — and run the sharded PLM fit.
The fitted couplings must match a single-process fit bit-for-bit
(same reduction structure, replicated parameters).

The reference has no multi-node execution at all (SURVEY.md §2.8:
multi-node = independent scheduler jobs); this is new surface.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
out_file = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port,
    num_processes=2,
    process_id=proc_id,
)
assert jax.device_count() == 2

import numpy as np
from jax.sharding import Mesh

from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

rng = np.random.default_rng(0)
codes = rng.integers(0, 5, size=(64, 6)).astype(np.int8)
weights = np.ones(64)

mesh = Mesh(np.array(jax.devices()), ("data",))
cfg = PlmConfig(max_iter=15, block_size=32, solver="adam")
res = fit_plm(codes, weights, 5, cfg, mesh=mesh)

# the asymmetric fit with sites sharded ACROSS the two processes:
# each host owns half the coupling rows (cross-host model parallelism)
from evcouplings_tpu.ops.plm_sites import fit_plm_asym

mesh2 = Mesh(np.array(jax.devices()).reshape(1, 2), ("data", "model"))
cfg2 = PlmConfig(max_iter=12, block_size=32, solver="lbfgs",
                 conv_tol=0.0)
res2 = fit_plm_asym(codes, weights, 5, cfg2, mesh=mesh2)

# column-sharded covariance inversion across the two processes
# (the mean-field hot step): each host solves its identity-column
# block against a replicated factorization
from evcouplings_tpu.ops.mean_field import invert_covariance_sharded
from jax.experimental import multihost_utils

rngc = np.random.default_rng(5)
D = 2 * 9 + 1                       # odd: exercises column padding
A = rngc.standard_normal((D, D))
C = A @ A.T + D * np.eye(D)
neg_inv = np.asarray(multihost_utils.process_allgather(
    invert_covariance_sharded(C, mesh), tiled=True))

if proc_id == 0:
    np.savez(out_file, J=res.J_ij, h=res.h_i,
             J_asym=res2.J_ij, h_asym=res2.h_i,
             neg_inv=neg_inv, C=C)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fit_matches_single_process(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    out_file = str(tmp_path / "result.npz")
    port = str(_free_port())

    env = dict(os.environ)
    # workers manage their own device count/backend
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), port, out_file],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out.decode())
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out

    dist = np.load(out_file)

    # single-process oracle on the same data/config
    from evcouplings_tpu.ops.plm import PlmConfig, fit_plm
    from evcouplings_tpu.ops.plm_sites import fit_plm_asym

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(64, 6)).astype(np.int8)
    weights = np.ones(64)
    ref = fit_plm(
        codes, weights, 5,
        PlmConfig(max_iter=15, block_size=32, solver="adam"),
    )

    np.testing.assert_allclose(dist["J"], ref.J_ij, rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(dist["h"], ref.h_i, rtol=1e-10,
                               atol=1e-12)

    # asymmetric per-site LBFGS with coupling rows sharded across the
    # two processes — fixed iteration count, float-rounding agreement
    ref2 = fit_plm_asym(
        codes, weights, 5,
        PlmConfig(max_iter=12, block_size=32, solver="lbfgs",
                  conv_tol=0.0),
    )
    # f32 fit; the worker runs under jax_enable_x64 (for the
    # symmetric bit-exact check above), which perturbs scalar
    # handling at float-rounding level
    np.testing.assert_allclose(dist["J_asym"], ref2.J_ij,
                               rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(dist["h_asym"], ref2.h_i,
                               rtol=1e-3, atol=2e-5)

    # the cross-process column-sharded inversion equals -inv(C)
    np.testing.assert_allclose(
        dist["neg_inv"], -np.linalg.inv(dist["C"]), atol=1e-8
    )
