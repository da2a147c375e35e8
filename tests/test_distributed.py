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


# --------------------------------------------------------------------------
# 3 processes, row count NOT divisible by the mesh (VERDICT r2 item 7):
# 67 rows over 3 single-device processes — pad_rows adds 5 inert rows
# (weight 0, code -1), every shard gets 24 (3 blocks of 8). Unlike the
# 2-process case above (where psum(b1, b2) associates exactly like the
# sequential (b1 + b2) scan and parity is bitwise), the single process
# here sums 9 blocks sequentially while the cluster sums 3 blocks per
# shard then psums 3 partials — a different float association — so
# agreement is at f32 accumulator rounding level, not bitwise.
# --------------------------------------------------------------------------

WORKER_UNEVEN = r"""
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
    num_processes=3,
    process_id=proc_id,
)
assert jax.device_count() == 3

import numpy as np
from jax.sharding import Mesh

from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

rng = np.random.default_rng(1)
codes = rng.integers(0, 4, size=(67, 5)).astype(np.int8)
weights = rng.uniform(0.5, 1.0, size=67)

mesh = Mesh(np.array(jax.devices()), ("data",))
cfg = PlmConfig(max_iter=12, block_size=8, solver="adam")
res = fit_plm(codes, weights, 4, cfg, mesh=mesh)

if proc_id == 0:
    np.savez(out_file, J=res.J_ij, h=res.h_i)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_three_process_uneven_rows_match_single_process(tmp_path):
    worker_py = tmp_path / "worker_uneven.py"
    worker_py.write_text(WORKER_UNEVEN)
    out_file = str(tmp_path / "result_uneven.npz")
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), port, out_file],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(3)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out.decode())
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out

    dist = np.load(out_file)

    from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(67, 5)).astype(np.int8)
    weights = rng.uniform(0.5, 1.0, size=67)
    ref = fit_plm(
        codes, weights, 4,
        PlmConfig(max_iter=12, block_size=8, solver="adam"),
    )

    # f32 compute: reduction-association difference (see block comment)
    # bounds agreement at ~1e-8 absolute, measured 1.1e-8
    np.testing.assert_allclose(dist["J"], ref.J_ij, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(dist["h"], ref.h_i, rtol=1e-4,
                               atol=1e-6)


# --------------------------------------------------------------------------
# 2D (data x model) mesh ACROSS processes (VERDICT r2 item 7): two
# processes with two virtual CPU devices each form a (2, 2) mesh; the
# asymmetric fit shards rows across hosts on "data" AND coupling rows
# across devices on "model" — the full cross-host tensor+data layout
# of a large-L pod-slice fit.
# --------------------------------------------------------------------------

WORKER_2D = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
out_file = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port,
    num_processes=2,
    process_id=proc_id,
)
assert jax.device_count() == 4
assert len(jax.local_devices()) == 2

import numpy as np
from jax.sharding import Mesh

from evcouplings_tpu.ops.plm import PlmConfig
from evcouplings_tpu.ops.plm_sites import fit_plm_asym

rng = np.random.default_rng(2)
codes = rng.integers(0, 4, size=(40, 6)).astype(np.int8)
weights = np.ones(40)

# hosts on the data axis (rows), local devices on the model axis
# (coupling rows): collectives over "data" cross the process boundary
mesh = Mesh(np.array(jax.devices()).reshape(2, 2), ("data", "model"))
cfg = PlmConfig(max_iter=10, block_size=8, solver="adam",
                conv_tol=0.0)
res = fit_plm_asym(codes, weights, 4, cfg, mesh=mesh)

if proc_id == 0:
    np.savez(out_file, J=res.J_ij, h=res.h_i)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_2d_mesh_across_processes_matches_single_device(tmp_path):
    worker_py = tmp_path / "worker_2d.py"
    worker_py.write_text(WORKER_2D)
    out_file = str(tmp_path / "result_2d.npz")
    port = str(_free_port())

    env = dict(os.environ)
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

    from evcouplings_tpu.ops.plm import PlmConfig
    from evcouplings_tpu.ops.plm_sites import fit_plm_asym

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(40, 6)).astype(np.int8)
    weights = np.ones(40)
    ref = fit_plm_asym(
        codes, weights, 4,
        PlmConfig(max_iter=10, block_size=8, solver="adam",
                  conv_tol=0.0),
    )

    # f32 fit; the 2D-sharded reduction (per-shard partials + psum)
    # reorders float sums vs the single-device block scan
    np.testing.assert_allclose(dist["J"], ref.J_ij, rtol=1e-3,
                               atol=2e-5)
    np.testing.assert_allclose(dist["h"], ref.h_i, rtol=1e-3,
                               atol=2e-5)


WORKER_CKPT_GUARD = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
out_file = sys.argv[3]
ckpt_dir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port,
    num_processes=2,
    process_id=proc_id,
)

import numpy as np
from jax.sharding import Mesh

from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

rng = np.random.default_rng(0)
codes = rng.integers(0, 5, size=(64, 6)).astype(np.int8)
weights = np.ones(64)
mesh = Mesh(np.array(jax.devices()), ("data",))
cfg = PlmConfig(max_iter=4, block_size=32, solver="adam")

# the checkpoint path resolves to a PER-PROCESS directory (a stand-in
# for host-local disk): the file exists only on process 0, so the fit
# must refuse loudly on every process instead of desynchronizing
ckpt = os.path.join(ckpt_dir, "fit.ckpt.npz")
try:
    fit_plm(codes, weights, 5, cfg, mesh=mesh, checkpoint_file=ckpt)
    outcome = "NO-ERROR"
except ValueError as e:
    outcome = "GUARD " + str(e)[:200]
with open(out_file + ".p{}".format(proc_id), "w") as f:
    f.write(outcome)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_checkpoint_on_non_shared_filesystem_refuses(tmp_path):
    """A checkpoint visible to only SOME processes (host-local disk)
    must raise an actionable error on every process — the alternative
    is divergent resume decisions and a collective deadlock."""
    out_file = str(tmp_path / "outcome")
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for i in range(2):
        d = tmp_path / "host{}".format(i)
        d.mkdir()
        if i == 0:
            # only "host 0" carries a prior checkpoint file
            (d / "fit.ckpt.npz").write_bytes(b"prior")
        worker_py = tmp_path / "worker{}.py".format(i)
        worker_py.write_text(WORKER_CKPT_GUARD)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(i), port, out_file,
             str(d)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out.decode())
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out

    for i in range(2):
        text = open(out_file + ".p{}".format(i)).read()
        assert text.startswith("GUARD"), (i, text, outputs)
        assert "shared" in text, text
