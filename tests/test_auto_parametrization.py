"""Preflight HBM routing of the couplings fit (VERDICT r1 item 5).

parametrization "auto" (the protocol default) must keep plmc-parity
symmetric semantics while the estimated device footprint fits, fall
back to the asymmetric site-sharded fit transparently when it does
not, and an EXPLICIT "symmetric" request past the budget must raise
an actionable error instead of compiling into an OOM.

Budgets are simulated via EVCOUPLINGS_HBM_BYTES
(ops/plm.py device_hbm_budget).
"""

import os

import numpy as np
import pytest

from evcouplings_tpu.couplings import fitter
from evcouplings_tpu.ops.plm import (
    PlmConfig,
    device_hbm_budget,
    estimate_fit_hbm_bytes,
)

AA = "-ACDEFGHIKLMNPQRSTVWY"
N_SEQ, L = 40, 14


@pytest.fixture
def tiny_alignment(tmp_path):
    rng = np.random.default_rng(7)
    f = tmp_path / "aln.fa"
    with open(f, "w") as fh:
        for k in range(N_SEQ):
            seq = "".join(AA[i + 1] for i in rng.integers(0, 20, L))
            fh.write(">s{}/1-{}\n{}\n".format(k, L, seq))
    return str(f)


def _estimates():
    sym = estimate_fit_hbm_bytes(
        N_SEQ, L, 21, PlmConfig(solver="lbfgs"), "symmetric",
    )
    asym = estimate_fit_hbm_bytes(
        N_SEQ, L, 21, PlmConfig(solver="adam"), "asymmetric",
    )
    return sym, asym


def test_estimator_shapes_and_budget(monkeypatch):
    sym, asym = _estimates()
    # symmetric LBFGS carries ~17 D-sized arrays, asymmetric adam ~4:
    # the asymmetric path must come out materially cheaper
    assert asym < sym

    # calibration anchor: the known single-chip (16 GiB) symmetric
    # ceiling sits between L=500 (fits) and L=900 (dies)
    cfg = PlmConfig(solver="lbfgs")
    assert estimate_fit_hbm_bytes(16384, 500, 21, cfg) < 16 * 2 ** 30
    assert estimate_fit_hbm_bytes(16384, 900, 21, cfg) > 16 * 2 ** 30

    # env override wins (monkeypatch restores any pre-existing value)
    monkeypatch.setenv("EVCOUPLINGS_HBM_BYTES", "12345")
    assert device_hbm_budget() == 12345


def test_estimator_counts_two_phase_working_set():
    """A production bfloat16 fit with large blocks resolves the
    two-phase grad layout, which holds the static one-hot + residual
    buffers (~2 x N*Lq_aug*2 bytes) resident — the estimate must count
    that, not just the carried-layout accumulator (the router resolves
    the real block size BEFORE estimating for exactly this reason)."""
    n, l, q = 32768, 160, 21
    carried = estimate_fit_hbm_bytes(
        n, l, q, PlmConfig(solver="adam", dtype="bfloat16",
                           block_size=512))
    two_phase = estimate_fit_hbm_bytes(
        n, l, q, PlmConfig(solver="adam", dtype="bfloat16",
                           block_size=8192))
    # the resident working set exceeds one full bf16 one-hot
    assert two_phase - carried > n * l * q * 2


def test_symmetric_estimate_ignores_model_axis(tiny_alignment, tmp_path,
                                               monkeypatch):
    """The symmetric fit shards rows over "data" only; a model axis
    replicates them. The preflight must NOT credit model shards with
    reducing the symmetric per-device footprint."""
    cfg = PlmConfig(solver="lbfgs")
    base = estimate_fit_hbm_bytes(
        4096, 64, 21, cfg, "symmetric", n_data_shards=2)
    # passing more data shards shrinks the estimate...
    assert estimate_fit_hbm_bytes(
        4096, 64, 21, cfg, "symmetric", n_data_shards=4) < base
    # ...and run_plm's symmetric routing passes only the data axis:
    # with a (1 data x 4 model) mesh and a budget sized for the
    # UNSHARDED footprint, an explicit symmetric request must raise
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "model"))
    full = estimate_fit_hbm_bytes(
        N_SEQ, L, 21, PlmConfig(solver="lbfgs"), "symmetric",
        n_data_shards=1)
    monkeypatch.setenv(
        "EVCOUPLINGS_HBM_BYTES", str(int(full / 0.9) - 1))
    with pytest.raises(MemoryError):
        fitter.run_plm(
            tiny_alignment, str(tmp_path / "ECs.txt"),
            str(tmp_path / "m.model"), iterations=2,
            parametrization="symmetric", mesh=mesh,
        )


def test_auto_stays_symmetric_with_room(tiny_alignment, tmp_path,
                                        monkeypatch):
    calls = []
    real = fitter.fit_plm

    def spy(*a, **k):
        calls.append("symmetric")
        return real(*a, **k)

    monkeypatch.setattr(fitter, "fit_plm", spy)
    res = fitter.run_plm(
        tiny_alignment, str(tmp_path / "ECs.txt"),
        str(tmp_path / "m.model"), iterations=3,
    )
    assert calls == ["symmetric"]
    assert res.num_valid_seqs == N_SEQ


def test_auto_falls_back_to_asymmetric(tiny_alignment, tmp_path,
                                       monkeypatch):
    sym, asym = _estimates()
    # a budget the symmetric fit misses but the asymmetric fit meets
    monkeypatch.setenv("EVCOUPLINGS_HBM_BYTES", str(int(sym / 0.9) - 1))
    assert asym < int(sym / 0.9) - 1

    import evcouplings_tpu.ops.plm_sites as plm_sites

    calls = []
    real = plm_sites.fit_plm_asym

    def spy(*a, **k):
        calls.append("asymmetric")
        return real(*a, **k)

    monkeypatch.setattr(plm_sites, "fit_plm_asym", spy)
    res = fitter.run_plm(
        tiny_alignment, str(tmp_path / "ECs.txt"),
        str(tmp_path / "m.model"), iterations=3,
    )
    # transparent success on the asymmetric path
    assert calls == ["asymmetric"]
    assert res.num_valid_seqs == N_SEQ
    assert os.path.getsize(str(tmp_path / "ECs.txt")) > 0
    assert os.path.getsize(str(tmp_path / "m.model")) > 0


def test_explicit_symmetric_raises_actionable(tiny_alignment, tmp_path,
                                              monkeypatch):
    sym, _ = _estimates()
    monkeypatch.setenv("EVCOUPLINGS_HBM_BYTES", str(int(sym / 0.9) - 1))

    with pytest.raises(MemoryError, match="parametrization: asymmetric"):
        fitter.run_plm(
            tiny_alignment, str(tmp_path / "ECs.txt"),
            str(tmp_path / "m.model"), iterations=3,
            parametrization="symmetric",
        )


def test_asymmetric_past_budget_suggests_model_shards(
        tiny_alignment, tmp_path, monkeypatch):
    monkeypatch.setenv("EVCOUPLINGS_HBM_BYTES", str(1024))

    with pytest.raises(MemoryError, match="model_shards"):
        fitter.run_plm(
            tiny_alignment, str(tmp_path / "ECs.txt"),
            str(tmp_path / "m.model"), iterations=3,
        )


def test_protocol_routes_auto(tiny_alignment, tmp_path, monkeypatch):
    """The standard couplings protocol (no parametrization key)
    transparently succeeds past the simulated symmetric ceiling."""
    from evcouplings_tpu.couplings import protocol as cp

    sym, _ = _estimates()
    monkeypatch.setenv("EVCOUPLINGS_HBM_BYTES", str(int(sym / 0.9) - 1))

    import evcouplings_tpu.ops.plm_sites as plm_sites

    calls = []
    real = plm_sites.fit_plm_asym

    def spy(*a, **k):
        calls.append("asymmetric")
        return real(*a, **k)

    monkeypatch.setattr(plm_sites, "fit_plm_asym", spy)

    prefix = str(tmp_path / "run" / "job")
    outcfg, ecs, segments = cp.infer_plmc(
        prefix=prefix,
        alignment_file=tiny_alignment,
        focus_mode=False,
        focus_sequence=None,
        theta=0.8,
        alphabet=None,
        segments=None,
        ignore_gaps=False,
        iterations=3,
        lambda_h=0.01,
        lambda_J=0.01,
        lambda_group=0.0,
        lambda_J_times_Lq=True,
        scale_clusters=None,
        cpu=1,
        reuse_ecs=False,
    )
    assert calls == ["asymmetric"]
    assert len(ecs) > 0
    assert os.path.isfile(outcfg["model_file"])


def test_pad_sites_bucket_shares_shape(tiny_alignment, tmp_path):
    """pad_sites_to buckets the fitted site count: the padded fit
    produces the same EC ranking on the true sites and a model at the
    TRUE L, while the fitted shape rounds up to the bucket (the whole
    point: one compiled program per bucket in a sweep)."""
    from evcouplings_tpu.couplings.model import CouplingsModel
    from evcouplings_tpu.couplings.pairs import read_raw_ec_file

    base = fitter.run_plm(
        tiny_alignment, str(tmp_path / "a_ECs.txt"),
        str(tmp_path / "a.model"), iterations=8,
    )
    padded = fitter.run_plm(
        tiny_alignment, str(tmp_path / "b_ECs.txt"),
        str(tmp_path / "b.model"), iterations=8, pad_sites_to=32,
        pad_rows_to=64,
    )
    assert base.num_valid_sites == padded.num_valid_sites == L

    e1 = read_raw_ec_file(str(tmp_path / "a_ECs.txt"), sort=False)
    e2 = read_raw_ec_file(str(tmp_path / "b_ECs.txt"), sort=False)
    assert len(e1) == len(e2) == L * (L - 1) // 2
    np.testing.assert_allclose(
        e1.cn.values, e2.cn.values, rtol=1e-4, atol=1e-6)
    assert list(np.argsort(-e1.cn.values)) == \
        list(np.argsort(-e2.cn.values))

    # artifacts carry the TRUE L
    m = CouplingsModel(str(tmp_path / "b.model"))
    assert m.L == L
