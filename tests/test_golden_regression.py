"""Golden-regression gate on the parity-mode fit.

The cross-validation tests (tests/test_reference_parity.py) verify our
scoring/ΔE kernels against the live reference implementation — but if
the FITTER's numerics drift, both sides score the drifted model
consistently and nothing fails. This fixture pins the parity-mode fit
OUTPUT itself: the EC table and plmc_v2 model produced from a bundled
MSA at float32 + Precision.HIGHEST, LBFGS, fixed iterations. Any
change to the objective, gradient, reduction orders, optimizer, or
codec that alters the result shows up here.

Regenerate (only for a DELIBERATE, understood numerics change):
    EVCOUPLINGS_JAX_PLATFORM=cpu python tests/data/golden/regen.py
"""

import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "data", "golden")

# tight but not bitwise: XLA CPU f32 "highest" is deterministic within
# a version; small cross-version instruction-selection differences are
# tolerated, real numerics changes (>= 1e-4 relative) are not
RTOL, ATOL = 1e-4, 1e-5


@pytest.fixture(scope="module")
def refit(tmp_path_factory):
    from evcouplings_tpu.couplings.fitter import run_plm

    d = tmp_path_factory.mktemp("golden_refit")
    ec_file = str(d / "ECs.txt")
    model_file = str(d / "m.model")
    run_plm(
        os.path.join(GOLDEN, "golden.a2m"), ec_file, model_file,
        focus_seq="TARGET_SEQ/11-28",
        theta=0.8, iterations=40, lambda_h=0.01, lambda_J=16.15,
        solver="lbfgs", compute_dtype="float32",
        matmul_precision="highest",
    )
    return ec_file, model_file


def test_ec_table_matches_golden(refit):
    from evcouplings_tpu.couplings.pairs import read_raw_ec_file

    ec_file, _ = refit
    got = read_raw_ec_file(ec_file, sort=False)
    want = read_raw_ec_file(
        os.path.join(GOLDEN, "golden_ECs.txt"), sort=False)
    assert (got.i == want.i).all() and (got.j == want.j).all()
    np.testing.assert_allclose(
        got.cn.values, want.cn.values, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        got.fn.values, want.fn.values, rtol=RTOL, atol=ATOL)
    # the contact RANKING must be stable wherever the golden scores
    # are separated by more than the tolerated numeric drift (exact
    # ranking over near-ties would flake on any toolchain update)
    want_sorted = np.sort(want.cn.values)[::-1]
    gaps = -np.diff(want_sorted)
    drift = 2 * (RTOL * np.abs(want_sorted[:-1]) + ATOL)
    well_separated = np.flatnonzero(gaps > drift)
    got_rank = np.argsort(-got.cn.values)
    want_rank = np.argsort(-want.cn.values)
    for k in well_separated:
        # the set of the top-(k+1) ECs is unambiguous at this gap
        np.testing.assert_array_equal(
            np.sort(got_rank[:k + 1]), np.sort(want_rank[:k + 1]))


def test_model_file_matches_golden(refit):
    from evcouplings_tpu.couplings.model import CouplingsModel

    _, model_file = refit
    got = CouplingsModel(model_file)
    want = CouplingsModel(os.path.join(GOLDEN, "golden.model"))

    assert got.L == want.L and got.num_symbols == want.num_symbols
    assert list(got.index_list) == list(want.index_list)
    assert "".join(got.target_seq) == "".join(want.target_seq)
    np.testing.assert_allclose(got.weights, want.weights, rtol=1e-6)
    np.testing.assert_allclose(got.f_i, want.f_i, rtol=1e-6)
    np.testing.assert_allclose(got.h_i, want.h_i, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        got.J_ij, want.J_ij, rtol=RTOL, atol=ATOL)
