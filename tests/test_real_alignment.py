"""End-to-end fit on the reference's only bundled REAL biological
alignment (notebooks/example/example_aln.a2m — a cadherin domain
family, 53 sequences): the complete run_plm path (reweighting, auto
parametrization, LBFGS fit, scoring, artifacts) on actual protein
data rather than synthetic planted-pair alignments."""

import os

import numpy as np
import pytest

REAL_A2M = "/root/reference/notebooks/example/example_aln.a2m"


@pytest.mark.skipif(not os.path.isfile(REAL_A2M),
                    reason="reference checkout not available")
def test_fit_real_cadherin_alignment(tmp_path):
    from evcouplings_tpu.align.alignment import Alignment
    from evcouplings_tpu.couplings.fitter import run_plm
    from evcouplings_tpu.couplings.model import CouplingsModel
    from evcouplings_tpu.couplings.pairs import (
        add_mixture_probability, read_raw_ec_file,
    )

    # the full family spans 423 columns — fit the first 60-residue
    # subregion so the CPU-CI fit stays fast while the DATA stays real
    L = 60
    ali = Alignment.from_path(REAL_A2M)
    sub = ali.select(columns=range(L))
    sliced = str(tmp_path / "cad_sub.a2m")
    with open(sliced, "w") as f:
        sub.write(f, format="fasta")

    ec_file = str(tmp_path / "cad_ECs.txt")
    model_file = str(tmp_path / "cad.model")
    res = run_plm(
        sliced, ec_file, model_file,
        focus_seq=str(ali.ids[0]),     # uppercase match columns
        theta=0.8, iterations=25,
        lambda_h=0.01, lambda_J=0.01 * 20 * (L - 1),
        solver="lbfgs",
    )
    assert res.num_valid_seqs > 40
    assert res.num_valid_sites == L
    # real families have N_eff well below N (redundant sequences)
    assert 1 < res.effective_samples < res.num_valid_seqs

    ecs = read_raw_ec_file(ec_file)
    assert len(ecs) == L * (L - 1) // 2
    assert np.isfinite(ecs.cn).all()
    # APC leaves a roughly centered score distribution with a heavy
    # right tail of real couplings
    assert ecs.cn.max() > 0

    # the mixture model runs on real score distributions
    scored = add_mixture_probability(ecs, model="skewnormal")
    assert scored.probability.between(0, 1).all()

    # the model file round-trips and scores
    m = CouplingsModel(model_file)
    assert m.L == L
    assert np.isfinite(m.smm()).all()
    # model-derived CN scores match the EC file
    top = ecs.sort_values("cn", ascending=False).iloc[0]
    np.testing.assert_allclose(
        m.cn(int(top.i), int(top.j)), top.cn, atol=1e-5)


@pytest.mark.skipif(not os.path.isfile(REAL_A2M),
                    reason="reference checkout not available")
def test_fit_without_focus_raises_actionable(tmp_path):
    """The same a2m without focus mode has lowercase insert columns in
    every row — the fitter must explain that, not crash in the
    reweighting kernel on a zero-row matrix."""
    from evcouplings_tpu.couplings.fitter import run_plm
    from evcouplings_tpu.utils.system import ResourceError

    with pytest.raises(ResourceError, match="focus"):
        run_plm(REAL_A2M, str(tmp_path / "x_ECs.txt"), iterations=2)
