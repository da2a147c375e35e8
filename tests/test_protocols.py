"""
End-to-end protocol tests: align `existing` -> couplings `standard` /
`mean_field` -> mutate calculations, all on a bundled synthetic focus
alignment (the hermetic minimum pipeline slice; no external binaries).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.align import protocol as align_protocol
from evcouplings_tpu.couplings import protocol as couplings_protocol
from evcouplings_tpu.couplings.model import CouplingsModel
from evcouplings_tpu.couplings.pairs import read_raw_ec_file
from evcouplings_tpu.mutate import predict_mutation_table, single_mutant_matrix


def write_synthetic_a2m(path, N=150, L=18, seed=7):
    """Focus-style alignment with several coupled column pairs, of
    graded strength, so score distributions have a real signal tail
    (a single planted outlier degenerates the EM mixture fit)."""
    rng = np.random.default_rng(seed)
    aa = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    mat = np.empty((N, L), dtype="U1")
    for col in range(L):
        probs = rng.dirichlet(np.ones(20) * 0.4)
        mat[:, col] = rng.choice(aa, size=N, p=probs)

    # planted covarying pairs: (cols, symbols, concordance)
    planted = [
        ((2, 9), ("A", "W"), ("C", "Y"), 0.90),
        ((4, 15), ("D", "R"), ("E", "K"), 0.78),
        ((6, 12), ("F", "L"), ("H", "T"), 0.68),
    ]
    for (ci, cj), (si0, si1), (sj0, sj1), conc in planted:
        state = rng.integers(0, 2, size=N)
        follow = rng.random(N) < conc
        partner = np.where(follow, state, 1 - state)
        mat[:, ci] = np.where(state == 0, si0, si1)
        mat[:, cj] = np.where(partner == 0, sj0, sj1)
    # sprinkle a few gaps in non-target rows
    gap_rows = rng.integers(1, N, size=10)
    gap_cols = rng.integers(0, L, size=10)
    mat[gap_rows, gap_cols] = "-"

    with open(path, "w") as f:
        f.write(">TARGET_SEQ/11-{}\n".format(11 + L - 1))
        f.write("".join(mat[0]) + "\n")
        for k in range(1, N):
            f.write(">seq{}/1-{}\n{}\n".format(k, L, "".join(mat[k])))
    return mat


def write_synthetic_a2m_gappy(path, N=130, L=16, seed=23):
    """Second golden-fixture alignment: like write_synthetic_a2m but
    with HEAVY gaps (two columns at ~35% gap rate plus scattered
    gaps), for pinning the fitter's gap handling (plmc -g semantics
    via ignore_gaps) together with focus mode and group-L1."""
    rng = np.random.default_rng(seed)
    aa = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    mat = np.empty((N, L), dtype="U1")
    for col in range(L):
        probs = rng.dirichlet(np.ones(20) * 0.4)
        mat[:, col] = rng.choice(aa, size=N, p=probs)

    planted = [
        ((1, 8), ("A", "W"), ("C", "Y"), 0.88),
        ((5, 13), ("D", "R"), ("E", "K"), 0.72),
    ]
    for (ci, cj), (si0, si1), (sj0, sj1), conc in planted:
        state = rng.integers(0, 2, size=N)
        follow = rng.random(N) < conc
        partner = np.where(follow, state, 1 - state)
        mat[:, ci] = np.where(state == 0, si0, si1)
        mat[:, cj] = np.where(partner == 0, sj0, sj1)

    # heavy gap columns (non-target rows): ~35% gap rate
    for col in (3, 11):
        gappy = 1 + rng.choice(N - 1, size=int(0.35 * N), replace=False)
        mat[gappy, col] = "-"
    # plus scattered gaps everywhere
    gap_rows = rng.integers(1, N, size=40)
    gap_cols = rng.integers(0, L, size=40)
    mat[gap_rows, gap_cols] = "-"

    with open(path, "w") as f:
        f.write(">TARGET_SEQ/21-{}\n".format(21 + L - 1))
        f.write("".join(mat[0]) + "\n")
        for k in range(1, N):
            f.write(">seq{}/1-{}\n{}\n".format(k, L, "".join(mat[k])))
    return mat


ALIGN_KWARGS = dict(
    sequence_id="TARGET_SEQ",
    first_index=None,
    extract_annotation=False,
    seqid_filter=None,
    hhfilter=None,
    minimum_sequence_coverage=50,
    minimum_column_coverage=70,
    compute_num_effective_seqs=True,
    theta=0.8,
)

COUPLINGS_KWARGS = dict(
    focus_mode=True,
    theta=0.8,
    alphabet=None,
    ignore_gaps=False,
    iterations=40,
    lambda_h=0.01,
    lambda_J=0.01,
    lambda_group=None,
    lambda_J_times_Lq=True,
    scale_clusters=None,
    cpu=None,
    reuse_ecs=False,
    min_sequence_distance=3,
    scoring_model="skewnormal",
)


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    """Run align existing -> couplings standard once for all tests."""
    d = tmp_path_factory.mktemp("slice")
    a2m = str(d / "input.a2m")
    write_synthetic_a2m(a2m)

    prefix = str(d / "run" / "test")
    align_outcfg = align_protocol.run(
        protocol="existing", prefix=prefix, input_alignment=a2m,
        **ALIGN_KWARGS,
    )

    couplings_outcfg = couplings_protocol.run(
        protocol="standard",
        prefix=prefix,
        alignment_file=align_outcfg["alignment_file"],
        focus_sequence=align_outcfg["focus_sequence"],
        segments=align_outcfg["segments"],
        frequencies_file=align_outcfg["frequencies_file"],
        **COUPLINGS_KWARGS,
    )
    return d, prefix, align_outcfg, couplings_outcfg


class TestAlignExisting:
    def test_outputs_exist(self, pipeline_dir):
        _, prefix, outcfg, _ = pipeline_dir
        for key in ("alignment_file", "statistics_file",
                    "frequencies_file", "identities_file",
                    "raw_focus_alignment_file", "target_sequence_file",
                    "sequence_weights_file"):
            assert os.path.isfile(outcfg[key]), key

        assert outcfg["focus_mode"] is True
        assert outcfg["focus_sequence"] == "TARGET_SEQ/11-28"
        assert outcfg["first_index"] == 11
        assert outcfg["num_sites"] == 18
        assert outcfg["effective_sequences"] > 0

    def test_statistics_content(self, pipeline_dir):
        _, prefix, outcfg, _ = pipeline_dir
        stats = pd.read_csv(outcfg["statistics_file"])
        assert stats.num_seqs.iloc[0] == outcfg["num_sequences"]
        assert stats.N_eff.iloc[0] == pytest.approx(
            outcfg["effective_sequences"], abs=0.01
        )

        freqs = pd.read_csv(outcfg["frequencies_file"])
        assert list(freqs.columns[:3]) == ["i", "A_i", "conservation"]
        assert freqs.i.iloc[0] == 11

        idents = pd.read_csv(outcfg["identities_file"])
        assert idents.identity_to_query.iloc[0] == pytest.approx(1.0)

    def test_segments(self, pipeline_dir):
        _, _, outcfg, _ = pipeline_dir
        # layout: [segment_id, segment_type, sequence_id,
        #          region_start, region_end, positions]
        seg = outcfg["segments"][0]
        assert seg[1] == "aa"
        assert seg[2] == "TARGET_SEQ"
        assert seg[3] == 11

    def test_missing_target_raises(self, tmp_path):
        a2m = str(tmp_path / "x.a2m")
        write_synthetic_a2m(a2m, N=10)
        from evcouplings_tpu.utils.config import InvalidParameterError

        with pytest.raises(InvalidParameterError):
            align_protocol.run(
                protocol="existing", prefix=str(tmp_path / "y"),
                input_alignment=a2m,
                **{**ALIGN_KWARGS, "sequence_id": "NOT_THERE"},
            )


class TestCouplingsStandard:
    def test_production_mode_recovers_same_top_ec(self, pipeline_dir):
        """The beyond-reference fitter knobs (solver / precision /
        steps_per_call) must be accepted from stage config and the
        production numerics must find the same planted pair."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run_production" / "test")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(
            solver="adam", precision="production", steps_per_call=25,
            iterations=500,
        )
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_balanced_mode_recovers_same_top_ec(self, pipeline_dir):
        """balanced = float32 state with 3-pass matmuls; same planted
        pair as parity/production."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run_balanced" / "test")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(precision="balanced")
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_asymmetric_parametrization_recovers_same_top_ec(
            self, pipeline_dir):
        """parametrization: asymmetric (site-sharded per-site
        regressions, Adam defaulted automatically) finds the same
        planted pair through the full couplings stage."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run_asym" / "test")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(
            parametrization="asymmetric", precision="production",
            steps_per_call=25, iterations=500,
        )
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_asymmetric_with_lbfgs_recovers_same_top_ec(
            self, pipeline_dir):
        """parametrization: asymmetric with the per-site LBFGS solver
        converges to the same planted pair in far fewer iterations
        than the Adam default."""
        d, _, align_outcfg, _ = pipeline_dir
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(
            parametrization="asymmetric", solver="lbfgs",
            steps_per_call=5, iterations=120,
        )
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=str(d / "run_asym_lbfgs" / "test"),
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_fit_devices_mesh_recovers_same_top_ec(self, pipeline_dir):
        """fit_devices row-shards the fit over a device mesh (the
        test session exposes 8 virtual CPU devices); results must
        match the single-device planted pair."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run_mesh" / "test")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(fit_devices=2)
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_model_shards_2d_mesh_asymmetric(self, pipeline_dir):
        """model_shards > 1 builds the 2D (data, model) mesh for the
        asymmetric parametrization."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run_mesh2d" / "test")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(
            parametrization="asymmetric", fit_devices=4,
            model_shards=2, steps_per_call=25, iterations=500,
        )
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_model_shards_requires_asymmetric(self, pipeline_dir):
        """model_shards > 1 only exists on the asymmetric path: with
        the default parametrization ("auto") it resolves the routing
        to asymmetric and succeeds; an EXPLICIT symmetric request
        still raises."""
        from evcouplings_tpu.utils.config import InvalidParameterError

        d, _, align_outcfg, _ = pipeline_dir
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(model_shards=2, parametrization="symmetric")
        with pytest.raises(InvalidParameterError, match="asymmetric"):
            couplings_protocol.run(
                protocol="standard",
                prefix=str(d / "run_bad_shards" / "test"),
                alignment_file=align_outcfg["alignment_file"],
                focus_sequence=align_outcfg["focus_sequence"],
                segments=align_outcfg["segments"],
                frequencies_file=align_outcfg["frequencies_file"],
                **kwargs,
            )

        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(model_shards=2)  # parametrization left at "auto"
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=str(d / "run_auto_shards" / "test"),
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        assert os.path.isfile(outcfg["model_file"])

    def test_checkpoint_every_plumbs_and_cleans_up(self, pipeline_dir,
                                                   monkeypatch):
        """checkpoint_every wires mid-fit snapshots through the
        protocol (run_plm checkpoint_file under the job prefix) and
        removes the snapshot after a completed fit."""
        from evcouplings_tpu.couplings import fitter as ct

        d, _, align_outcfg, _ = pipeline_dir
        seen = {}
        real = ct.run_plm

        def spy(*a, **k):
            seen.update(k)
            return real(*a, **k)

        monkeypatch.setattr(couplings_protocol.ct, "run_plm", spy)

        prefix = str(d / "run_ckpt" / "test")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(checkpoint_every=3, iterations=7)
        couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        assert seen["checkpoint_every"] == 3
        assert seen["checkpoint_file"] == prefix + ".fit_checkpoint.npz"
        # the snapshot was written during the fit and removed after it
        assert not os.path.exists(prefix + ".fit_checkpoint.npz")

        # a STALE snapshot (e.g. from an earlier crashed run) is also
        # removed by a completed fit that has checkpointing OFF
        with open(prefix + ".fit_checkpoint.npz", "wb") as f:
            f.write(b"stale")
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(iterations=5)
        couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )
        assert not os.path.exists(prefix + ".fit_checkpoint.npz")

    def test_logistic_regression_none_min_seqdist(self, pipeline_dir):
        """min_sequence_distance: null is legal elsewhere in the stage
        and must not crash the logistic-regression rescorer (the
        reference raises a raw TypeError here)."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run_lr_none" / "test")
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **{**COUPLINGS_KWARGS,
               "scoring_model": "logistic_regression",
               "min_sequence_distance": None},
        )
        assert "expected_true_ecs_all" in outcfg

    def test_invalid_precision_rejected(self, pipeline_dir):
        from evcouplings_tpu.utils.config import InvalidParameterError

        d, _, align_outcfg, _ = pipeline_dir
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs["precision"] = "half"
        with pytest.raises(InvalidParameterError, match="precision"):
            couplings_protocol.run(
                protocol="standard",
                prefix=str(d / "run_bad" / "test"),
                alignment_file=align_outcfg["alignment_file"],
                focus_sequence=align_outcfg["focus_sequence"],
                segments=align_outcfg["segments"],
                frequencies_file=align_outcfg["frequencies_file"],
                **kwargs,
            )

    def test_artifacts(self, pipeline_dir):
        _, prefix, _, outcfg = pipeline_dir
        for key in ("raw_ec_file", "model_file", "ec_file",
                    "ec_longrange_file", "enrichment_file",
                    "evzoom_file"):
            assert os.path.isfile(outcfg[key]), key
        assert os.path.isfile(prefix + "_iteration_table.csv")

    def test_coupled_pair_is_top_ec(self, pipeline_dir):
        """The planted covarying pair (columns 2, 9 -> positions 13, 20)
        must rank first by CN score."""
        _, _, _, outcfg = pipeline_dir
        raw = read_raw_ec_file(outcfg["raw_ec_file"])
        top = raw.iloc[0]
        assert (top.i, top.j) == (13, 20)

        ecs = pd.read_csv(outcfg["ec_file"])
        assert {"probability", "score"} <= set(ecs.columns)
        top_scored = ecs.iloc[0]
        assert (top_scored.i, top_scored.j) == (13, 20)
        assert top_scored.probability > 0.5

    def test_model_file_roundtrip(self, pipeline_dir):
        _, _, align_outcfg, outcfg = pipeline_dir
        model = CouplingsModel(outcfg["model_file"])
        assert model.L == 18
        assert model.num_symbols == 21
        assert "".join(model.target_seq) != ""
        assert model.index_list[0] == 11
        assert model.N_eff == pytest.approx(
            outcfg["effective_sequences"], rel=1e-5
        )
        # CN scores recomputed from stored parameters match the raw file
        raw = read_raw_ec_file(outcfg["raw_ec_file"], sort=False)
        cn_from_model = model.cn()
        ii = model.mn(raw.i.values)
        jj = model.mn(raw.j.values)
        assert cn_from_model[ii, jj] == pytest.approx(
            raw.cn.values, abs=5e-6
        )

    def test_evzoom_json_valid(self, pipeline_dir):
        _, _, _, outcfg = pipeline_dir
        with open(outcfg["evzoom_file"]) as f:
            data = json.load(f)
        assert set(data) == {"map", "logo", "couplings"}
        assert len(data["map"]["letters"]) == 18

    def test_reuse_ecs(self, pipeline_dir):
        """With reuse_ecs, the fit is skipped and artifacts reused."""
        d, prefix, align_outcfg, outcfg = pipeline_dir
        mtime = os.path.getmtime(outcfg["model_file"])

        outcfg2 = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **{**COUPLINGS_KWARGS, "reuse_ecs": True},
        )
        assert os.path.getmtime(outcfg2["model_file"]) == mtime

    def test_logistic_regression_scoring(self, pipeline_dir):
        d, _, align_outcfg, _ = pipeline_dir
        prefix2 = str(d / "run2" / "test")
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix2,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **{**COUPLINGS_KWARGS, "scoring_model": "logistic_regression"},
        )
        assert "expected_true_ecs_all" in outcfg
        ecs = pd.read_csv(outcfg["ec_file"])
        assert {"probability", "score", "mad_score"} <= set(ecs.columns)


class TestCouplingsMeanField:
    def test_mean_field_protocol(self, pipeline_dir):
        d, _, align_outcfg, _ = pipeline_dir
        prefix3 = str(d / "run3" / "test")
        outcfg = couplings_protocol.run(
            protocol="mean_field",
            prefix=prefix3,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            focus_mode=True,
            theta=0.8,
            pseudo_count=0.5,
            alphabet=None,
            min_sequence_distance=3,
            ec_score_type="di",
            scoring_model="skewnormal",
        )
        ecs = pd.read_csv(outcfg["ec_file"])
        assert {"mi_raw", "mi_apc", "di", "cn", "score"} <= set(ecs.columns)
        # DI selected as score; planted pair on top
        top = ecs.iloc[0]
        assert (top.i, top.j) == (13, 20)

    def test_mean_field_protocol_fit_devices(self, pipeline_dir):
        """fit_devices column-shards the covariance inversion over the
        8-virtual-device test mesh; the EC table must match the
        single-device run up to solve rounding."""
        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(d / "run3_mesh" / "test")
        outcfg = couplings_protocol.run(
            protocol="mean_field",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            focus_mode=True,
            theta=0.8,
            pseudo_count=0.5,
            alphabet=None,
            min_sequence_distance=3,
            ec_score_type="di",
            scoring_model="skewnormal",
            fit_devices="all",
        )
        ecs = pd.read_csv(outcfg["ec_file"])
        top = ecs.iloc[0]
        assert (top.i, top.j) == (13, 20)


class TestMutateOnFittedModel:
    def test_single_mutant_matrix_and_table(self, pipeline_dir):
        _, _, _, outcfg = pipeline_dir
        model = CouplingsModel(outcfg["model_file"])

        smm = single_mutant_matrix(model)
        assert len(smm) == 18 * 19

        wt11 = model.seq(11)
        table = pd.DataFrame({"mutant": ["{}11A".format(wt11)]})
        pred = predict_mutation_table(model, table)
        assert np.isfinite(pred.prediction_epistatic.iloc[0])


class TestCouplingsGroupL1Protocol:
    def test_standard_protocol_with_lambda_group_routes_to_fista(
            self, pipeline_dir, tmp_path):
        """Config-level group-L1 (VERDICT r2 item 6, protocol level):
        `lambda_group > 0` with no explicit solver must route to the
        proximal FISTA solver, produce the full artifact set (model +
        EC table + iteration table with the fx/gnorm/xnorm columns),
        and store lambda_group in the plmc_v2 header. A large
        lambda_group must also land pair blocks at EXACTLY zero —
        the observable the smoothed path cannot produce."""
        from evcouplings_tpu.couplings.model import CouplingsModel

        d, _, align_outcfg, _ = pipeline_dir
        prefix = str(tmp_path / "g" / "test")

        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(lambda_group=5.0, lambda_J=0.05,
                      lambda_J_times_Lq=False, iterations=150,
                      steps_per_call=25)
        outcfg = couplings_protocol.run(
            protocol="standard",
            prefix=prefix,
            alignment_file=align_outcfg["alignment_file"],
            focus_sequence=align_outcfg["focus_sequence"],
            segments=align_outcfg["segments"],
            frequencies_file=align_outcfg["frequencies_file"],
            **kwargs,
        )

        for key in ("model_file", "raw_ec_file", "ec_file"):
            assert os.path.isfile(outcfg[key]), key

        m = CouplingsModel(outcfg["model_file"])
        assert m.lambda_group == pytest.approx(5.0)
        bn = np.sqrt((m.J_ij ** 2).sum(axis=(2, 3)))
        ii, jj = np.triu_indices(m.L, k=1)
        n_zero = int((bn[ii, jj] == 0.0).sum())
        assert 0 < n_zero < len(ii), (
            "expected a sparse-but-not-empty zero set, got {}/{}"
            .format(n_zero, len(ii))
        )

        # iteration table carries the standard columns from the
        # proximal solver's metrics
        import pandas as pd

        table = pd.read_csv(prefix + "_iteration_table.csv")
        assert {"fx", "gnorm", "xnorm"} <= set(table.columns)
        assert len(table) > 0

    def test_explicit_lbfgs_with_lambda_group_fails_loudly(
            self, pipeline_dir, tmp_path):
        from evcouplings_tpu.utils.config import InvalidParameterError

        d, _, align_outcfg, _ = pipeline_dir
        kwargs = dict(COUPLINGS_KWARGS)
        kwargs.update(lambda_group=1.0, solver="lbfgs", iterations=5)
        with pytest.raises((ValueError, InvalidParameterError),
                           match="fista|smoothed"):
            couplings_protocol.run(
                protocol="standard",
                prefix=str(tmp_path / "g2" / "test"),
                alignment_file=align_outcfg["alignment_file"],
                focus_sequence=align_outcfg["focus_sequence"],
                segments=align_outcfg["segments"],
                frequencies_file=align_outcfg["frequencies_file"],
                **kwargs,
            )
