"""
EC pair-table layer tests: enrichment arithmetic, significance models on
synthetic mixtures, MAD scoring, and the logistic-regression rescorer
(validated against sklearn as an oracle, since the production path
evaluates the linear model natively).
"""

import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.couplings.pairs import (
    EVComplexScoreModel,
    LegacyScoreMixtureModel,
    LinearLogisticModel,
    LogisticRegressionScorer,
    ScoreMixtureModel,
    add_freqs_to_ec_table,
    add_mixture_probability,
    enrichment,
    mad_outlier_score,
    read_raw_ec_file,
)

RNG = np.random.default_rng(11)


def synthetic_ecs(L=30, seed=3):
    """EC-like table over positions 1..L with noise + planted signal."""
    rng = np.random.default_rng(seed)
    ii, jj = np.triu_indices(L, k=1)
    n = len(ii)
    cn = rng.normal(0.0, 0.05, size=n)
    # plant a positive lognormal tail on some long-range pairs
    tail = rng.permutation(np.flatnonzero(np.abs(ii - jj) >= 6))[:L]
    cn[tail] = np.exp(rng.normal(-0.5, 0.3, size=len(tail)))
    aa = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    return pd.DataFrame({
        "i": ii + 1,
        "A_i": aa[rng.integers(0, 20, n)],
        "j": jj + 1,
        "A_j": aa[rng.integers(0, 20, n)],
        "fn": cn * 1.1,
        "cn": cn,
    })


class TestRawEcFile:
    def test_roundtrip(self, tmp_path):
        ecs = synthetic_ecs()
        path = tmp_path / "x_ECs.txt"
        ecs.to_csv(path, sep=" ", index=False, header=False)

        loaded = read_raw_ec_file(str(path))
        assert list(loaded.columns) == ["i", "A_i", "j", "A_j", "fn", "cn"]
        # sorted descending by cn
        assert (np.diff(loaded.cn.values) <= 0).all()
        merged = loaded.sort_index()
        assert np.allclose(merged.cn.values, ecs.cn.values)


class TestEnrichment:
    def test_hand_computed(self):
        # 3 long-range pairs among positions 1, 10, 20, 30
        ecs = pd.DataFrame({
            "i": [1, 1, 10],
            "A_i": ["A", "A", "C"],
            "j": [10, 20, 30],
            "A_j": ["C", "D", "E"],
            "cn": [2.0, 1.0, 1.0],
        })
        e = enrichment(ecs, num_pairs=3, score="cn", min_seqdist=6)
        avg = (2.0 + 1.0 + 1.0) / 3
        expect = {1: 3.0 / avg, 10: 3.0 / avg, 20: 1.0 / avg, 30: 1.0 / avg}
        got = dict(zip(e.i, e.enrichment))
        assert got == pytest.approx(expect)
        # sorted descending
        assert (np.diff(e.enrichment.values) <= 0).all()

    def test_fractional_num_pairs(self):
        ecs = synthetic_ecs()
        e = enrichment(ecs, num_pairs=1.0)
        assert set(e.columns) == {"i", "A_i", "enrichment"}
        assert len(e) <= 2 * 30

    def test_min_seqdist_filter(self):
        ecs = pd.DataFrame({
            "i": [1, 2], "A_i": ["A", "A"],
            "j": [3, 20], "A_j": ["C", "D"],
            "cn": [5.0, 1.0],
        })
        e = enrichment(ecs, num_pairs=5, min_seqdist=6)
        # the short-range (1,3) pair must not contribute
        assert set(e.i) == {2, 20}


class TestMixtureModels:
    def test_skewnormal_separates_signal(self):
        noise = RNG.normal(0, 0.05, 2000)
        signal = np.exp(RNG.normal(-0.3, 0.25, 120))
        x = np.concatenate([noise, signal])

        mm = ScoreMixtureModel(x)
        p = mm.probability(x)
        assert p.shape == x.shape
        assert np.all((p >= 0) & (p <= 1))
        # strong scores confidently in tail, negative scores at zero
        assert p[x > 1.0].mean() > 0.9
        assert np.all(p[x <= 0] == 0)

    def test_legacy_model(self):
        noise = RNG.normal(0, 0.05, 2000)
        signal = np.exp(RNG.normal(-0.3, 0.25, 150))
        x = np.concatenate([noise, signal])

        mm = LegacyScoreMixtureModel(x)
        p = mm.probability(x)
        assert p[x > 1.0].mean() > 0.9

    def test_skewnorm_constraint_zero_mean(self):
        # location chosen so the skew normal has mean 0
        scale, skew = 0.7, 2.0
        loc = ScoreMixtureModel.skewnorm_constraint(scale, skew)
        xs = np.linspace(-6, 6, 200001)
        pdf = ScoreMixtureModel.skewnorm_pdf(xs, loc, scale, skew)
        mean = np.trapezoid(xs * pdf, xs)
        assert abs(mean) < 1e-6

    def test_evcomplex_model(self):
        x = np.array([-0.5, 0.25, 1.0, 2.0])
        mm = EVComplexScoreModel(x)
        assert mm.probability(x) == pytest.approx(x / 0.5)

    def test_add_mixture_probability(self):
        ecs = synthetic_ecs()
        out = add_mixture_probability(ecs, model="evcomplex")
        assert "probability" in out.columns
        assert out.probability.values == pytest.approx(
            ecs.cn.values / abs(ecs.cn.min())
        )
        with pytest.raises(ValueError):
            add_mixture_probability(ecs, model="bogus")


class TestMadScore:
    def test_robust_zscore(self):
        x = RNG.normal(3.0, 2.0, 5000)
        z = mad_outlier_score(x)
        # median-centered, MAD-scaled => approx standard normal
        assert abs(np.median(z)) < 1e-12
        assert np.std(z) == pytest.approx(1.0, abs=0.1)


def make_freqs_table(L=30, seed=5):
    """Frequencies table in the align-stage _frequencies.csv shape."""
    rng = np.random.default_rng(seed)
    aa = list("ACDEFGHIKLMNPQRSTVWY")
    f = rng.dirichlet(np.ones(21), size=L)
    table = pd.DataFrame(f, columns=["-"] + aa)
    table.insert(0, "i", np.arange(1, L + 1))
    table.insert(1, "A_i", [aa[k] for k in rng.integers(0, 20, L)])
    table["conservation"] = 1 - (
        -np.sum(f * np.log2(f), axis=1) / np.log2(21)
    )
    return table


class TestLogisticRegressionScorer:
    def test_linear_model_matches_sklearn(self):
        from sklearn.linear_model import LogisticRegression

        rng = np.random.default_rng(0)
        X = rng.normal(size=(200, 8))
        y = (X @ rng.normal(size=8) + 0.3 > 0).astype(int)
        sk = LogisticRegression().fit(X, y)

        ours = LinearLogisticModel(sk.coef_, sk.intercept_)
        assert ours.decision_function(X) == pytest.approx(
            sk.decision_function(X)
        )
        assert ours.predict_proba_true(X) == pytest.approx(
            sk.predict_proba(X)[:, 1]
        )

    def test_dict_roundtrip(self):
        m = LinearLogisticModel(np.arange(8.0), [0.5])
        d = m.to_dict(feature_names=list("abcdefgh"))
        m2, names = LinearLogisticModel.from_dict(d)
        assert names == list("abcdefgh")
        assert m2.coef == pytest.approx(m.coef)
        assert m2.intercept == m.intercept

    def test_shipped_model_scores(self):
        ecs = synthetic_ecs()
        freqs = make_freqs_table()
        # use residues that actually exist in the freq table join keys
        ecs = ecs.merge(
            freqs[["i", "A_i"]], on="i", suffixes=("_drop", "")
        ).drop(columns="A_i_drop")
        freqs_j = freqs.rename(columns={"i": "j", "A_i": "A_j"})
        ecs = ecs.merge(
            freqs_j[["j", "A_j"]], on="j", suffixes=("_drop", "")
        ).drop(columns="A_j_drop")

        scorer = LogisticRegressionScorer()
        out = scorer.score(
            ecs, freqs, theta=0.8, effective_sequences=3000, num_sites=30
        )
        assert {"probability", "score", "mad_score"} <= set(out.columns)
        assert np.all((out.probability.values >= 0)
                      & (out.probability.values <= 1))
        assert (np.diff(out.score.values) <= 1e-12).all()

    def test_low_neff_fallback(self):
        ecs = synthetic_ecs()
        scorer = LogisticRegressionScorer()
        out = scorer.score(
            ecs, None, theta=0.8, effective_sequences=1.0, num_sites=30
        )
        assert (out.probability == 0).all()
        assert out.score.values == pytest.approx(ecs.cn.values)


class TestAddFreqs:
    def test_merge_columns(self):
        freqs = make_freqs_table(L=10)
        ecs = pd.DataFrame({
            "i": [1, 2], "A_i": freqs.A_i.values[[0, 1]],
            "j": [5, 9], "A_j": freqs.A_i.values[[4, 8]],
            "cn": [1.0, 2.0],
        })
        out = add_freqs_to_ec_table(ecs, freqs)
        for c in ("freq_i", "gap_i", "cons_i", "freq_j", "gap_j", "cons_j"):
            assert c in out.columns
        # freq_i is the frequency of the target residue at that position
        row = freqs.iloc[0]
        assert out.freq_i.iloc[0] == pytest.approx(row[row["A_i"]])


def test_linear_logistic_model_round_trips_n_iter():
    """serialize(deserialize(d)) must preserve the reference schema's
    sklearn training metadata (round-3 review: n_iter_ was read from
    the wrong place and silently reset to [0])."""
    from evcouplings_tpu.couplings.pairs import LinearLogisticModel

    params = {
        "classifier_settings": {"C": 1.0, "penalty": "l2"},
        "model_settings": {
            "classes_": [0, 1],
            "intercept_": [0.5],
            "coef_": [[1.0, -2.0]],
            "n_iter_": [37],
        },
        "feature_names": ["a", "b"],
    }
    model, feats = LinearLogisticModel.from_dict(params)
    out = model.to_dict(feature_names=feats)
    assert out["model_settings"]["n_iter_"] == [37]
    assert out["model_settings"]["coef_"] == [[1.0, -2.0]]
    assert out["feature_names"] == ["a", "b"]


class TestScoringGuards:
    """Loud-failure guards added after self-review: silently-NaN or
    silently-truncated scoring paths must raise instead."""

    def test_mixture_model_requires_positive_scores(self):
        import pytest

        from evcouplings_tpu.couplings.pairs import ScoreMixtureModel

        with pytest.raises(ValueError, match="positive score"):
            ScoreMixtureModel(np.array([]))
        with pytest.raises(ValueError, match="positive score"):
            ScoreMixtureModel(np.array([-1.0, -0.5, 0.0]))

    def test_enrichment_requires_longrange_pairs(self):
        import pytest

        from evcouplings_tpu.couplings.pairs import enrichment

        ecs = pd.DataFrame({
            "i": [1, 2], "A_i": ["A", "C"],
            "j": [2, 3], "A_j": ["C", "D"],
            "cn": [0.5, 0.4],
        })
        with pytest.raises(ValueError, match="separation"):
            enrichment(ecs, min_seqdist=6)

    def test_multiclass_logistic_model_rejected(self):
        import pytest

        from evcouplings_tpu.couplings.pairs import LinearLogisticModel

        with pytest.raises(ValueError, match="binary"):
            LinearLogisticModel(
                coef=[[1.0, 2.0], [0.5, 0.1], [0.2, 0.3]],
                intercept=[0.1, 0.2, 0.3],
                classes=(0, 1, 2),
            )

    def test_missing_model_feature_raises_not_nan(self, tmp_path):
        import pytest
        import yaml

        from evcouplings_tpu.couplings.pairs import (
            LogisticRegressionScorer,
        )

        # load the shipped model, corrupt one feature name
        scorer = LogisticRegressionScorer()
        params = scorer.classifier.to_dict(
            feature_names=list(scorer.feature_names)
        )
        params["feature_names"][0] = "no_such_feature"
        bad = tmp_path / "bad_model.yml"
        bad.write_text(yaml.safe_dump(params))
        bad_scorer = LogisticRegressionScorer(str(bad))

        L = 8
        ii, jj = np.triu_indices(L, k=1)
        rng = np.random.default_rng(0)
        ecs = pd.DataFrame({
            "i": ii + 1, "A_i": "A", "j": jj + 1, "A_j": "A",
            "cn": rng.normal(size=len(ii)),
        })
        freqs = pd.DataFrame({
            "i": np.arange(1, L + 1), "A_i": "A",
            "A": 0.3, "C": 0.2, "-": 0.1,
            "conservation": 0.5,
        })
        with pytest.raises(ValueError, match="no_such_feature"):
            bad_scorer.score(
                ecs, freqs=freqs, theta=0.8,
                effective_sequences=1000.0, num_sites=L,
            )

    def test_sigmoid_stable_for_extreme_decisions(self):
        from evcouplings_tpu.couplings.pairs import LinearLogisticModel

        m = LinearLogisticModel(coef=[1.0], intercept=0.0)
        with np.errstate(over="raise"):
            p = m.predict_proba_true(np.array([[-1e4], [1e4]]))
        assert p[0] == 0.0 and p[1] == 1.0


def test_score_mixture_em_survives_degenerate_data():
    """Near-singular score distributions (a point mass plus extreme
    outliers) collapse the skew-normal scale and cascaded NaN through
    the reference's EM (pairs.py:541-613 has no guard); the fit must
    stop at the last healthy iterate and return finite parameters and
    in-range probabilities instead."""
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 0.02, 2000), [5.0, 8.0, 1e4]])

    m = ScoreMixtureModel(x)
    assert np.all(np.isfinite(m.params))

    p = m.probability(np.array([0.0, 0.05, 5.0, 1e4]))
    assert np.all(np.isfinite(p))
    assert np.all((0 <= p) & (p <= 1))
