"""
Tests for the plmc-compatibility module (couplings/tools.py): stderr
log parsing on a representative plmc log, and run_plmc delegating to
the native fitter with the reference's signature. Also covers the
logreg classifier dict round-trip helpers.
"""

import numpy as np
import pytest

from evcouplings_tpu.couplings.pairs import (
    LinearLogisticModel,
    logreg_classifier_from_dict,
    logreg_classifier_to_dict,
)
from evcouplings_tpu.couplings.tools import (
    PlmcResult,
    parse_plmc_log,
    run_plmc,
)

PLMC_LOG = """\
Found focus RASH_HUMAN as sequence 1
Region starts at 5
10430 valid sequences out of 10884
160 sites out of 166
Effective number of samples: 2182.2
iter          fx          -loglk    ||h||     ||e||    ||gh||    ||ge||
1     684564.0      684564.0    0.0    0.0    1374.7    7125.9
2     673245.5      673107.1    3.2    11.8    1101.2    5807.4
3     651024.8      650340.9    7.9    44.1    801.5    4311.0
Gradient optimization: Success
"""


class TestParsePlmcLog:
    def test_focus_mode_log(self):
        iter_df, stats = parse_plmc_log(PLMC_LOG)
        (focus_index, valid_seqs, total_seqs, valid_sites,
         total_sites, region_start, eff_samples, opt_status) = stats

        assert focus_index == 1
        assert (valid_seqs, total_seqs) == (10430, 10884)
        assert (valid_sites, total_sites) == (160, 166)
        assert region_start == 5
        assert eff_samples == pytest.approx(2182.2)
        assert opt_status == "Success"

        assert list(iter_df.columns) == [
            "iter", "fx", "-loglk", "||h||", "||e||", "||gh||", "||ge||"
        ]
        assert len(iter_df) == 3
        assert float(iter_df.iloc[1]["fx"]) == pytest.approx(673245.5)

    def test_non_focus_log_defaults(self):
        log = (
            "500 valid sequences out of 600\n"
            "Effective number of samples: 123.4\n"
            "Gradient optimization: Max iterations reached\n"
        )
        _, stats = parse_plmc_log(log)
        focus_index, valid_seqs, total_seqs = stats[:3]
        valid_sites, total_sites, region_start = stats[3:6]
        assert focus_index is None
        assert (valid_seqs, total_seqs) == (500, 600)
        assert valid_sites is None and total_sites is None
        assert region_start == 1
        assert stats[7] == "Max iterations reached"

    def test_incomplete_log_raises(self):
        with pytest.raises(KeyError):
            parse_plmc_log("not a plmc log at all")


class TestRunPlmcCompat:
    def test_fits_natively_with_reference_signature(self, tmp_path):
        rng = np.random.default_rng(0)
        alpha = "ACDEFGHIKLMNPQRSTVWY"
        N, L = 40, 8
        msa = tmp_path / "msa.fasta"
        with open(msa, "w") as f:
            for i in range(N):
                f.write(">s{}/1-{}\n".format(i, L))
                f.write("".join(rng.choice(list(alpha), L)) + "\n")

        couplings_file = tmp_path / "out" / "ECs.txt"
        param_file = tmp_path / "out" / "model.model"

        result = run_plmc(
            str(msa), str(couplings_file), param_file=str(param_file),
            focus_seq="s0/1-{}".format(L), theta=0.8, iterations=10,
            lambda_h=0.01, lambda_J=16.0,
            # plmc-only flags must be accepted and ignored
            cpu=32, binary="/nonexistent/plmc",
        )

        assert isinstance(result, PlmcResult)
        assert result.couplings_file == str(couplings_file)
        assert result.num_valid_seqs == N
        assert result.num_valid_sites == L
        assert couplings_file.exists()
        assert param_file.exists()

        ecs = np.loadtxt(couplings_file, dtype=str)
        assert len(ecs) == L * (L - 1) // 2


class TestPrepareAlignmentNumbering:
    def test_gapped_focus_row_does_not_consume_numbering(self, tmp_path):
        """plmc focus numbering advances along the focus SEQUENCE:
        columns where the focus row has a gap (or insert columns,
        lowercase) must not shift downstream residue indices."""
        from evcouplings_tpu.couplings.fitter import prepare_alignment

        msa = tmp_path / "gapped.fasta"
        # focus row: A C - D e F  -> focus cols 0,1,3,5 (uppercase,
        # non-gap); residues consume numbers 7,8 / (gap skips) 9 /
        # (lowercase insert consumes) 10 / 11
        with open(msa, "w") as f:
            f.write(">T/7-11\nAC-DeF\n")
            f.write(">s1/1-6\nACWDEF\n")
        prep = prepare_alignment(str(msa), focus_seq="T/7-11")
        assert prep["num_valid_sites"] == 4
        assert list(prep["index_list"]) == [7, 8, 9, 11]
        assert "".join(prep["target_seq"]) == "ACDF"


class TestLogregSerialization:
    def test_round_trip(self):
        model = LinearLogisticModel(
            coef=[0.5, -1.2, 3.0], intercept=0.25,
        )
        params = logreg_classifier_to_dict(
            model, feature_names=["a", "b", "c"]
        )
        assert params["feature_names"] == ["a", "b", "c"]
        assert params["model_settings"]["coef_"] == [[0.5, -1.2, 3.0]]

        restored, names = logreg_classifier_from_dict(params)
        assert names == ["a", "b", "c"]
        X = np.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(
            restored.decision_function(X), model.decision_function(X)
        )

    def test_sklearn_style_object(self):
        class FakeSklearn:
            classes_ = np.array([0, 1])
            intercept_ = np.array([0.1])
            coef_ = np.array([[1.0, 2.0]])
            n_iter_ = np.array([7])

            def get_params(self):
                return {"C": 1.0}

        params = logreg_classifier_to_dict(FakeSklearn())
        assert params["classifier_settings"] == {"C": 1.0}
        restored, _ = logreg_classifier_from_dict(params)
        np.testing.assert_allclose(restored.coef, [1.0, 2.0])
