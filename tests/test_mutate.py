"""
Mutation-effect calculation tests: mutation-string parsing, table
predictions vs direct kernel calls (incl. NaN handling and segment
lookups), the single-mutant matrix, and mutant splitting.
"""

import numpy as np
import pandas as pd
import pytest

from test_model import make_model

from evcouplings_tpu.mutate import (
    extract_mutations,
    predict_mutation_table,
    single_mutant_matrix,
    split_mutants,
)


class TestExtractMutations:
    def test_single(self):
        assert extract_mutations("K50R") == [(50, "K", "R")]

    def test_multiple_with_offset(self):
        assert extract_mutations("K50R,I100V", offset=2) == [
            (52, "K", "R"), (102, "I", "V")
        ]

    def test_wildtype_spellings(self):
        for s in ("wt", "WT", "wild", ""):
            assert extract_mutations(s) == []


class TestPredictMutationTable:
    def test_matches_model_deltas(self):
        m = make_model()  # positions 5..12
        wt = {pos: m.seq(pos) for pos in m.index_list}
        muts = [
            "{}5A".format(wt[5]),
            "{}7C,{}10W".format(wt[7], wt[10]),
            "wt",
        ]
        table = pd.DataFrame({"mutant": muts})
        pred = predict_mutation_table(m, table)

        exp0 = m.delta_hamiltonian([(5, wt[5], "A")])[0]
        exp1 = m.delta_hamiltonian([(7, wt[7], "C"), (10, wt[10], "W")])[0]
        assert pred.prediction_epistatic.iloc[0] == pytest.approx(exp0)
        assert pred.prediction_epistatic.iloc[1] == pytest.approx(exp1)
        # wild type: empty substitution list => delta 0
        assert pred.prediction_epistatic.iloc[2] == pytest.approx(0.0)

    def test_components(self):
        m = make_model()
        wt5 = m.seq(5)
        table = pd.DataFrame({"mutant": ["{}5A".format(wt5)]})
        full = predict_mutation_table(m, table, hamiltonian="full")
        coup = predict_mutation_table(m, table, hamiltonian="couplings")
        fields = predict_mutation_table(m, table, hamiltonian="fields")
        assert full.prediction_epistatic.iloc[0] == pytest.approx(
            coup.prediction_epistatic.iloc[0]
            + fields.prediction_epistatic.iloc[0]
        )
        with pytest.raises(ValueError):
            predict_mutation_table(m, table, hamiltonian="bogus")

    def test_invalid_mutations_get_nan(self):
        m = make_model()
        table = pd.DataFrame({"mutant": [
            "A999C",                       # position not in model
            "{}5J".format(m.seq(5)),       # J not in alphabet
        ]})
        pred = predict_mutation_table(m, table)
        assert pred.prediction_epistatic.isna().all()

    def test_index_as_mutant_source(self):
        m = make_model()
        wt5 = m.seq(5)
        table = pd.DataFrame(
            {"x": [1.0]}, index=["{}5A".format(wt5)]
        )
        pred = predict_mutation_table(m, table, mutant_column=None)
        assert pred.prediction_epistatic.iloc[0] == pytest.approx(
            m.delta_hamiltonian([(5, wt5, "A")])[0]
        )


class TestSingleMutantMatrix:
    def test_layout_and_values(self):
        m = make_model()
        smm_table = single_mutant_matrix(m)
        # L positions x (20 non-gap symbols - 1 self) per position
        assert len(smm_table) == 8 * 19
        assert list(smm_table.columns) == [
            "segment", "mutant", "pos", "wt", "subs", "frequency",
            "column_conservation", "prediction_epistatic",
        ]
        row = smm_table.iloc[0]
        assert row.prediction_epistatic == pytest.approx(
            m.smm(row.pos, row.subs)
        )
        assert row.frequency == pytest.approx(m.fi(row.pos, row.subs))
        assert row.mutant == "{}{}{}".format(row.wt, row.pos, row.subs)
        # no gap or self substitutions
        assert not (smm_table.subs == "-").any()
        assert not (smm_table.wt == smm_table.subs).any()

    def test_include_self_subs(self):
        m = make_model()
        t = single_mutant_matrix(m, exclude_self_subs=False)
        assert len(t) == 8 * 20
        self_rows = t[t.wt == t.subs]
        assert self_rows.prediction_epistatic.values == pytest.approx(
            np.zeros(len(self_rows))
        )


class TestSplitMutants:
    def test_single_and_double(self):
        x = pd.DataFrame({"mutant": ["K50R", "I100V,K120R"]})
        out = split_mutants(x)
        assert list(out.num_mutations) == [1, 2]
        assert out.pos.iloc[0] == "50"
        assert out.pos.iloc[1] == "100,120"
        assert out.wt.iloc[1] == "I,K"
        assert out.subs.iloc[1] == "V,R"


def test_predict_mutation_table_wildtype_row_with_segments():
    """DMS datasets carry wild-type reference rows ('wt'/'wild'/'');
    with a filled segment column those rows have zero mutations and
    must score Delta-E = 0, not crash the segment/mutation length
    check (round-3 review; the reference reaches the same outcome
    because its zip silently truncates)."""
    from evcouplings_tpu.couplings.mapping import (
        Segment, SegmentIndexMapper,
    )

    m = make_model()  # positions 5..12
    seg = Segment("aa", "TGT", 1, m.L, list(m.index_list))
    seg.segment_id = "A_1"
    mapper = SegmentIndexMapper(True, int(m.index_list[0]), seg)
    mapper.patch_model(m)

    (seg_id, pos) = m.index_list[0]
    aa_from = m.seq((seg_id, pos))
    aa_to = next(
        a for a in m.alphabet if a not in (aa_from, "-")
    )
    table = pd.DataFrame({
        "mutant": ["wt", "{}{}{}".format(aa_from, pos, aa_to)],
        "segment": [seg_id, seg_id],
    })
    out = predict_mutation_table(m, table, mutant_column="mutant")
    assert out.prediction_epistatic.iloc[0] == pytest.approx(0.0)
    assert np.isfinite(out.prediction_epistatic.iloc[1])


def test_split_mutants_tolerates_unparseable_strings():
    """A malformed mutant string must produce NaN columns for that
    row, not crash the whole split (the fallback existed but was dead
    code before round 3)."""
    from evcouplings_tpu.mutate.calculations import split_mutants

    df = pd.DataFrame({"mutant": ["A10V", "K50fs", "A10V,K12R"]})
    out = split_mutants(df, "mutant")
    assert out.num_mutations.iloc[0] == 1
    assert np.isnan(out.num_mutations.iloc[1])
    assert out.num_mutations.iloc[2] == 2
    assert out.pos.iloc[2] == "10,12"


def test_plot_models_degrades_on_broken_bokeh(tmp_path, monkeypatch):
    """A bokeh package that imports but lacks the plotting surface
    (e.g. a namespace stub, or a partially broken install) must
    degrade to the static matplotlib artifact instead of crashing the
    mutate stage with AttributeError."""
    import sys
    import types

    import matplotlib
    matplotlib.use("Agg")

    from evcouplings_tpu.mutate import protocol as mutate_protocol
    from evcouplings_tpu.mutate.calculations import single_mutant_matrix
    from test_model import make_model

    # inert bokeh: bokeh.io imports fine, bokeh.plotting has no figure
    for name in ("bokeh", "bokeh.io", "bokeh.plotting", "bokeh.models"):
        monkeypatch.setitem(sys.modules, name, types.ModuleType(name))
    sys.modules["bokeh.io"].output_file = lambda *a, **k: None
    sys.modules["bokeh.io"].save = lambda *a, **k: None

    model = make_model()
    singles = single_mutant_matrix(model)
    outcfg = {"mutation_matrix_plot_files": []}
    prefix = str(tmp_path / "mut")
    mutate_protocol._plot_models(
        [(singles, "Epistatic")], prefix, outcfg
    )

    # only the pdf artifact; no html, no exception
    assert outcfg["mutation_matrix_plot_files"] == [
        prefix + "_epistatic_model.pdf"
    ]
