"""
Visualization layer tests: contact-map helpers (boundaries, ranges,
style scaling, coverage bars, secondary-structure cartoons), the
contact-map entry points, and pymol script writers. All rendering runs
on the matplotlib Agg backend.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.compare.distances import DistanceMap
from evcouplings_tpu.visualize.pairs import (
    STYLE_EC,
    STYLE_SECSTRUCT,
    complex_contact_map,
    ec_lines_pymol_script,
    enrichment_pymol_script,
    find_boundaries,
    find_secondary_structure_segments,
    plot_contact_map,
    plot_ec_coverage,
    plot_secondary_structure,
    plot_structure_coverage,
    scale,
    set_range,
)


def make_ecs(pairs):
    return pd.DataFrame(
        [(i, j, 1.0) for i, j in pairs], columns=["i", "j", "cn"]
    )


def make_distance_map(ids, cutoff_pattern=None):
    n = len(ids)
    residues = pd.DataFrame({
        "id": [str(x) for x in ids],
        "coord_id": [str(x) for x in ids],
    })
    mat = np.full((n, n), 10.0)
    np.fill_diagonal(mat, 0.0)
    if cutoff_pattern:
        for a, b in cutoff_pattern:
            mat[a, b] = mat[b, a] = 3.0
    return DistanceMap(residues, residues, mat, symmetric=True)


@pytest.fixture
def ax():
    fig, ax = plt.subplots()
    yield ax
    plt.close(fig)


class TestFindBoundaries:
    def setup_method(self):
        self.ecs = make_ecs([(5, 20), (7, 30)])
        self.dm = make_distance_map(range(10, 41))

    def test_union(self):
        (min_x, max_x), (min_y, max_y) = find_boundaries(
            "union", self.ecs, self.dm, None, symmetric=True
        )
        assert (min_x, max_x) == (5, 40)
        assert (min_y, max_y) == (5, 40)

    def test_intersection(self):
        (min_x, max_x), _ = find_boundaries(
            "intersection", self.ecs, self.dm, None, symmetric=True
        )
        assert (min_x, max_x) == (10, 30)

    def test_ecs_only(self):
        (min_x, max_x), _ = find_boundaries(
            "ecs", self.ecs, self.dm, None, symmetric=True
        )
        assert (min_x, max_x) == (5, 30)

    def test_structure_only(self):
        (min_x, max_x), _ = find_boundaries(
            "structure", self.ecs, self.dm, None, symmetric=True
        )
        assert (min_x, max_x) == (10, 40)

    def test_asymmetric_axes_differ(self):
        ecs = make_ecs([(5, 100), (8, 120)])
        (min_x, max_x), (min_y, max_y) = find_boundaries(
            "ecs", ecs, None, None, symmetric=False
        )
        assert (min_x, max_x) == (5, 8)
        assert (min_y, max_y) == (100, 120)

    def test_missing_structure_falls_back_to_ecs(self):
        (min_x, max_x), _ = find_boundaries(
            "intersection", self.ecs, None, None, symmetric=True
        )
        assert (min_x, max_x) == (5, 30)

    def test_manual_tuple_and_list(self):
        assert find_boundaries((1, 9), None, None, None, True) == (
            (1, 9), (1, 9)
        )
        assert find_boundaries(
            [(1, 9), (2, 8)], None, None, None, True
        ) == ((1, 9), (2, 8))

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            find_boundaries("bogus", self.ecs, None, None, True)
        with pytest.raises(ValueError):
            find_boundaries((1, 2, 3), None, None, None, True)


class TestSetRange:
    def test_from_pairs_symmetric(self, ax):
        x_range, y_range = set_range(
            pairs=make_ecs([(3, 40), (10, 25)]), symmetric=True, ax=ax
        )
        assert x_range == (3, 40)
        assert y_range == x_range
        assert ax.yaxis_inverted()

    def test_from_pairs_asymmetric_with_margin(self, ax):
        x_range, y_range = set_range(
            pairs=make_ecs([(3, 40), (10, 25)]), symmetric=False,
            ax=ax, margin=2, invert_y=False,
        )
        assert x_range == (1, 12)
        assert y_range == (23, 42)
        assert not ax.yaxis_inverted()

    def test_explicit_overrides(self, ax):
        x_range, y_range = set_range(
            pairs=make_ecs([(3, 40)]), x=(0, 100), y=(5, 50), ax=ax
        )
        assert x_range == (0, 100)
        assert y_range == (5, 50)

    def test_unspecified_raises(self, ax):
        with pytest.raises(ValueError):
            set_range(ax=ax)


class TestScale:
    def test_scales_s_and_width(self, ax):
        ax.set_xlim(0, 200)
        ax.set_ylim(0, 100)
        scaled = scale({"s": 80, "width": 1, "c": "k"}, ax=ax)
        assert scaled["s"] == pytest.approx(80 ** 2 / 200)
        assert scaled["width"] == pytest.approx(2.0)
        assert scaled["c"] == "k"

    def test_original_untouched(self, ax):
        style = {"s": 80}
        ax.set_xlim(0, 100)
        ax.set_ylim(0, 100)
        scale(style, ax=ax)
        assert style["s"] == 80


class TestCoverage:
    def test_ec_coverage_draws_segment_patches(self, ax):
        ax.set_xlim(0, 50)
        ax.set_ylim(50, 0)
        # positions 1-3 and 10-12: two segments per axis
        ecs = make_ecs([(1, 10), (2, 11), (3, 12)])
        plot_ec_coverage(ecs, symmetric=True, ax=ax)
        assert len(ax.patches) == 4

    def test_ec_coverage_asymmetric(self, ax):
        ax.set_xlim(0, 50)
        ax.set_ylim(50, 0)
        ecs = make_ecs([(1, 10), (2, 11), (3, 12)])
        plot_ec_coverage(ecs, symmetric=False, ax=ax)
        # one consecutive segment per axis
        assert len(ax.patches) == 2

    def test_structure_coverage_patches_and_background(self, ax):
        coverage = [
            ([(1, 10), (20, 30)], [(1, 10)], "1abc:A"),
            ([(5, 15)], [(5, 15)], "2xyz:B"),
        ]
        plot_structure_coverage(coverage, ax=ax)
        assert len(ax.patches) == 3
        # background takes the missing-coverage color
        assert ax.get_facecolor() != (1.0, 1.0, 1.0, 1.0)

    def test_structure_coverage_from_distance_map(self, ax):
        dm = make_distance_map(range(1, 6))
        cov = dm.structure_coverage()
        assert cov[0][0] == [(1, 5)]
        plot_structure_coverage(cov, ax=ax)
        assert len(ax.patches) == 1


class TestSecondaryStructurePlot:
    def test_from_dict(self, ax):
        ax.set_xlim(0, 20)
        ax.set_ylim(20, 0)
        sse = {i: "H" for i in range(2, 9)}
        sse.update({i: "E" for i in range(11, 16)})
        before = len(ax.lines) + len(ax.patches)
        plot_secondary_structure(sse, ax=ax, style=dict(STYLE_SECSTRUCT))
        after = len(ax.lines) + len(ax.patches)
        assert after > before

    def test_from_dataframe(self, ax):
        ax.set_xlim(0, 20)
        ax.set_ylim(20, 0)
        df = pd.DataFrame({
            "id": list(range(1, 15)),
            "sec_struct_3state": ["C"] * 3 + ["H"] * 6 + ["E"] * 5,
        })
        plot_secondary_structure(df, ax=ax, style=dict(STYLE_SECSTRUCT))
        assert len(ax.lines) + len(ax.patches) > 0

    def test_dataframe_without_column_is_noop(self, ax):
        ax.set_xlim(0, 20)
        ax.set_ylim(20, 0)
        df = pd.DataFrame({"id": [1, 2, 3]})
        plot_secondary_structure(df, ax=ax)
        assert len(ax.lines) + len(ax.patches) == 0

    def test_positions_outside_range_dropped(self, ax):
        ax.set_xlim(0, 10)
        ax.set_ylim(10, 0)
        sse = {i: "H" for i in range(100, 120)}
        plot_secondary_structure(sse, ax=ax)
        assert len(ax.lines) + len(ax.patches) == 0

    def test_segment_finder(self):
        start, end, segments = find_secondary_structure_segments(
            "HHHH--EEE", offset=5
        )
        assert (start, end) == (5, 13)
        # "-" (no data) stays a distinct state: the cartoon skips
        # those spans instead of drawing coil across numbering gaps
        # (reference behavior)
        assert segments == [
            ("H", 5, 8), ("-", 9, 10), ("E", 11, 13)
        ]


class TestContactMapEntryPoints:
    def test_plot_contact_map_with_structure(self, ax):
        dm = make_distance_map(range(1, 21), [(0, 5), (2, 9)])
        ecs = make_ecs([(1, 6), (3, 10), (2, 15)])
        plot_contact_map(ecs=ecs, monomer=dm, ax=ax)
        assert len(ax.collections) > 0

    def test_complex_contact_map(self, ax):
        intra1 = make_ecs([(1, 5), (2, 8)])
        intra2 = make_ecs([(3, 9)])
        inter = make_ecs([(1, 3), (5, 9)])
        complex_contact_map(
            intra1, intra2, inter,
            None, None, None, None, None, ax=ax,
        )
        assert len(ax.collections) > 0

    def test_boundaries_mode_is_honored(self, ax):
        """boundaries='intersection' must produce intersection
        extents, not silently fall back to union."""
        dm = make_distance_map(range(5, 26))          # structure 5..25
        ecs = make_ecs([(1, 10), (2, 15)])            # ecs 1..15
        plot_contact_map(
            ecs=ecs, monomer=dm, boundaries="intersection",
            margin=0, ax=ax,
        )
        x_lo, x_hi = sorted(ax.get_xlim())
        assert x_lo == pytest.approx(5)               # max(1, 5)
        assert x_hi == pytest.approx(15)              # min(15, 25)

    def test_invalid_boundaries_rejected(self, ax):
        with pytest.raises(ValueError, match="boundaries"):
            plot_contact_map(
                ecs=make_ecs([(1, 5)]), boundaries="bogus", ax=ax
            )

    def test_scale_sizes_shrinks_dots(self):
        """With scale_sizes, marker areas scale with 1/extent."""
        def dot_sizes(n_pos, scale_sizes):
            fig, ax = plt.subplots()
            try:
                ecs = make_ecs([(1, n_pos)])
                plot_contact_map(
                    ecs=ecs, scale_sizes=scale_sizes,
                    boundaries="ecs", ax=ax,
                )
                return ax.collections[0].get_sizes()[0]
            finally:
                plt.close(fig)

        assert dot_sizes(500, True) < dot_sizes(50, True)
        assert dot_sizes(500, False) == dot_sizes(50, False)

    def test_multimer_j_contacts_drawn(self):
        """d_multimer_j contacts must appear in the complex map, not
        just stretch its axes."""
        def n_collections(with_multimer_j):
            fig, ax = plt.subplots()
            try:
                dm2 = make_distance_map(range(1, 11), [(0, 5)])
                complex_contact_map(
                    make_ecs([(1, 5)]), make_ecs([(3, 9)]),
                    make_ecs([(1, 3)]),
                    None, None, None,
                    dm2 if with_multimer_j else None,
                    None, ax=ax,
                )
                return len(ax.collections)
            finally:
                plt.close(fig)

        assert n_collections(True) > n_collections(False)

    def test_secstruct_cartoon_respects_numbering_gaps(self, ax):
        """Residues 1-5 helix, then a gap, then 20-24 strand: the
        strand cartoon must be drawn at positions 20+, not appended
        directly after the helix."""
        ids = list(range(1, 6)) + list(range(20, 25))
        dm = make_distance_map(ids)
        dm.residues_i["sec_struct_3state"] = ["H"] * 5 + ["E"] * 5
        dm.residues_j = dm.residues_i
        plot_contact_map(
            ecs=make_ecs([(1, 24)]), monomer=dm, show_secstruct=True,
            ax=ax,
        )
        # cartoon patches must extend to x >= 20 (data coordinates)
        xs = [
            p.get_patch_transform().transform(
                p.get_path().vertices
            )[:, 0].max()
            for p in ax.patches
        ]
        assert xs and max(xs) >= 20


class TestMiscHelpers:
    def test_plot_context_and_chart_junk(self, ax):
        from evcouplings_tpu.visualize.misc import (
            plot_context, remove_chart_junk,
        )

        with plot_context("DejaVu Sans", size=10):
            ax.plot([1, 2], [3, 4])
        remove_chart_junk(ax=ax)
        assert not ax.spines["top"].get_visible()
        assert not ax.spines["right"].get_visible()
        assert ax.spines["left"].get_visible()

    def test_rgb2hex_and_colormap(self):
        from evcouplings_tpu.visualize.misc import colormap, rgb2hex

        assert rgb2hex(1.0, 0.0, 0.0) == "#ff0000"
        assert rgb2hex(0.0, 1.0, 0.0, 1.0).startswith("#00ff00")
        cm = colormap(0.0, 1.0)
        lo, hi = cm(0.0), cm(1.0)
        assert lo != hi and lo.startswith("#") and hi.startswith("#")

    def test_amino_acid_code_tables(self):
        from evcouplings_tpu.utils.constants import (
            AA1_to_AA3, AA3_to_AA1,
        )

        assert len(AA1_to_AA3) == 23          # 20 AA + B/Z/X
        assert AA1_to_AA3["W"] == "TRP"
        assert AA3_to_AA1["GLX"] == "Z"
        assert all(AA3_to_AA1[v] == k for k, v in AA1_to_AA3.items())


class TestPymolScripts:
    def test_ec_lines_script(self, tmp_path):
        out = tmp_path / "ecs.pml"
        ecs = make_ecs([(1, 5), (2, 8)])
        ecs["dist"] = [3.0, 8.0]
        ec_lines_pymol_script(ecs, str(out))
        text = out.read_text()
        assert "as cartoon" in text
        assert "green" in text and "red" in text

    def test_enrichment_script(self, tmp_path):
        out = tmp_path / "enrich.pml"
        table = pd.DataFrame({
            "i": range(1, 21),
            "enrichment": np.linspace(5, 0.1, 20),
        })
        enrichment_pymol_script(table, str(out))
        text = out.read_text()
        assert "set_color" in text
        assert "spheres" in text


class TestMutationMatrix:
    def _table(self):
        rows = []
        rng = np.random.default_rng(2)
        for pos in range(1, 7):
            for sub in "ACDE":
                rows.append({
                    "mutant": "K{}{}".format(pos, sub),
                    "pos": pos, "wt": "K", "subs": sub,
                    "prediction_epistatic": float(rng.normal()),
                })
        return pd.DataFrame(rows)

    def test_mpl_engine(self, ax):
        from evcouplings_tpu.visualize.mutations import (
            plot_mutation_matrix,
        )

        plot_mutation_matrix(
            self._table(), effect_column="prediction_epistatic",
            engine="mpl", ax=ax,
        )
        assert len(ax.collections) + len(ax.patches) > 0

    def test_mpl_reference_keywords(self, ax):
        """matrix_base_mpl accepts the reference's full keyword
        surface: label_filter drops position labels,
        colorbar_indicate_bounds marks the colorbar extremes, and
        secondary_structure(+style) draws the cartoon above the
        matrix."""
        import numpy as np

        from evcouplings_tpu.visualize.mutations import matrix_base_mpl

        rng = np.random.default_rng(0)
        matrix = rng.normal(size=(6, 4))
        out = matrix_base_mpl(
            matrix, positions=list(range(1, 7)),
            substitutions=list("ACDE"),
            wildtype_sequence="KKKKKK",
            secondary_structure="HHHEEC",
            conservation=rng.uniform(size=6),
            min_value=-2.0, max_value=2.0,
            colorbar_indicate_bounds=True,
            label_filter=lambda pos: pos % 2 == 0,
            secondary_structure_style={
                "width": 0.6, "line_width": 1,
                "strand_width_factor": 0.5,
                "helix_turn_length": 2, "min_sse_length": 1,
            },
            ax=ax,
        )
        labels = [t.get_text() for t in out.get_xticklabels()]
        # odd positions filtered to empty labels
        assert labels[0] == "" and labels[1] != ""
        # the cartoon extended the y range above the matrix by at
        # least the style's width plus clearance (y runs downward)
        assert out.get_ylim()[1] <= -(0.5 + 0.6)

    def test_bokeh_engine_gated(self):
        from evcouplings_tpu.visualize.mutations import (
            plot_mutation_matrix,
        )

        try:
            import bokeh

            # reference_shim installs an inert bokeh stub for the
            # parity tests; a real install has a version
            have_bokeh = getattr(bokeh, "__version__", None) is not None
        except ImportError:
            have_bokeh = False

        if have_bokeh:
            out = plot_mutation_matrix(
                self._table(),
                effect_column="prediction_epistatic", engine="bokeh",
            )
            assert out is not None
        else:
            with pytest.raises((ImportError, AttributeError)):
                plot_mutation_matrix(
                    self._table(),
                    effect_column="prediction_epistatic",
                    engine="bokeh",
                )

    def test_invalid_engine(self):
        from evcouplings_tpu.visualize.mutations import (
            plot_mutation_matrix,
        )

        with pytest.raises(ValueError, match="engine"):
            plot_mutation_matrix(self._table(), engine="nope")

    def test_pymol_script(self, tmp_path):
        from evcouplings_tpu.visualize.mutations import (
            mutation_pymol_script,
        )

        out = tmp_path / "mut.pml"
        mutation_pymol_script(self._table(), str(out))
        text = out.read_text()
        assert "as cartoon" in text
        assert "show spheres" in text

    def test_pymol_script_tolerates_nan_effects(self, tmp_path):
        """predict_mutation_table emits NaN for out-of-model
        mutations; the script writer must not crash on them (a
        whole-frame fillna would poison the numeric effect column
        with strings)."""
        from evcouplings_tpu.visualize.mutations import (
            mutation_pymol_script,
        )

        t = self._table()
        t.loc[t.index[:3], "prediction_epistatic"] = np.nan
        out = tmp_path / "mut_nan.pml"
        mutation_pymol_script(t, str(out))
        assert "as cartoon" in out.read_text()
