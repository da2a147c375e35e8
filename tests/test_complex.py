"""
Complex (EVcomplex pairing) layer tests: concatenated alignment
writing, genome-distance matching (vectorized vs literal oracle),
best-hit pairing, and the concatenate -> couplings complex slice.
"""

import os

import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.align.alignment import Alignment
from evcouplings_tpu.complex import protocol as complex_protocol
from evcouplings_tpu.complex.alignment import write_concatenated_alignment
from evcouplings_tpu.complex.distance import (
    best_reciprocal_matching,
    find_possible_partners,
    get_distance,
)
from evcouplings_tpu.complex.similarity import (
    most_similar_by_organism,
    read_species_annotation_table,
)

RNG = np.random.default_rng(31)
AA = np.array(list("ACDEFGHIKLMNPQRSTVWY"))


def write_monomer(path, ids, L=8, seed=0, target="TGT/1-8"):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        mat = {}
        for name in [target] + ids:
            seq = "".join(rng.choice(AA, size=L))
            f.write(">{}\n{}\n".format(name, seq))
            mat[name] = seq
    return mat


class TestConcatenatedAlignment:
    def test_pairing_and_header(self, tmp_path):
        a1 = str(tmp_path / "a1.fasta")
        a2 = str(tmp_path / "a2.fasta")
        write_monomer(a1, ["s1/1-8", "s2/1-8"], target="T1/1-8", seed=1)
        write_monomer(a2, ["x1/1-8", "x2/1-8"], target="T2/1-8", seed=2)

        pairing = pd.DataFrame({
            "id_1": ["s1/1-8", "s2/1-8"],
            "id_2": ["x2/1-8", "x1/1-8"],
        })
        header, idx, full, m1, m2 = write_concatenated_alignment(
            pairing, a1, a2, "T1/1-8", "T2/1-8"
        )
        assert header == "T1_T2/1-16"
        assert idx == 0
        assert full.N == 3 and full.L == 16
        assert m1.N == 3 and m1.L == 8
        # paired row is the concatenation of its monomer rows
        assert "".join(full.matrix[1]) == (
            "".join(m1.matrix[1]) + "".join(m2.matrix[1])
        )
        assert full.ids[1] == "s1/1-8_x2/1-8"

    def test_lowercase_uppercased(self, tmp_path):
        a1 = str(tmp_path / "a1.fasta")
        a2 = str(tmp_path / "a2.fasta")
        with open(a1, "w") as f:
            f.write(">T1/1-4\nACDe\n>s1\nac.E\n")
        with open(a2, "w") as f:
            f.write(">T2/1-4\nWYFK\n>x1\nwy-k\n")
        pairing = pd.DataFrame({"id_1": ["s1"], "id_2": ["x1"]})
        _, _, full, _, _ = write_concatenated_alignment(
            pairing, a1, a2, "T1/1-4", "T2/1-4"
        )
        assert "".join(full.matrix[1]) == "AC-EWY-K"


class TestGenomeDistance:
    def make_tables(self):
        t1 = pd.DataFrame({
            "cds": ["c1", "c2", "c3"],
            "genome_id": ["g1", "g1", "g2"],
            "uniprot_ac": ["P1", "P2", "P3"],
            "gene_start": [100, 5000, 100],
            "gene_end": [400, 5300, 500],
            "full_id": ["A1", "A2", "A3"],
        })
        t2 = pd.DataFrame({
            "cds": ["d1", "d2", "d3"],
            "genome_id": ["g1", "g1", "g3"],
            "uniprot_ac": ["Q1", "Q2", "Q3"],
            "gene_start": [600, 5400, 100],
            "gene_end": [900, 5600, 200],
            "full_id": ["B1", "B2", "B3"],
        })
        return t1, t2

    def test_get_distance(self):
        assert get_distance((100, 400), (600, 900)) == 200
        assert get_distance((600, 900), (100, 400)) == 200
        assert get_distance((100, 500), (400, 900)) == 0
        # unsorted intervals
        assert get_distance((400, 100), (900, 600)) == 200

    def test_find_possible_partners_matches_oracle(self):
        t1, t2 = self.make_tables()
        partners = find_possible_partners(t1.copy(), t2.copy())
        # only genome g1 is shared: 2 x 2 pairs
        assert len(partners) == 4

        lookup = {
            (r.uniprot_id_1, r.uniprot_id_2): r.distance
            for r in partners.itertuples()
        }
        for _, r1 in t1.iterrows():
            for _, r2 in t2.iterrows():
                if r1.genome_id != r2.genome_id:
                    assert (r1.full_id, r2.full_id) not in lookup
                else:
                    expected = get_distance(
                        (r1.gene_start, r1.gene_end),
                        (r2.gene_start, r2.gene_end),
                    )
                    assert lookup[(r1.full_id, r2.full_id)] == expected

    def test_best_reciprocal_matching(self):
        t1, t2 = self.make_tables()
        partners = find_possible_partners(t1.copy(), t2.copy())
        pairing = best_reciprocal_matching(partners)
        pairs = set(zip(pairing.uniprot_id_1, pairing.uniprot_id_2))
        # A1 (100-400) <-> B1 (600-900), A2 (5000-5300) <-> B2 (5400-5600)
        assert pairs == {("A1", "B1"), ("A2", "B2")}


class TestSpeciesSimilarity:
    def test_annotation_and_best_hit(self, tmp_path):
        anno = tmp_path / "anno.csv"
        pd.DataFrame({
            "id": ["a", "b", "c", "d"],
            "name": ["na", "nb", "nc", "nd"],
            "OS": ["Homo sapiens", "Homo sapiens", "E. coli", None],
        }).to_csv(anno, index=False)

        table = read_species_annotation_table(str(anno))
        assert list(table.columns) == ["id", "name", "species"]
        assert table.species.iloc[0] == "Homo sapiens"

        similarities = pd.DataFrame({
            "id": ["a", "b", "c", "d"],
            "identity_to_query": [0.9, 0.5, 0.7, 0.3],
        })
        best = most_similar_by_organism(similarities, table)
        by_species = dict(zip(best.species, best.id))
        assert by_species["Homo sapiens"] == "a"
        assert by_species["E. coli"] == "c"


MODIFY_KWARGS = dict(
    seqid_filter=None,
    hhfilter=None,
    minimum_sequence_coverage=0,
    minimum_column_coverage=0,
    compute_num_effective_seqs=False,
    theta=0.8,
)


class TestBestHitProtocol:
    def test_concatenate_best_hit(self, tmp_path):
        """best_hit pairing on two synthetic monomer alignments with
        overlapping species annotations."""
        prefix = str(tmp_path / "concat" / "job")
        L = 8
        ids_1 = ["a{}/1-8".format(i) for i in range(4)]
        ids_2 = ["b{}/1-8".format(i) for i in range(4)]
        a1 = str(tmp_path / "a1.fasta")
        a2 = str(tmp_path / "a2.fasta")
        write_monomer(a1, ids_1, L=L, seed=3, target="T1/1-8")
        write_monomer(a2, ids_2, L=L, seed=4, target="T2/1-8")

        species = ["SpA", "SpB", "SpC", "SpD"]
        for path, ids in [
            (tmp_path / "anno1.csv", ["T1/1-8"] + ids_1),
            (tmp_path / "anno2.csv", ["T2/1-8"] + ids_2),
        ]:
            pd.DataFrame({
                "id": ids,
                "name": ids,
                "OS": ["Query"] + species,
            }).to_csv(path, index=False)

        for path, ids in [
            (tmp_path / "id1.csv", ["T1/1-8"] + ids_1),
            (tmp_path / "id2.csv", ["T2/1-8"] + ids_2),
        ]:
            pd.DataFrame({
                "id": ids,
                "identity_to_query": [1.0, 0.9, 0.8, 0.7, 0.6],
            }).to_csv(path, index=False)

        seg1 = ["aa", "aa", "T1", 1, 8, list(range(1, 9))]
        seg2 = ["aa", "aa", "T2", 1, 8, list(range(1, 9))]

        outcfg = complex_protocol.run(
            protocol="best_hit",
            prefix=prefix,
            first_alignment_file=a1,
            second_alignment_file=a2,
            first_focus_sequence="T1/1-8",
            second_focus_sequence="T2/1-8",
            first_focus_mode=True,
            second_focus_mode=True,
            first_region_start=1,
            second_region_start=1,
            first_segments=[seg1],
            second_segments=[seg2],
            first_identities_file=str(tmp_path / "id1.csv"),
            second_identities_file=str(tmp_path / "id2.csv"),
            first_annotation_file=str(tmp_path / "anno1.csv"),
            second_annotation_file=str(tmp_path / "anno2.csv"),
            use_best_reciprocal=False,
            paralog_identity_threshold=0.95,
            **MODIFY_KWARGS,
        )

        assert outcfg["focus_sequence"] == "T1_T2/1-16"
        assert os.path.isfile(outcfg["alignment_file"])
        assert os.path.isfile(outcfg["concatentation_statistics_file"])

        # segments renamed A_1 / B_1
        seg_ids = [s[0] for s in outcfg["segments"]]
        assert seg_ids == ["A_1", "B_1"]

        # concatenated alignment: target row + 5 paired species (incl. Query)
        with open(outcfg["raw_alignment_file"]) as f:
            ali = Alignment.from_file(f)
        assert ali.N == 6
        assert ali.L == 16

        stats = pd.read_csv(outcfg["concatentation_statistics_file"])
        assert stats.num_species_overlap.iloc[0] == 5  # incl. Query


class TestComplexCouplingsEndToEnd:
    """Full complex slice: two synthetic monomer alignments with planted
    inter-protein covariation -> best_hit concatenation -> couplings
    `complex` protocol -> inter-EC recovery (reference stage chain
    evcouplings/complex/protocol.py -> couplings/protocol.py:complex)."""

    N = 140
    L = 10
    # (col in monomer 1, col in monomer 2, concordance), 0-based
    INTER_PLANTED = [
        (3, 6, 0.90),
        (7, 2, 0.78),
        (0, 9, 0.68),
    ]
    # (col_i, col_j, concordance) within each monomer; columns are
    # disjoint from the inter-planted columns of the same monomer
    INTRA_PLANTED_1 = (1, 8, 0.85)
    INTRA_PLANTED_2 = (1, 5, 0.80)

    def _make_monomers(self, tmp_path):
        rng = np.random.default_rng(11)
        aa20 = np.array(list("ACDEFGHIKLMNPQRSTVWY"))

        def random_matrix(seed):
            r = np.random.default_rng(seed)
            mat = np.empty((self.N + 1, self.L), dtype="U1")
            for col in range(self.L):
                probs = r.dirichlet(np.ones(20) * 0.4)
                mat[:, col] = r.choice(aa20, size=self.N + 1, p=probs)
            return mat

        mat1, mat2 = random_matrix(100), random_matrix(200)

        def plant(mat_i, ci, mat_j, cj, conc, syms):
            state = rng.integers(0, 2, size=self.N + 1)
            follow = rng.random(self.N + 1) < conc
            partner = np.where(follow, state, 1 - state)
            (si0, si1), (sj0, sj1) = syms
            mat_i[:, ci] = np.where(state == 0, si0, si1)
            mat_j[:, cj] = np.where(partner == 0, sj0, sj1)

        inter_syms = [
            (("A", "W"), ("C", "Y")),
            (("D", "R"), ("E", "K")),
            (("F", "L"), ("H", "T")),
        ]
        for (ci, cj, conc), syms in zip(self.INTER_PLANTED, inter_syms):
            plant(mat1, ci, mat2, cj, conc, syms)
        plant(mat1, self.INTRA_PLANTED_1[0], mat1, self.INTRA_PLANTED_1[1],
              self.INTRA_PLANTED_1[2], (("G", "S"), ("N", "Q")))
        plant(mat2, self.INTRA_PLANTED_2[0], mat2, self.INTRA_PLANTED_2[1],
              self.INTRA_PLANTED_2[2], (("I", "V"), ("M", "P")))

        ids_1 = ["a{}/1-{}".format(k, self.L) for k in range(self.N)]
        ids_2 = ["b{}/1-{}".format(k, self.L) for k in range(self.N)]
        a1, a2 = str(tmp_path / "m1.fasta"), str(tmp_path / "m2.fasta")
        for path, target, ids, mat in [
            (a1, "T1/1-{}".format(self.L), ids_1, mat1),
            (a2, "T2/1-{}".format(self.L), ids_2, mat2),
        ]:
            with open(path, "w") as f:
                for name, row in zip([target] + ids, mat):
                    f.write(">{}\n{}\n".format(name, "".join(row)))

        # one species per paired row -> best_hit pairs row k with row k
        species = ["Sp{}".format(k) for k in range(self.N)]
        for tag, target, ids in [("1", "T1", ids_1), ("2", "T2", ids_2)]:
            pd.DataFrame({
                "id": [target + "/1-{}".format(self.L)] + ids,
                "name": [target] + ids,
                "OS": ["Query"] + species,
            }).to_csv(tmp_path / ("anno" + tag + ".csv"), index=False)
            pd.DataFrame({
                "id": [target + "/1-{}".format(self.L)] + ids,
                "identity_to_query": np.linspace(1.0, 0.3, self.N + 1),
            }).to_csv(tmp_path / ("id" + tag + ".csv"), index=False)
        return a1, a2

    @pytest.fixture(scope="class")
    def complex_run(self, tmp_path_factory):
        from evcouplings_tpu.couplings import (
            protocol as couplings_protocol,
        )

        tmp_path = tmp_path_factory.mktemp("complex_e2e")
        a1, a2 = self._make_monomers(tmp_path)
        prefix = str(tmp_path / "run" / "cplx")

        seg = ["aa", "aa", "T", 1, self.L, list(range(1, self.L + 1))]
        concat_outcfg = complex_protocol.run(
            protocol="best_hit",
            prefix=prefix,
            first_alignment_file=a1,
            second_alignment_file=a2,
            first_focus_sequence="T1/1-{}".format(self.L),
            second_focus_sequence="T2/1-{}".format(self.L),
            first_focus_mode=True,
            second_focus_mode=True,
            first_region_start=1,
            second_region_start=1,
            first_segments=[seg],
            second_segments=[seg],
            first_identities_file=str(tmp_path / "id1.csv"),
            second_identities_file=str(tmp_path / "id2.csv"),
            first_annotation_file=str(tmp_path / "anno1.csv"),
            second_annotation_file=str(tmp_path / "anno2.csv"),
            use_best_reciprocal=False,
            paralog_identity_threshold=0.95,
            **MODIFY_KWARGS,
        )

        couplings_outcfg = couplings_protocol.run(
            protocol="complex",
            prefix=prefix,
            alignment_file=concat_outcfg["alignment_file"],
            focus_sequence=concat_outcfg["focus_sequence"],
            segments=concat_outcfg["segments"],
            focus_mode=True,
            theta=0.8,
            alphabet=None,
            ignore_gaps=False,
            iterations=50,
            lambda_h=0.01,
            lambda_J=0.01,
            lambda_group=None,
            lambda_J_times_Lq=True,
            scale_clusters=None,
            cpu=None,
            reuse_ecs=False,
            min_sequence_distance=3,
            scoring_model="skewnormal",
            use_all_ecs_for_scoring=False,
        )
        return concat_outcfg, couplings_outcfg

    def test_concatenation_pairs_all_rows(self, complex_run):
        concat_outcfg, _ = complex_run
        with open(concat_outcfg["alignment_file"]) as f:
            ali = Alignment.from_file(f)
        # target row + N species pairs + the Query-species pair
        # (the targets themselves pair under their shared "Query" OS)
        assert ali.N == self.N + 2
        assert ali.L == 2 * self.L

    def test_inter_ec_file_recovers_planted_pairs(self, complex_run):
        _, outcfg = complex_run
        assert os.path.isfile(outcfg["inter_ec_file"])
        inter = pd.read_csv(outcfg["inter_ec_file"])

        # all inter rows cross segments, full L x L grid
        assert set(inter.segment_i) == {"A_1"}
        assert set(inter.segment_j) == {"B_1"}
        assert len(inter) == self.L * self.L

        # the two strong planted inter couplings are the top inter
        # ECs in order; the weak one lands in the top decile
        # (positions are 1-based)
        expected = [
            (ci + 1, cj + 1) for ci, cj, _ in self.INTER_PLANTED
        ]
        ranked = list(zip(inter.i, inter.j))
        assert ranked[:2] == expected[:2]
        assert expected[2] in ranked[: self.L]

    def test_ec_file_segments_and_probability(self, complex_run):
        _, outcfg = complex_run
        ecs = pd.read_csv(outcfg["ec_file"])
        for col in ("segment_i", "segment_j", "probability", "cn"):
            assert col in ecs.columns
        assert set(ecs.segment_i) <= {"A_1", "B_1"}

        # ec_file keeps ALL pairs; the min_sequence_distance filter
        # produces the separate longrange file, which keeps inter pairs
        # regardless of |i - j|
        longrange = pd.read_csv(outcfg["ec_longrange_file"])
        intra_lr = longrange.query("segment_i == segment_j")
        assert (abs(intra_lr.i - intra_lr.j) >= 3).all()
        assert (longrange.query("segment_i != segment_j").shape[0]
                == self.L * self.L)

        # planted intra pairs are the top intra ECs of their segments
        intra = ecs.query("segment_i == segment_j")
        top_a = intra.query("segment_i == 'A_1'").iloc[0]
        assert (top_a.i, top_a.j) == (
            self.INTRA_PLANTED_1[0] + 1, self.INTRA_PLANTED_1[1] + 1
        )
        top_b = intra.query("segment_i == 'B_1'").iloc[0]
        assert (top_b.i, top_b.j) == (
            self.INTRA_PLANTED_2[0] + 1, self.INTRA_PLANTED_2[1] + 1
        )

    def test_model_file_segments(self, complex_run):
        from evcouplings_tpu.couplings.model import CouplingsModel

        _, outcfg = complex_run
        model = CouplingsModel(outcfg["model_file"])
        assert model.L == 2 * self.L
        # strongest inter coupling visible in the raw CN matrix
        ci, cj, _ = self.INTER_PLANTED[0]
        cn = model.cn()
        inter_block = cn[: self.L, self.L:]
        assert inter_block[ci, cj] == inter_block.max()


class TestGenomeDistanceProtocol:
    """Protocol-level genome_distance concatenation: two monomer
    alignments + CDS genome-location tables -> operon-paired
    concatenated alignment with distance plot."""

    def test_end_to_end(self, tmp_path):
        L = 6
        # alignment row ids are the full_ids from the location tables
        ali1 = tmp_path / "m1.fasta"
        ali1.write_text(
            ">T1/1-6\nMKTAYI\n>A1\nMKSAYL\n>A2\nMRTAYI\n>A3\nMKTAYV\n"
        )
        ali2 = tmp_path / "m2.fasta"
        ali2.write_text(
            ">T2/1-6\nWFQHRE\n>B1\nWFQHKE\n>B2\nWYQHRE\n>B3\nWFEHRD\n"
        )

        # A1<->B1 adjacent on genome g1 (distance 200); A2<->B2 on g1
        # further apart; A3/B3 on unshared genomes
        loc1 = tmp_path / "loc1.csv"
        pd.DataFrame({
            "cds": ["c1", "c2", "c3"],
            "genome_id": ["g1", "g1", "g2"],
            "uniprot_ac": ["P1", "P2", "P3"],
            "gene_start": [100, 5000, 100],
            "gene_end": [400, 5300, 500],
            "full_id": ["A1", "A2", "A3"],
        }).to_csv(loc1, index=False)
        loc2 = tmp_path / "loc2.csv"
        pd.DataFrame({
            "cds": ["d1", "d2", "d3"],
            "genome_id": ["g1", "g1", "g3"],
            "uniprot_ac": ["Q1", "Q2", "Q3"],
            "gene_start": [600, 5400, 100],
            "gene_end": [900, 5600, 200],
            "full_id": ["B1", "B2", "B3"],
        }).to_csv(loc2, index=False)

        # annotation files (used for concatenation statistics)
        for path_, ids in [
            (tmp_path / "anno1.csv", ["T1/1-6", "A1", "A2", "A3"]),
            (tmp_path / "anno2.csv", ["T2/1-6", "B1", "B2", "B3"]),
        ]:
            pd.DataFrame({
                "id": ids, "name": ids, "OS": ["spX"] * len(ids),
            }).to_csv(path_, index=False)

        seg = ["aa", "A_1", "T", 1, L, list(range(1, L + 1))]
        outcfg = complex_protocol.run(
            protocol="genome_distance",
            prefix=str(tmp_path / "run" / "gd"),
            first_alignment_file=str(ali1),
            second_alignment_file=str(ali2),
            first_focus_sequence="T1/1-6",
            second_focus_sequence="T2/1-6",
            first_focus_mode=True, second_focus_mode=True,
            first_region_start=1, second_region_start=1,
            first_segments=[seg], second_segments=[seg],
            genome_distance_threshold=1000,
            first_genome_location_file=str(loc1),
            second_genome_location_file=str(loc2),
            first_annotation_file=str(tmp_path / "anno1.csv"),
            second_annotation_file=str(tmp_path / "anno2.csv"),
            # alignment post-processing
            hhfilter=None, seqid_filter=None,
            minimum_sequence_coverage=0, minimum_column_coverage=0,
            compute_num_effective_seqs=False, theta=0.8,
        )

        from evcouplings_tpu.align.alignment import Alignment

        full = Alignment.from_path(outcfg["raw_alignment_file"], "fasta")
        # target pair + the two same-genome reciprocal pairs within
        # the distance threshold
        paired_ids = set(full.ids)
        assert full.L == 2 * L
        assert any("A1" in i and "B1" in i for i in full.ids)
        assert any("A2" in i and "B2" in i for i in full.ids)
        assert not any("A3" in i or "B3" in i for i in paired_ids)

        assert os.path.isfile(outcfg["distance_plot_file"])
        assert outcfg["num_sequences"] == 3
