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
