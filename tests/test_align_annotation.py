"""
Annotation utilities around the align stage: database-id extraction
from FASTA headers, UniProt -> EMBL CDS mapping, ENA genome-location
annotation, and Pfam family tables.
"""

import gzip

import pandas as pd
import pytest

from evcouplings_tpu.align.ena import (
    add_full_header,
    extract_cds_ids,
    extract_embl_annotation,
)
from evcouplings_tpu.align.ids import retrieve_sequence_ids
from evcouplings_tpu.align.pfam import (
    create_family_size_table,
    remove_clan_overlaps,
)


class TestRetrieveSequenceIds:
    def test_uniprot_style_headers(self, tmp_path):
        f = tmp_path / "a.fasta"
        f.write_text(
            ">UniRef100_P12345/1-100 some description\nAC\n"
            ">tr|Q99999|Q99999_HUMAN/5-50\nAC\n"
            ">P55555/2-30 OS=Bacterium\nAC\n"
        )
        with open(f) as handle:
            ids, id_to_header = retrieve_sequence_ids(handle)
        assert ids == ["P12345", "Q99999", "P55555"]
        assert id_to_header["P12345"] == [
            "UniRef100_P12345/1-100 some description"
        ]

    def test_duplicate_ids_accumulate_headers(self, tmp_path):
        f = tmp_path / "a.fasta"
        f.write_text(
            ">UniRef100_P1/1-10\nAC\n>UniRef100_P1/20-30\nAC\n"
        )
        with open(f) as handle:
            ids, id_to_header = retrieve_sequence_ids(handle)
        assert ids == ["P1", "P1"]
        assert len(id_to_header["P1"]) == 2

    def test_custom_regex(self, tmp_path):
        f = tmp_path / "a.fasta"
        f.write_text(">gene123|rest\nAC\n")
        with open(f) as handle:
            ids, _ = retrieve_sequence_ids(
                handle, regex=[r"^(\w+)\|"]
            )
        assert ids == ["gene123"]


@pytest.fixture
def ena_setup(tmp_path):
    ali = tmp_path / "ali.fasta"
    ali.write_text(
        ">UniRef100_P1/1-4\nACDE\n"
        ">UniRef100_P2/1-4\nACDE\n"
        ">UniRef100_P3/1-4\nACDE\n"
    )

    # P1 -> cds1 (one genome, keep); P2 -> cds2 hit by two genomes
    # (ambiguous, drop) + cds3 (keep); P9 not in alignment
    mapping = tmp_path / "uniprot_to_embl.txt"
    mapping.write_text(
        "P1 x g1:cds1\n"
        "P2 x g1:cds2,g2:cds2,g1:cds3\n"
        "P9 x g3:cds9\n"
    )

    locations = tmp_path / "cds_locations.tsv"
    locations.write_text(
        "cds1\tgenomeA\tx\t100\t400\n"
        "cds3\tgenomeA\tx\t900\t1200\n"
        "cds9\tgenomeB\tx\t5\t50\n"
    )
    return str(ali), str(mapping), str(locations)


class TestEnaAnnotation:
    def test_extract_cds_ids(self, ena_setup):
        ali, mapping, _ = ena_setup
        pairs = extract_cds_ids(ali, mapping)
        assert ("P1", "cds1") in pairs
        assert ("P2", "cds3") in pairs
        # ambiguous multi-genome CDS dropped, non-alignment AC dropped
        assert all(cds != "cds2" for _, cds in pairs)
        assert all(ac != "P9" for ac, _ in pairs)

    def test_extract_embl_annotation_and_full_header(self, ena_setup,
                                                     tmp_path):
        ali, mapping, locations = ena_setup
        pairs = extract_cds_ids(ali, mapping)
        table = extract_embl_annotation(
            pairs, locations, str(tmp_path / "out.csv")
        )
        assert set(table.cds) == {"cds1", "cds3"}
        row = table.query("cds == 'cds1'").iloc[0]
        assert row.uniprot_ac == "P1"
        assert (row.gene_start, row.gene_end) == ("100", "400")

        expanded = add_full_header(table, ali)
        assert "full_id" in expanded.columns
        assert set(expanded.full_id) == {
            "UniRef100_P1/1-4", "UniRef100_P2/1-4"
        }


class TestPfam:
    def test_family_size_table(self, tmp_path):
        # Pfam-A.full.gz-style Stockholm flatfile: one GF block per
        # family (reference contract: gzip input, fixed-width AC field)
        pfam_full = tmp_path / "Pfam-A.full.gz"
        with gzip.open(pfam_full, "wt") as f:
            f.write(
                "# STOCKHOLM 1.0\n"
                "#=GF AC   PF00001.21\n"
                "#=GF ID   fam1\n"
                "#=GF SQ   100\n"
                "//\n"
                "# STOCKHOLM 1.0\n"
                "#=GF AC   PF00002.5\n"
                "#=GF ID   fam2\n"
                "#=GF SQ   50\n"
                "//\n"
            )
        table = create_family_size_table(
            str(pfam_full), str(tmp_path / "sizes.csv")
        )
        assert len(table) == 2
        assert set(table.pfam_id) == {"PF00001", "PF00002"}
        assert int(
            table.query("pfam_id == 'PF00001'").num_seqs.iloc[0]
        ) == 100

    def test_remove_clan_overlaps(self):
        # same clan + overlapping alignment range -> keep the
        # higher-bitscore hit; hits without a clan (NaN) untouched
        hits = pd.DataFrame({
            "query_name": ["q1"] * 4,
            "pfam_id": ["PF00001", "PF00002", "PF00003", "PF00004"],
            "clan_id": ["CL0001", "CL0001", None, "CL0001"],
            "ali_from": [10, 20, 5, 200],
            "ali_to": [80, 90, 50, 280],
            "domain_score": [50.0, 30.0, 10.0, 7.0],
        })
        kept = remove_clan_overlaps(hits)
        # PF00002 overlaps PF00001 in CL0001 and scores lower -> gone
        assert set(kept.pfam_id) == {"PF00001", "PF00003", "PF00004"}
