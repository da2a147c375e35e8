"""
Alignment container and format I/O tests.
"""

import io

import numpy as np
import pytest

from evcouplings_tpu.align import (
    Alignment, read_fasta, read_a3m, read_stockholm, detect_format,
    parse_header, map_from_alphabet, map_matrix,
    ALPHABET_PROTEIN,
)

FASTA = """>seq1/1-8 some annotation
ACDEFGHI
>seq2/2-9
ACD-FGHi
>seq3
acdefgh-
"""

STOCKHOLM = """# STOCKHOLM 1.0
#=GF ID test
#=GS seq1 DE first sequence
seq1 ACDEF
seq2 AC-EF
#=GC SS_cons HHHHH
//
"""

A3M = """>target
ACDEFG
>hit1
ACDEfgFG
>hit2
AC-EFG
"""


class TestParsers:
    def test_read_fasta(self):
        entries = list(read_fasta(io.StringIO(FASTA)))
        assert entries[0] == ("seq1/1-8 some annotation", "ACDEFGHI")
        assert entries[1] == ("seq2/2-9", "ACD-FGHi")
        assert entries[2] == ("seq3", "acdefgh-")

    def test_read_stockholm(self):
        ali = next(read_stockholm(io.StringIO(STOCKHOLM), read_annotation=True))
        assert ali.seqs["seq1"] == "ACDEF"
        assert ali.seqs["seq2"] == "AC-EF"
        assert ali.gf["ID"] == ["test"]
        assert ali.gc["SS_cons"] == "HHHHH"
        assert ali.gs["seq1"]["DE"] == "first sequence"

    def test_read_stockholm_truncated_not_yielded(self):
        truncated = STOCKHOLM.replace("//\n", "")
        with pytest.raises(StopIteration):
            next(read_stockholm(io.StringIO(truncated)))

    def test_read_stockholm_bad_header(self):
        with pytest.raises(ValueError):
            next(read_stockholm(io.StringIO("seq1 ACDEF\n//\n")))

    def test_read_a3m_inserts_first(self):
        seqs = read_a3m(io.StringIO(A3M), inserts="first")
        assert seqs["target"] == "ACDEFG"
        # lowercase insert of hit1 has no column in target template -> dropped
        assert seqs["hit1"] == "ACDEFG"
        assert seqs["hit2"] == "AC-EFG"

    def test_read_a3m_inserts_delete(self):
        seqs = read_a3m(io.StringIO(A3M), inserts="delete")
        assert seqs["hit1"] == "ACDEFG"

    def test_detect_format(self):
        assert detect_format(io.StringIO(FASTA)) == "fasta"
        assert detect_format(io.StringIO(STOCKHOLM)) == "stockholm"
        assert detect_format(io.StringIO(FASTA), "x.a3m") == "a3m"
        assert detect_format(io.StringIO("garbage\n")) is None

    def test_parse_header(self):
        assert parse_header("seq1/1-8 annotation") == ("seq1", 1, 8)
        assert parse_header("seq1") == ("seq1", None, None)
        assert parse_header("UniRef90_A0A0/7-179") == ("UniRef90_A0A0", 7, 179)


class TestMapping:
    def test_map_matrix(self):
        m = np.array([["A", "C"], ["-", "X"]])
        amap = map_from_alphabet(ALPHABET_PROTEIN)
        mapped = map_matrix(m, amap)
        assert mapped[0, 0] == ALPHABET_PROTEIN.index("A")
        assert mapped[0, 1] == ALPHABET_PROTEIN.index("C")
        assert mapped[1, 0] == 0        # gap
        assert mapped[1, 1] == 0        # X not in alphabet -> default gap

    def test_map_from_alphabet_bad_default(self):
        with pytest.raises(ValueError):
            map_from_alphabet("ABC", default="Z")


class TestAlignment:
    def make(self):
        return Alignment.from_file(io.StringIO(FASTA), format="fasta")

    def test_basic(self):
        ali = self.make()
        assert ali.N == 3 and ali.L == 8
        assert "".join(ali[0]) == "ACDEFGHI"
        assert "".join(ali["seq3"]) == "acdefgh-"
        assert len(ali) == 3

    def test_count(self):
        ali = self.make()
        gaps = ali.count("-", axis="pos", normalize=False)
        assert gaps[3] == 1 and gaps[7] == 1

    def test_select(self):
        ali = self.make()
        sub = ali.select(columns=np.array([0, 1, 2]), sequences=np.array([0, 2]))
        assert sub.N == 2 and sub.L == 3
        assert "".join(sub[1]) == "acd"

    def test_lowercase_columns(self):
        ali = self.make()
        mod = ali.lowercase_columns(np.array([3]))
        # column 3 lowercased ("-" becomes the insert gap "."), every
        # other column untouched
        assert "".join(mod[0]) == "ACDeFGHI"
        assert "".join(mod[1]) == "ACD.FGHi"
        assert mod[1][3] == "."  # "-" became "."
        assert mod[0][3] == "e"

    def test_weights_and_frequencies(self):
        ali = self.make()
        ali.set_weights(identity_threshold=0.5)
        assert ali.weights is not None
        f = ali.frequencies
        assert f.shape == (8, 21)
        np.testing.assert_allclose(f.sum(axis=1), 1.0, rtol=1e-6)

    def test_identities_to(self):
        ali = self.make()
        ids = ali.identities_to("ACDEFGHI")
        assert ids[0] == 1.0

    def test_conservation(self):
        ali = self.make()
        c = ali.conservation()
        assert c.shape == (8,)
        assert np.all((c >= 0) & (c <= 1))

    def test_write_roundtrip(self):
        ali = self.make()
        buf = io.StringIO()
        ali.write(buf, format="fasta")
        buf.seek(0)
        ali2 = Alignment.from_file(buf, format="fasta")
        assert np.array_equal(ali.matrix, ali2.matrix)
        assert list(ali.ids) == list(ali2.ids)

    def test_stockholm_annotation(self):
        ali = Alignment.from_file(io.StringIO(STOCKHOLM), format="stockholm")
        assert ali.annotation["GC"]["SS_cons"] == "HHHHH"

    def test_example_a2m_loads(self):
        with open("/root/reference/notebooks/example/example_aln.a2m") as f:
            ali = Alignment.from_file(f, format="fasta")
        assert ali.N == 53
        assert ali.L == len("".join(ali[0]))
