"""
Native FASTA loader tests: the C extension must agree byte-for-byte
with the Python reader on every format quirk, fall back cleanly on
ragged input, and beat the Python reader on large files.
"""

import numpy as np
import pytest

from evcouplings_tpu.align.alignment import Alignment, read_fasta
from evcouplings_tpu.native import HAVE_NATIVE, parse_fasta_native

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE,
    reason="native _fasta extension not built "
    "(python setup.py build_ext --inplace)",
)


def python_parse(path):
    with open(path) as f:
        items = list(read_fasta(f))
    ids = [i for i, _ in items]
    matrix = np.array([list(s) for _, s in items], dtype="U1")
    return ids, matrix


def check_equal(path):
    ids_n, mat_n = parse_fasta_native(str(path))
    ids_p, mat_p = python_parse(str(path))
    assert ids_n == ids_p
    assert mat_n.shape == mat_p.shape
    assert (mat_n == mat_p).all()


class TestNativeParser:
    def test_basic(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text(">s1/1-4 desc here\nACDE\n>s2\nWY-k\n")
        check_equal(p)

    def test_wrapped_lines_and_crlf(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text(">s1\r\nACDE\r\nFGHI\r\n>s2 x\t\r\nKLMN\r\nPQRS\r\n")
        ids, mat = parse_fasta_native(str(p))
        assert ids == ["s1", "s2 x"]
        assert "".join(mat[0]) == "ACDEFGHI"
        assert "".join(mat[1]) == "KLMNPQRS"

    def test_comment_lines_empty_lines_no_trailing_newline(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text("; file comment\n>s1\nAC\n\nDE\n;mid\n>s2\nFGH\nI")
        ids, mat = parse_fasta_native(str(p))
        assert ids == ["s1", "s2"]
        assert "".join(mat[0]) == "ACDE"
        assert "".join(mat[1]) == "FGHI"

    def test_lowercase_a2m_kept(self, tmp_path):
        p = tmp_path / "a.a2m"
        p.write_text(">s1\nAc-.E\n>s2\ngY-wk\n")
        check_equal(p)

    def test_ragged_raises(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text(">s1\nACDE\n>s2\nWY\n")
        with pytest.raises(ValueError, match="Unequal"):
            parse_fasta_native(str(p))

    def test_no_records_raises(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text("just text\nno headers\n")
        with pytest.raises(ValueError, match="No FASTA"):
            parse_fasta_native(str(p))

    def test_missing_file_oserror(self, tmp_path):
        with pytest.raises(OSError):
            parse_fasta_native(str(tmp_path / "nope.fasta"))

    def test_empty_sequences(self, tmp_path):
        # zero-length rows are legal (L = 0)
        p = tmp_path / "a.fasta"
        p.write_text(">s1\n>s2\n")
        ids, _, n, L = __import__(
            "evcouplings_tpu.native._fasta", fromlist=["_fasta"]
        ).parse_fasta(str(p))
        assert (ids, n, L) == (["s1", "s2"], 2, 0)

    def test_random_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        aa = np.array(list("ACDEFGHIKLMNPQRSTVWY-acdefg."))
        N, L = 97, 53
        mat = rng.choice(aa, size=(N, L))
        p = tmp_path / "r.fasta"
        with open(p, "w") as f:
            for k in range(N):
                f.write(">seq{} OS=Sp{}\n".format(k, k))
                row = "".join(mat[k])
                # wrap at 17 to exercise multi-line assembly
                for j in range(0, L, 17):
                    f.write(row[j:j + 17] + "\n")
        check_equal(p)


class TestFromPath:
    def test_from_path_matches_from_file(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text(">s1/1-4 OS=X\nACDE\n>s2/1-4\nWYKL\n")
        ali_path = Alignment.from_path(str(p))
        with open(p) as f:
            ali_file = Alignment.from_file(f, "fasta")
        assert list(ali_path.ids) == list(ali_file.ids)
        assert (ali_path.matrix == ali_file.matrix).all()

    def test_from_path_split_header(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_text(">s1/1-4 OS=X\nACDE\n>s2/1-4 OS=Y\nWYKL\n")
        ali = Alignment.from_path(str(p), split_header=True)
        assert list(ali.ids) == ["s1/1-4", "s2/1-4"]

    def test_from_path_autodetect_and_ragged_fallback(self, tmp_path):
        # a3m-style ragged file: native raises, Python a3m path absorbs
        p = tmp_path / "a.a3m"
        p.write_text(">s1\nACDE\n>s2\nWYkKL\n")
        ali = Alignment.from_path(str(p), "a3m")
        assert ali.N == 2

    def test_duplicate_headers_match_python_semantics(self, tmp_path):
        """OrderedDict semantics: first occurrence keeps its position,
        last occurrence supplies the sequence — identical whether or
        not the C extension is built."""
        p = tmp_path / "dup.fasta"
        p.write_text(
            ">s1\nACDE\n>s2\nWYKL\n>s1\nGGGG\n"
        )
        ali = Alignment.from_path(str(p))
        with open(p) as f:
            ref = Alignment.from_file(f, "fasta")
        assert list(ali.ids) == list(ref.ids) == ["s1", "s2"]
        assert (ali.matrix == ref.matrix).all()
        assert "".join(ali.matrix[0]) == "GGGG"

    def test_from_file_only_kwargs_accepted(self, tmp_path):
        """from_file kwargs valid for any format must not crash the
        native fast path (they did TypeError only when the C
        extension was built)."""
        p = tmp_path / "a.fasta"
        p.write_text(">s1\nACDE\n>s2\nWYKL\n")
        ali = Alignment.from_path(
            str(p), "fasta", raise_hmmer_prefixes=False,
            a3m_inserts="first",
        )
        assert ali.N == 2

    def test_cr_only_line_endings_fall_back(self, tmp_path):
        """Classic-Mac CR-only files: the native parser must refuse
        (not silently return a 1x0 alignment) so the Python reader's
        universal-newline handling takes over."""
        p = tmp_path / "cr.fasta"
        p.write_bytes(b">s1\rACDE\r>s2\rWYKL\r")
        ali = Alignment.from_path(str(p), "fasta")
        assert ali.N == 2 and ali.L == 4
        assert "".join(ali.matrix[0]) == "ACDE"

    def test_from_path_stockholm(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\n"
            "s1  ACDE\n"
            "s2  WYKL\n"
            "//\n"
        )
        ali = Alignment.from_path(str(p), "stockholm")
        assert ali.N == 2 and ali.L == 4


from evcouplings_tpu.native import (  # noqa: E402
    HAVE_NATIVE_STOCKHOLM,
    parse_stockholm_native,
)
from evcouplings_tpu.align.alignment import read_stockholm  # noqa: E402

stockholm_only = pytest.mark.skipif(
    not HAVE_NATIVE_STOCKHOLM,
    reason="native _stockholm extension not built",
)


def python_parse_stockholm(path, **kwargs):
    with open(path) as f:
        return next(read_stockholm(f, read_annotation=True, **kwargs))


def check_stockholm_equal(path):
    ids, mat, anno = parse_stockholm_native(str(path))
    ref = python_parse_stockholm(str(path))
    assert ids == list(ref.seqs.keys())
    assert ["".join(r) for r in mat] == list(ref.seqs.values())
    assert dict(anno["GF"]) == dict(ref.gf)
    assert dict(anno["GC"]) == dict(ref.gc)
    assert {k: dict(v) for k, v in anno["GS"].items()} == \
        {k: dict(v) for k, v in ref.gs.items()}
    assert {k: dict(v) for k, v in anno["GR"].items()} == \
        {k: dict(v) for k, v in ref.gr.items()}


@stockholm_only
class TestNativeStockholm:
    def test_interleaved_blocks_and_annotation(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\n"
            "#=GF ID family1\n"
            "#=GF AC PF00000\n"
            "#=GS seq1 DE first seq description\n"
            "#=GS seq2 DE second one\n"
            "\n"
            "seq1 ACDE\n"
            "seq2 FGHI\n"
            "#=GR seq1 PP 8899\n"
            "#=GC SS_cons HHHH\n"
            "\n"
            "seq1 KLMN\n"
            "seq2 PQRS\n"
            "#=GR seq1 PP 7766\n"
            "#=GC SS_cons EEEE\n"
            "//\n"
        )
        check_stockholm_equal(p)

    def test_crlf_and_trailing_ws(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\r\nseq1 ACDE  \r\nseq2 -GH.\r\n//\r\n"
        )
        check_stockholm_equal(p)

    def test_indented_sequence_lines(self, tmp_path):
        """Python's str.split() skips leading whitespace, so indented
        sequence rows are valid — the native parser must not drop
        them."""
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\n"
            "  seq1  ACDE\n"
            "seq2  FGHI\n"
            "  seq1  KLMN\n"
            "seq2  PQRS\n"
            "//\n"
        )
        check_stockholm_equal(p)
        ids, mat, _ = parse_stockholm_native(str(p))
        assert ids == ["seq1", "seq2"]
        assert "".join(mat[0]) == "ACDEKLMN"

    def test_missing_header_raises(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text("seq1 ACDE\n//\n")
        with pytest.raises(ValueError, match="Header missing"):
            parse_stockholm_native(str(p))

    def test_truncated_raises(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text("# STOCKHOLM 1.0\nseq1 ACDE\n")
        with pytest.raises(ValueError, match="Truncated"):
            parse_stockholm_native(str(p))

    def test_ragged_raises(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text("# STOCKHOLM 1.0\nseq1 ACDE\nseq2 FG\n//\n")
        with pytest.raises(ValueError, match="unequal"):
            parse_stockholm_native(str(p))

    def test_hmmer_prefix_warning_raises(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\n"
            "# WARNING: seq names have been made unique by adding "
            "a prefix of X\n"
            "seq1 ACDE\n//\n"
        )
        with pytest.raises(ValueError, match="HMMER"):
            parse_stockholm_native(str(p))
        # and suppressible like the Python reader
        ids, _, _ = parse_stockholm_native(
            str(p), raise_hmmer_prefixes=False
        )
        assert ids == ["seq1"]

    def test_only_first_alignment(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\nseq1 ACDE\n//\n"
            "# STOCKHOLM 1.0\nother WXYZ\n//\n"
        )
        ids, mat, _ = parse_stockholm_native(str(p))
        assert ids == ["seq1"]

    def test_random_interleaved_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        aa = np.array(list("ACDEFGHIKLMNPQRSTVWY-."))
        N, L, width = 61, 140, 37
        mat = rng.choice(aa, size=(N, L))
        p = tmp_path / "r.sto"
        with open(p, "w") as f:
            f.write("# STOCKHOLM 1.0\n")
            for start in range(0, L, width):
                for k in range(N):
                    f.write("sq{}/1-{} {}\n".format(
                        k, L, "".join(mat[k][start:start + width])
                    ))
                f.write("\n")
            f.write("//\n")
        check_stockholm_equal(p)

    def test_from_path_uses_annotation(self, tmp_path):
        p = tmp_path / "a.sto"
        p.write_text(
            "# STOCKHOLM 1.0\n"
            "#=GS s1 DE my target protein\n"
            "s1 ACDE\ns2 FGHI\n//\n"
        )
        ali = Alignment.from_path(str(p), "stockholm")
        assert ali.N == 2
        assert ali.annotation["GS"]["s1"]["DE"] == "my target protein"


class TestDifferentialFuzz:
    """Multi-seed structural fuzz: random alignments rendered with
    randomized formatting quirks (wrap widths, CRLF, comments, blank
    lines, annotations, trailing-newline presence) must parse
    identically through the C extension and the Python reader."""

    @pytest.mark.parametrize("seed", range(12))
    def test_fasta_differential(self, seed, tmp_path):
        rng = np.random.default_rng(1000 + seed)
        aa = np.array(list("ACDEFGHIKLMNPQRSTVWYX-acdefg.*"))
        N = int(rng.integers(1, 40))
        L = int(rng.integers(1, 120))
        mat = rng.choice(aa, size=(N, L))

        wrap = int(rng.integers(1, L + 30))
        crlf = bool(rng.integers(2))
        comments = bool(rng.integers(2))
        blanks = bool(rng.integers(2))
        annotate = bool(rng.integers(2))
        trailing_nl = bool(rng.integers(2))
        eol = "\r\n" if crlf else "\n"

        lines = []
        if comments:
            lines.append("; leading comment")
        for k in range(N):
            header = "seq{}/{}-{}".format(k, k + 1, k + L)
            if annotate and rng.integers(2):
                header += " OS=Species{} n={}".format(k, k)
            lines.append(">" + header)
            row = "".join(mat[k])
            for j in range(0, L, wrap):
                lines.append(row[j:j + wrap])
            if blanks and rng.integers(2):
                lines.append("")
        text = eol.join(lines) + (eol if trailing_nl else "")

        p = tmp_path / "fuzz.fasta"
        p.write_bytes(text.encode())
        check_equal(p)

    @stockholm_only
    @pytest.mark.parametrize("seed", range(8))
    def test_stockholm_differential(self, seed, tmp_path):
        rng = np.random.default_rng(2000 + seed)
        aa = np.array(list("ACDEFGHIKLMNPQRSTVWY-."))
        N = int(rng.integers(1, 20))
        L = int(rng.integers(4, 80))
        mat = rng.choice(aa, size=(N, L))
        interleave = bool(rng.integers(2))
        gc_line = bool(rng.integers(2))
        gs_lines = bool(rng.integers(2))
        gr_lines = bool(rng.integers(2))

        ids = ["s{}/1-{}".format(k, L) for k in range(N)]
        body = []
        body.append("# STOCKHOLM 1.0")
        if gs_lines:
            for k in range(0, N, 2):
                body.append("#=GS {} DE fuzz description {}".format(
                    ids[k], k))
        n_chunks = 2 if (interleave and L >= 8) else 1
        chunk = -(-L // n_chunks)
        for c in range(n_chunks):
            for k in range(N):
                seq = "".join(mat[k])[c * chunk:(c + 1) * chunk]
                body.append("{}  {}".format(ids[k], seq))
                if gr_lines and k == 0:
                    body.append("#=GR {} PP {}".format(
                        ids[k], "*" * len(seq)))
            if gc_line:
                body.append("#=GC RF {}".format(
                    "x" * min(chunk, L - c * chunk)))
            if c + 1 < n_chunks:
                body.append("")
        body.append("//")

        p = tmp_path / "fuzz.sto"
        p.write_text("\n".join(body) + "\n")
        check_stockholm_equal(p)


class TestStrictInputGuard:
    """Inputs the Python reader tokenizes differently must RAISE in
    the C parsers (diverting to the Python fallback), never silently
    succeed with a different alignment (round-3 native review)."""

    CASES = {
        "bare_cr_mid_line": b">a\nAC\rGT\n>b\nAC\rGT\n",
        "form_feed": b">a\nACGT\x0c\n>b\nACGT\x0c\n",
        "vertical_tab": b">a\nAC\x0bGT\n>b\nAC\x0bGT\n",
        "utf8_residue": ">a\nACÄT\n>b\nACÄT\n".encode(),
        "invalid_utf8_header": b">seq\xff1\nACGT\n",
    }

    @pytest.mark.parametrize("name", list(CASES))
    def test_fasta_guard_raises(self, name, tmp_path):
        p = tmp_path / "g.fasta"
        p.write_bytes(self.CASES[name])
        with pytest.raises(ValueError):
            parse_fasta_native(str(p))

    def test_fasta_fallback_matches_python_reader(self, tmp_path):
        """Through Alignment.from_path the guard is invisible: the
        Python reader's answer comes back."""
        p = tmp_path / "g.fasta"
        p.write_bytes(self.CASES["bare_cr_mid_line"])
        ali = Alignment.from_path(str(p), "fasta")
        # universal newlines split AC\rGT into two lines -> "ACGT"
        assert ali.L == 4
        assert "".join(ali.matrix[0]) == "ACGT"

    @stockholm_only
    def test_stockholm_guard_raises(self, tmp_path):
        p = tmp_path / "g.sto"
        p.write_bytes(
            b"# STOCKHOLM 1.0\nseq1\x0cACGT\nseq2 ACGT\n//\n")
        with pytest.raises(ValueError):
            parse_stockholm_native(str(p))
        # and through from_path, the Python reader keeps both rows
        ali = Alignment.from_path(str(p), "stockholm")
        assert ali.N == 2
