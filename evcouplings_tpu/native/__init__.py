"""
Native (C) runtime components, with pure-Python fallbacks.

The compute path of the framework is JAX/XLA/Pallas; the IO path
around it is native where the cost is real. Currently:

- `_fasta` (native/fasta_io.c): single-pass FASTA/A2M loader returning
  the sequence block as one contiguous buffer (the reference parses
  line-by-line in Python, evcouplings/align/alignment.py:42-74).
- `_stockholm` (native/stockholm_io.c): single-pass Stockholm loader
  that concatenates interleaved residue blocks in C and hands the
  markup lines to Python for annotation assembly (reference:
  evcouplings/align/alignment.py:122-233).

Build in place with:

    python setup.py build_ext --inplace

Everything here degrades gracefully: if the extension is not built,
`HAVE_NATIVE` is False and callers use the Python readers.
"""

import sys

import numpy as np

try:
    from evcouplings_tpu.native import _fasta

    HAVE_NATIVE = True
except ImportError:  # not built; pure-Python fallbacks take over
    _fasta = None
    HAVE_NATIVE = False

try:
    from evcouplings_tpu.native import _stockholm

    HAVE_NATIVE_STOCKHOLM = True
except ImportError:
    _stockholm = None
    HAVE_NATIVE_STOCKHOLM = False


def _bytes_to_char_matrix(seq_bytes, n, L):
    """(n*L,) ASCII bytes -> (n, L) '<U1' matrix without numpy's
    element-wise S->U astype (which costs ~20x the parse itself):
    UCS4 little-endian stores the ASCII byte first, so widening is a
    strided byte copy."""
    if sys.byteorder != "little":   # pragma: no cover
        return (
            np.frombuffer(seq_bytes, dtype="S1")
            .reshape(n, L).astype("U1")
        )
    out = np.zeros((n * L, 4), dtype=np.uint8)
    out[:, 0] = np.frombuffer(seq_bytes, dtype=np.uint8)
    return out.view("<U1").reshape(n, L)


def parse_fasta_native(path):
    """Parse an aligned FASTA/A2M file natively.

    Returns (ids, matrix) where ids is a list of full header strings
    and matrix is an (N, L) single-character numpy array — the same
    shape/dtype the Alignment container uses.

    Raises ValueError for ragged files (e.g. a3m with inserts) so
    callers can fall back to the insert-aware Python parser, and
    ImportError if the extension is not built.
    """
    if _fasta is None:
        raise ImportError(
            "native _fasta extension not built "
            "(python setup.py build_ext --inplace)"
        )

    ids, seq_bytes, n, L = _fasta.parse_fasta(path)

    if n * L != len(seq_bytes):
        raise ValueError(
            "inconsistent parse: {} rows x {} cols != {} bytes".format(
                n, L, len(seq_bytes)
            )
        )

    matrix = _bytes_to_char_matrix(seq_bytes, n, L)
    return ids, matrix


def parse_stockholm_native(path, read_annotation=True,
                           raise_hmmer_prefixes=True):
    """Parse the first alignment of a Stockholm file natively.

    Returns (ids, matrix, annotation) with annotation = {"GF", "GC",
    "GS", "GR"} dicts shaped exactly like the Python reader's
    StockholmAlignment fields (align/alignment.py read_stockholm). The
    residue accumulation (the hot loop for interleaved GB-scale
    jackhmmer output) runs in C; only the markup lines are assembled
    here.

    Raises ValueError for files the C parser does not cover
    (truncated/ragged/invalid) so callers can fall back, and
    ImportError if the extension is not built.
    """
    if _stockholm is None:
        raise ImportError(
            "native _stockholm extension not built "
            "(python setup.py build_ext --inplace)"
        )

    from evcouplings_tpu.align.alignment import HMMER_PREFIX_WARNING
    from evcouplings_tpu.utils.helpers import DefaultOrderedDict

    ids, seq_bytes, n, L, markup = _stockholm.parse_stockholm(path)

    if n * L != len(seq_bytes):
        raise ValueError(
            "inconsistent parse: {} rows x {} cols != {} bytes".format(
                n, L, len(seq_bytes)
            )
        )

    matrix = _bytes_to_char_matrix(seq_bytes, n, L)

    gf = DefaultOrderedDict(list)
    gc = DefaultOrderedDict(str)
    # single value per (row, tag), like the Python reader's per_seq
    # (missing-key reads must default to "" on both paths)
    gs = DefaultOrderedDict(lambda: DefaultOrderedDict(str))
    gr = DefaultOrderedDict(lambda: DefaultOrderedDict(str))

    for line in markup:
        if raise_hmmer_prefixes and line.startswith(HMMER_PREFIX_WARNING):
            raise ValueError(
                "HMMER added identifier prefixes to alignment because "
                "of non-unique sequence identifiers. Please ensure "
                "unique sequence identifiers in the database and for "
                "the target."
            )
        if not read_annotation:
            continue
        if line.startswith("#=GF"):
            _, feat, val = line.split(maxsplit=2)
            gf[feat].append(val)
        elif line.startswith("#=GC"):
            _, feat, seq = line.split(maxsplit=2)
            gc[feat] += seq
        elif line.startswith("#=GS"):
            _, seq_id, feat, val = line.split(maxsplit=3)
            gs[seq_id][feat] = val
        elif line.startswith("#=GR"):
            _, seq_id, feat, seq = line.split()
            gr[seq_id][feat] += seq

    annotation = {"GF": gf, "GC": gc, "GS": gs, "GR": gr}
    return ids, matrix, annotation
