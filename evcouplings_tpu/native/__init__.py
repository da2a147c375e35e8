"""
Native (C) runtime components, with pure-Python fallbacks.

The compute path of the framework is JAX/XLA/Pallas; the IO path
around it is native where the cost is real. Currently:

- `_fasta` (native/fasta_io.c): single-pass FASTA/A2M loader returning
  the sequence block as one contiguous buffer (the reference parses
  line-by-line in Python, evcouplings/align/alignment.py:42-74).

Build in place with:

    python setup.py build_ext --inplace

Everything here degrades gracefully: if the extension is not built,
`HAVE_NATIVE` is False and callers use the Python readers.
"""

import numpy as np

try:
    from evcouplings_tpu.native import _fasta

    HAVE_NATIVE = True
except ImportError:  # not built; pure-Python fallbacks take over
    _fasta = None
    HAVE_NATIVE = False


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

    matrix = (
        np.frombuffer(seq_bytes, dtype="S1")
        .reshape(n, L)
        .astype("U1")
    )
    return ids, matrix
