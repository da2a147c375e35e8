"""
Multiple sequence alignment container and format I/O.

Parity target: reference evcouplings/align/alignment.py (Alignment class,
fasta/stockholm/a3m parsers and writers, alphabets). The numerical members
(set_weights, frequencies, pair_frequencies, identities_to) delegate to the
JAX/TPU kernels in evcouplings_tpu.ops instead of numba loops; the container
itself stays a plain numpy char matrix so that string-level operations
(case changes, gap replacement, column selection) stay cheap on host.
"""

import re
from collections import namedtuple, OrderedDict, defaultdict
from copy import deepcopy
from pathlib import Path

import numpy as np

from evcouplings_tpu.utils.calculations import entropy_rows
from evcouplings_tpu.utils.helpers import DefaultOrderedDict, wrap


# ---------------------------------------------------------------------
# Module-level kernel entry points at the reference's import paths
# (numba kernels at reference align/alignment.py:1078-1233). The
# implementations are the TPU kernels in evcouplings_tpu.ops; imports
# are deferred so loading an alignment never pays JAX startup.
# ---------------------------------------------------------------------

def frequencies(matrix, seq_weights, num_symbols):
    """Weighted single-site frequencies f_i (L x q) — reference
    align/alignment.py:1078-1106."""
    from evcouplings_tpu.ops.frequencies import frequencies as _kernel
    return _kernel(matrix, seq_weights, num_symbols)


def pair_frequencies(matrix, seq_weights, num_symbols, fi):
    """Weighted pair frequencies f_ij (L x L x q x q) — reference
    align/alignment.py:1109-1153."""
    from evcouplings_tpu.ops.frequencies import (
        pair_frequencies as _kernel,
    )
    return _kernel(matrix, seq_weights, num_symbols, fi)


def num_cluster_members(matrix, identity_threshold):
    """Neighbor counts at >= identity_threshold (the O(N^2 L)
    reweighting pass) — reference align/alignment.py:1192-1233."""
    from evcouplings_tpu.ops.weights import (
        num_cluster_members as _kernel,
    )
    return _kernel(matrix, identity_threshold)


def identities_to_seq(seq, matrix):
    """Absolute identity counts of every row to a target sequence —
    reference align/alignment.py:1156-1189."""
    from evcouplings_tpu.ops.weights import identities_to_seq as _kernel
    return _kernel(seq, matrix)

# constants (reference alignment.py:21-37)
GAP = "-"
MATCH_GAP = GAP
INSERT_GAP = "."

ALPHABET_PROTEIN_NOGAP = "ACDEFGHIKLMNPQRSTVWY"
ALPHABET_PROTEIN = GAP + ALPHABET_PROTEIN_NOGAP

# amino acid alphabet ordered by amino acid properties
ALPHABET_PROTEIN_NOGAP_ORDERED = "KRHEDNQTSCGAVLIMPYFW"
ALPHABET_PROTEIN_ORDERED = GAP + ALPHABET_PROTEIN_NOGAP_ORDERED

ALPHABET_DNA_NOGAP = "ACGT"
ALPHABET_DNA = GAP + ALPHABET_DNA_NOGAP

ALPHABET_RNA_NOGAP = "ACGU"
ALPHABET_RNA = GAP + ALPHABET_RNA_NOGAP

HMMER_PREFIX_WARNING = (
    "# WARNING: seq names have been made unique by adding a prefix of"
)


def read_fasta(fileobj):
    """Yield (id, sequence) tuples from a FASTA-family file (fasta/a2m/a3m)."""
    current_id = None
    current_seq = []

    for line in fileobj:
        if line.startswith(">"):
            if current_id is not None:
                yield current_id, "".join(current_seq)
            current_id = line.rstrip()[1:]
            current_seq = []
        elif not line.startswith(";"):
            current_seq.append(line.rstrip())

    yield current_id, "".join(current_seq)


def write_fasta(sequences, fileobj, width=80):
    """Write (id, sequence) tuples in FASTA format."""
    for seq_id, seq in sequences:
        fileobj.write(">{}\n".format(seq_id))
        fileobj.write(wrap(seq, width=width) + "\n")


def write_aln(sequences, fileobj, width=80):
    """Write sequences as a plain block matrix (ALN format, no headers)."""
    for _, seq in sequences:
        fileobj.write(seq + "\n")


# parsed Stockholm alignment: sequences plus the four markup namespaces
StockholmAlignment = namedtuple(
    "StockholmAlignment", ["seqs", "gf", "gc", "gs", "gr"]
)


def read_stockholm(fileobj, read_annotation=False, raise_hmmer_prefixes=True):
    """Yield StockholmAlignment tuples from a (possibly multi-)Stockholm file.

    Markup: #=GF per-file, #=GC per-column, #=GS per-sequence, #=GR
    per-residue. Truncated alignments (missing // terminator) are not
    yielded. Raises on HMMER made-unique prefix warnings when
    ``raise_hmmer_prefixes``.
    """
    seqs = DefaultOrderedDict(str)
    gf = DefaultOrderedDict(list)
    gc = DefaultOrderedDict(str)
    gs = DefaultOrderedDict(lambda: DefaultOrderedDict(list))
    gr = DefaultOrderedDict(lambda: DefaultOrderedDict(str))

    # line counter within the current alignment block
    i = 0

    for line in fileobj:
        if i == 0 and not line.startswith("# STOCKHOLM 1.0"):
            raise ValueError(
                "Not a valid Stockholm alignment: "
                "Header missing. {}".format(line.rstrip())
            )

        if raise_hmmer_prefixes and line.startswith(HMMER_PREFIX_WARNING):
            raise ValueError(
                "HMMER added identifier prefixes to alignment because of "
                "non-unique sequence identifiers. Please ensure unique "
                "sequence identifiers in the database and for the target."
            )

        if line.startswith("#"):
            if read_annotation:
                if line.startswith("#=GF"):
                    _, feat, val = line.rstrip().split(maxsplit=2)
                    gf[feat].append(val)
                elif line.startswith("#=GC"):
                    _, feat, seq = line.rstrip().split(maxsplit=2)
                    gc[feat] += seq
                elif line.startswith("#=GS"):
                    _, seq_id, feat, val = line.rstrip().split(maxsplit=3)
                    gs[seq_id][feat] = val
                elif line.startswith("#=GR"):
                    _, seq_id, feat, seq = line.rstrip().split()
                    gr[seq_id][feat] += seq
            i += 1
        elif line.startswith("//"):
            yield StockholmAlignment(seqs, gf, gc, gs, gr)
            # fresh containers for any further alignment in the same file
            seqs = DefaultOrderedDict(str)
            gf = DefaultOrderedDict(list)
            gc = DefaultOrderedDict(str)
            gs = DefaultOrderedDict(lambda: DefaultOrderedDict(list))
            gr = DefaultOrderedDict(lambda: DefaultOrderedDict(str))
            i = 0
        else:
            splitted = line.rstrip().split(maxsplit=2)
            if len(splitted) == 2:
                seq_id, seq = splitted
                seqs[seq_id] += seq
            i += 1


def read_a3m(fileobj, inserts="first"):
    """Read an a3m alignment and expand to a2m.

    inserts="first": keep insert columns present in the first (target)
    sequence, pad other sequences' match states into that template with
    "." insert gaps. inserts="delete": drop all lowercase/insert states.
    """
    seqs = OrderedDict()
    uppercase_cols = None
    gap_template = None

    for i, (seq_id, seq) in enumerate(read_fasta(fileobj)):
        seq = seq.replace(".", "")

        if inserts == "first":
            if i == 0:
                uppercase_cols = [
                    j for (j, c) in enumerate(seq)
                    if (c == c.upper() or c == "-")
                ]
                gap_template = np.array(["."] * len(seq))
                filled_seq = seq
            else:
                uppercase_chars = [
                    c for c in seq if c == c.upper() or c == "-"
                ]
                filled = np.copy(gap_template)
                filled[uppercase_cols] = uppercase_chars
                filled_seq = "".join(filled)
        elif inserts == "delete":
            filled_seq = "".join(
                [c for c in seq if c == c.upper() and c != "."]
            )
        else:
            raise ValueError("Invalid option for inserts: {}".format(inserts))

        seqs[seq_id] = filled_seq

    return seqs


def write_a3m(sequences, fileobj, insert_gap=INSERT_GAP, width=80):
    """Write sequences in a3m format (insert gaps removed)."""
    for seq_id, seq in sequences:
        fileobj.write(">{}\n".format(seq_id))
        fileobj.write(seq.replace(insert_gap, "") + "\n")


def detect_format(fileobj, filepath=""):
    """Detect alignment format: "stockholm", "a3m", "fasta", or None."""
    for i, line in enumerate(fileobj):
        if i == 0 and line.startswith("# STOCKHOLM 1.0"):
            return "stockholm"

        if line.startswith(">"):
            if Path(filepath).suffix.lower() == ".a3m":
                return "a3m"
            return "fasta"

        if line.startswith(";") or line.rstrip() == "":
            continue

        return None


def parse_header(header):
    """Split a "seqid/start-end" header into (id, start, stop).

    Any annotation after the first whitespace is discarded. start/stop are
    None if no range is present.
    """
    header = header.split()[0]
    m = re.search(r"(.+)/(\d+)-(\d+)", header)
    if m:
        id_, start_str, end_str = m.groups()
        return id_, int(start_str), int(end_str)
    return header, None, None


def sequences_to_matrix(sequences):
    """Stack aligned sequence strings into an N x L character matrix."""
    sequences = list(sequences)
    if len(sequences) == 0:
        raise ValueError("Need at least one sequence")

    N = len(sequences)
    L = len(sequences[0])
    matrix = np.empty((N, L), dtype=str)

    for i, seq in enumerate(sequences):
        if len(seq) != L:
            raise ValueError(
                "Sequences have differing lengths: i={} L_0={} L_i={}".format(
                    i, L, len(seq)
                )
            )
        matrix[i] = np.array(list(seq))

    return matrix


def map_from_alphabet(alphabet=ALPHABET_PROTEIN, default=GAP):
    """Character -> integer code mapping; unknown characters map to default."""
    map_ = {c: i for i, c in enumerate(alphabet)}
    try:
        default = map_[default]
    except KeyError:
        raise ValueError(
            "Default {} is not in alphabet {}".format(default, alphabet)
        )
    return defaultdict(lambda: default, map_)


def map_matrix(matrix, map_):
    """Remap a character matrix to integer codes using an alphabet map.

    Vectorized via a 256-entry lookup table over the characters'
    codepoints (all alignment alphabets are ASCII), avoiding a Python-level
    call per element.
    """
    matrix = np.asarray(matrix)
    lut = np.full(256, map_.default_factory(), dtype=np.int64)
    for c, i in map_.items():
        o = ord(c)
        if o < 256:
            lut[o] = i

    # view chars as uint32 codepoints; non-ASCII falls back to default
    codes = matrix.view(np.uint32).reshape(matrix.shape + (-1,))[..., 0]
    codes = np.where(codes < 256, codes, 0)
    return lut[codes.astype(np.int64)]


class Alignment:
    """Container to store and manipulate multiple sequence alignments.

    The character matrix stays on host (numpy); expensive numerics
    (weights, frequency counts) run on the accelerator via
    evcouplings_tpu.ops kernels.
    """

    def __init__(self, sequence_matrix, sequence_ids=None, annotation=None,
                 alphabet=ALPHABET_PROTEIN):
        self.matrix = np.array(sequence_matrix)
        self.N, self.L = self.matrix.shape

        self._match_gap = MATCH_GAP
        self._insert_gap = INSERT_GAP

        self.alphabet = alphabet
        self.alphabet_default = self._match_gap
        self.alphabet_map = map_from_alphabet(
            self.alphabet, default=self.alphabet_default
        )
        self.num_symbols = len(self.alphabet_map)

        # lazily computed quantities
        self.matrix_mapped = None
        self.num_cluster_members = None
        self.weights = None
        self._frequencies = None
        self._pair_frequencies = None

        if sequence_ids is None:
            self.ids = [str(i) for i in range(self.N)]
        else:
            sequence_ids = list(sequence_ids)
            if len(sequence_ids) != self.N:
                raise ValueError(
                    "Number of sequence IDs ({}) and length of alignment "
                    "({}) do not match".format(len(sequence_ids), self.N)
                )
            self.ids = sequence_ids

        self.ids = np.array(self.ids, dtype=np.object_)
        self.id_to_index = {id_: i for i, id_ in enumerate(self.ids)}

        self.annotation = annotation if annotation is not None else {}

    @classmethod
    def from_dict(cls, sequences, **kwargs):
        """Create an alignment from an {id: sequence} mapping."""
        matrix = sequences_to_matrix(sequences.values())
        return cls(matrix, sequences.keys(), **kwargs)

    @classmethod
    def from_file(cls, fileobj, format="fasta", a3m_inserts="first",
                  raise_hmmer_prefixes=True, split_header=False, **kwargs):
        """Create an alignment by parsing a fasta/stockholm/a3m file."""
        annotation = {}

        if format == "fasta":
            seqs = OrderedDict(read_fasta(fileobj))
        elif format == "stockholm":
            ali = next(
                read_stockholm(
                    fileobj, read_annotation=True,
                    raise_hmmer_prefixes=raise_hmmer_prefixes,
                )
            )
            seqs = ali.seqs
            annotation["GF"] = ali.gf
            annotation["GC"] = ali.gc
            annotation["GS"] = ali.gs
            annotation["GR"] = ali.gr
            kwargs["annotation"] = annotation
        elif format == "a3m":
            seqs = read_a3m(fileobj, inserts=a3m_inserts)
        else:
            raise ValueError("Invalid alignment format: {}".format(format))

        if split_header:
            seqs = {
                header.split()[0]: seq for header, seq in seqs.items()
            }

        return cls.from_dict(seqs, **kwargs)

    @classmethod
    def from_path(cls, path, format=None, split_header=False, **kwargs):
        """Create an alignment from a file path.

        For plain FASTA/aligned A2M files this uses the native
        single-pass C loader (evcouplings_tpu.native) when it is
        built, falling back to the Python parsers for everything else
        (stockholm annotation, a3m inserts, ragged input, ext not
        built). Behavior is identical to from_file on an open handle.
        """
        if format is None:
            with open(path) as f:
                format = detect_format(f, filepath=path)
            if format is None:
                raise ValueError(
                    "Format of alignment {} could not be "
                    "automatically detected.".format(path)
                )

        if format == "fasta":
            from evcouplings_tpu.native import (
                HAVE_NATIVE, parse_fasta_native,
            )

            if HAVE_NATIVE:
                try:
                    ids, matrix = parse_fasta_native(path)
                except ValueError:
                    ids = None  # ragged (a3m-style): Python fallback
                if ids is not None:
                    if split_header:
                        ids = [i.split()[0] for i in ids]
                    # duplicate headers: the Python path builds an
                    # OrderedDict — first occurrence keeps its
                    # position, last occurrence supplies the sequence
                    # — replicate that so results do not depend on
                    # whether the C extension is built
                    if len(set(ids)) != len(ids):
                        last = {id_: k for k, id_ in enumerate(ids)}
                        seen = set()
                        order = [
                            id_ for id_ in ids
                            if not (id_ in seen or seen.add(id_))
                        ]
                        matrix = matrix[[last[i] for i in order]]
                        ids = order
                    # drop from_file-only kwargs the constructor does
                    # not take (same filtering the stockholm branch
                    # does), so behavior matches the fallback path
                    ctor_kwargs = {
                        k: v for k, v in kwargs.items()
                        if k not in (
                            "raise_hmmer_prefixes", "a3m_inserts",
                        )
                    }
                    return cls(matrix, ids, **ctor_kwargs)

        if format == "stockholm":
            from evcouplings_tpu.native import (
                HAVE_NATIVE_STOCKHOLM, parse_stockholm_native,
            )

            if HAVE_NATIVE_STOCKHOLM:
                rhp = kwargs.get("raise_hmmer_prefixes", True)
                try:
                    ids, matrix, annotation = parse_stockholm_native(
                        path, raise_hmmer_prefixes=rhp,
                    )
                except ValueError as e:
                    if "HMMER added identifier prefixes" in str(e):
                        raise
                    ids = None  # unsupported layout: Python fallback
                if ids is not None:
                    if split_header:
                        ids = [i.split()[0] for i in ids]
                    ctor_kwargs = {
                        k: v for k, v in kwargs.items()
                        if k not in (
                            "raise_hmmer_prefixes", "a3m_inserts",
                        )
                    }
                    return cls(
                        matrix, ids, annotation=annotation,
                        **ctor_kwargs
                    )

        with open(path) as f:
            return cls.from_file(
                f, format=format, split_header=split_header, **kwargs
            )

    def __getitem__(self, index):
        if index in self.id_to_index:
            return self.matrix[self.id_to_index[index], :]
        elif isinstance(index, (int, np.integer)) and 0 <= index < self.N:
            return self.matrix[index, :]
        raise KeyError(
            "Not a valid index for sequence alignment: {}".format(index)
        )

    def __len__(self):
        return self.N

    def count(self, char, axis="pos", normalize=True):
        """Count (optionally relative) occurrences of a character along an axis."""
        if axis == "pos":
            naxis = 0
        elif axis == "seq":
            naxis = 1
        else:
            raise ValueError("Invalid axis: {}".format(axis))

        c = np.sum(self.matrix == char, axis=naxis)
        if normalize:
            c = c / self.matrix.shape[naxis]
        return c

    def select(self, columns=None, sequences=None):
        """Sub-alignment with a subset of columns and/or sequences
        (annotation is dropped, indices are not renumbered)."""
        if columns is None and sequences is None:
            return self

        sel_matrix = self.matrix
        ids = self.ids

        if columns is not None:
            sel_matrix = sel_matrix[:, columns]
        if sequences is not None:
            sel_matrix = sel_matrix[sequences, :]
            ids = ids[sequences]

        return Alignment(
            np.copy(sel_matrix), np.copy(ids), alphabet=self.alphabet
        )

    def apply(self, columns=None, sequences=None, func=np.char.lower):
        """Apply a vectorized function to selected columns and/or rows
        (applied independently, columns first). Keeps annotation."""
        if columns is None and sequences is None:
            return self

        mod_matrix = np.copy(self.matrix)
        # guard empty selections: np.char funcs reject zero-size arrays
        if columns is not None and mod_matrix[:, columns].size > 0:
            mod_matrix[:, columns] = func(mod_matrix[:, columns])
        if sequences is not None and mod_matrix[sequences, :].size > 0:
            mod_matrix[sequences, :] = func(mod_matrix[sequences, :])

        return Alignment(
            mod_matrix, deepcopy(self.ids), deepcopy(self.annotation),
            alphabet=self.alphabet,
        )

    def replace(self, original, replacement, columns=None, sequences=None):
        """Replace a character in the full matrix or a subset."""
        return self.apply(
            columns, sequences,
            func=lambda x: np.char.replace(x, original, replacement),
        )

    def lowercase_columns(self, columns):
        """Lowercase a subset of columns and turn "-" into "." there
        (marks them as excluded from EC calculation)."""
        return self.apply(
            columns=columns, func=np.char.lower
        ).replace(
            self._match_gap, self._insert_gap, columns=columns
        )

    def _ensure_mapped_matrix(self):
        if self.matrix_mapped is None:
            self.matrix_mapped = map_matrix(self.matrix, self.alphabet_map)

    def set_weights(self, identity_threshold=0.8):
        """Compute clustering-based sequence weights on the accelerator.

        weight(s) = 1 / #{s': seqid(s, s') >= identity_threshold}; sets
        self.weights / self.num_cluster_members, resets cached frequencies.
        Semantics match reference alignment.py:899-930 + 1192-1233 (gap
        positions participate in the identity count).
        """
        from evcouplings_tpu.ops.weights import num_cluster_members

        self._ensure_mapped_matrix()
        self.num_cluster_members = np.asarray(
            num_cluster_members(self.matrix_mapped, identity_threshold)
        )
        self.weights = 1.0 / self.num_cluster_members

        self._frequencies = None
        self._pair_frequencies = None

    @property
    def frequencies(self):
        """Weighted single-site frequencies (L x num_symbols), computed on
        the accelerator. Uses self.weights if set_weights() was called."""
        if self._frequencies is None:
            from evcouplings_tpu.ops.frequencies import frequencies

            self._ensure_mapped_matrix()
            weights = (
                np.ones(self.N) if self.weights is None else self.weights
            )
            self._frequencies = np.asarray(
                frequencies(self.matrix_mapped, weights, self.num_symbols)
            )
        return self._frequencies

    @property
    def pair_frequencies(self):
        """Weighted pairwise frequencies (L x L x q x q) with
        f_ij[i,i,a,a] = f_i[i,a] on the diagonal."""
        if self._pair_frequencies is None:
            from evcouplings_tpu.ops.frequencies import pair_frequencies

            self._ensure_mapped_matrix()
            weights = (
                np.ones(self.N) if self.weights is None else self.weights
            )
            self._pair_frequencies = np.asarray(
                pair_frequencies(
                    self.matrix_mapped, weights,
                    self.num_symbols, self.frequencies,
                )
            )
        return self._pair_frequencies

    def identities_to(self, seq, normalize=True):
        """Sequence identity of every alignment row to the given sequence."""
        from evcouplings_tpu.ops.weights import identities_to_seq

        self._ensure_mapped_matrix()
        seq = np.array(list(seq))
        seq_mapped = map_matrix(seq, self.alphabet_map)
        ids = np.asarray(identities_to_seq(seq_mapped, self.matrix_mapped))

        if normalize:
            return ids / self.L
        return ids

    def conservation(self, normalize=True):
        """Per-column conservation from single-column frequency entropy."""
        return entropy_rows(self.frequencies, normalize=normalize)

    def write(self, fileobj, format="fasta", width=80):
        """Write alignment in fasta, a3m, or aln format."""
        seqs = (
            (id_, "".join(self.matrix[i]))
            for (i, id_) in enumerate(self.ids)
        )

        if format == "fasta":
            write_fasta(seqs, fileobj, width)
        elif format == "a3m":
            write_a3m(seqs, fileobj, self._insert_gap, width)
        elif format == "aln":
            write_aln(seqs, fileobj, width)
        else:
            raise ValueError("Invalid alignment format: {}".format(format))
