"""
Alignment-stage protocols: build or ingest a multiple sequence alignment,
focus it on the target sequence, filter, and emit statistics.

Parity target: reference evcouplings/align/protocol.py — existing
(:635-803), modify_alignment (:806-1016), jackhmmer_search (:1019-1170),
hmmbuild_and_search (:1173-1431), standard (:1434-1543), complex
(:1546-1647), stats writers (:400-633), sequence helpers (:181-310,
search_thresholds :311-398), PROTOCOLS/run (:1651-1707).

The hermetic path (no external binaries) is the `existing` protocol;
jackhmmer/hmmsearch/hhfilter remain external subprocesses. All numeric
work (identities, frequencies, conservation, N_eff) runs on the
accelerator kernels via the Alignment container.
"""

import os
import re
from collections import OrderedDict
from collections.abc import Iterable
from shutil import copy

import numpy as np
import pandas as pd

from evcouplings_tpu.align import tools as at
from evcouplings_tpu.align.alignment import (
    Alignment,
    detect_format,
    parse_header,
    read_fasta,
    write_fasta,
)
from evcouplings_tpu.couplings.mapping import Segment
from evcouplings_tpu.utils import BailoutException
from evcouplings_tpu.utils.config import (
    InvalidParameterError,
    MissingParameterError,
    check_required,
    read_config_file,
    write_config_file,
)
from evcouplings_tpu.utils.system import (
    ResourceError,
    create_prefix_folders,
    get,
    valid_file,
    verify_resources,
)


def _verify_sequence_id(sequence_id):
    """Reject missing / whitespace-containing target identifiers."""
    if sequence_id is None:
        raise InvalidParameterError(
            "Target sequence identifier (sequence_id) must be defined and "
            "cannot be None/null."
        )
    if not isinstance(sequence_id, str):
        raise InvalidParameterError(
            "Target sequence identifier (sequence_id) must be a string"
        )
    if len(sequence_id.split()) != 1 or sequence_id != sequence_id.strip():
        raise InvalidParameterError(
            "Target sequence identifier (sequence_id) may not contain any "
            "whitespace (spaces, tabs, ...)"
        )


def fetch_sequence(sequence_id, sequence_file, sequence_download_url,
                   out_file):
    """Obtain the target sequence from a local file or by download.

    Returns (path, (header, sequence)). Parity: reference
    protocol.py:181-236.
    """
    if sequence_file is None:
        get(
            sequence_download_url.format(sequence_id),
            out_file,
            allow_redirects=True,
        )
    else:
        try:
            copy(sequence_file, out_file)
        except FileNotFoundError:
            raise ResourceError(
                "sequence_file does not exist: {}".format(sequence_file)
            )

    verify_resources("Input sequence missing", out_file)

    with open(out_file) as f:
        seq = next(read_fasta(f))
    return out_file, seq


def cut_sequence(sequence, sequence_id, region=None, first_index=None,
                 out_file=None):
    """Cut a sequence to a subregion (inclusive end) and optionally save
    it with a `>id/start-end` header.

    Returns ((start, end), subsequence). Parity: protocol.py:238-308.
    """
    if first_index is None:
        first_index = 1

    if region is None:
        region = (first_index, first_index + len(sequence) - 1)
        cut_seq = sequence
    else:
        start, end = region
        str_start = start - first_index
        str_end = end - first_index + 1
        cut_seq = sequence[str_start:str_end]
        if str_start < 0 or str_end > len(sequence):
            raise InvalidParameterError(
                "Invalid sequence range: "
                "region={} first_index={} len(sequence)={}".format(
                    region, first_index, len(sequence)
                )
            )

    if out_file is not None:
        with open(out_file, "w") as f:
            header = "{}/{}-{}".format(sequence_id, *region)
            write_fasta([(header, cut_seq)], f)

    return region, cut_seq


def search_thresholds(use_bitscores, seq_threshold, domain_threshold,
                      seq_len):
    """Normalize HMMER inclusion thresholds to command-line strings.

    Bitscores: floats are relative (multiplied by seq_len), ints/strings
    absolute. E-values: ints are negative exponents (2 -> "1E-2"),
    floats/strings literal. The sequence-level threshold defaults to the
    domain-level one. Parity: protocol.py:311-398.
    """
    def transform_bitscore(x):
        if isinstance(x, float):
            return "{:.1f}".format(x * seq_len)
        return str(x)

    def transform_evalue(x):
        if isinstance(x, int):
            return "1E{}".format(-x)
        return str(x).upper()

    if domain_threshold is None:
        raise MissingParameterError(
            "domain_threshold must be explicitly defined "
            "and may not be None/empty"
        )

    transform = transform_bitscore if use_bitscores else transform_evalue

    if seq_threshold is not None:
        seq_threshold = transform(seq_threshold)
    domain_threshold = transform(domain_threshold)

    if seq_threshold is None:
        seq_threshold = domain_threshold

    return seq_threshold, domain_threshold


# annotation fields extracted from UniProt/UniRef headers
_ANNOTATION_COLUMNS = OrderedDict([
    ("GN", "gene"),
    ("OS", "organism"),
    ("PE", "existence_evidence"),
    ("SV", "sequence_version"),
    ("n", "num_cluster_members"),
    ("Tax", "taxon"),
    ("RepID", "representative_member"),
])


def extract_header_annotation(alignment, from_annotation=True):
    """Parse UniProt/UniRef `KEY=value` annotations out of sequence
    headers (or Stockholm GS DE lines) into a DataFrame.

    Parity: protocol.py:398-471.
    """
    regex = re.compile(r"\s({})=".format("|".join(_ANNOTATION_COLUMNS)))
    res = []

    for id_ in alignment.ids:
        if from_annotation:
            seq_id = id_
            anno = None
            gs = alignment.annotation.get("GS", {})
            if id_ in gs and "DE" in gs[id_]:
                anno = gs[id_]["DE"]
        else:
            split = id_.split(maxsplit=1)
            if len(split) == 2:
                seq_id, anno = split
            else:
                seq_id, anno = id_, None

        if anno is not None:
            pairs = re.split(regex, anno)
            pairs = ["id", seq_id, "name"] + pairs
            res.append(dict(zip(pairs[::2], pairs[1::2])))
        else:
            res.append({"id": seq_id})

    df = pd.DataFrame(res)
    return df.reindex(
        ["id", "name"] + list(_ANNOTATION_COLUMNS), axis=1
    )


def describe_seq_identities(alignment, target_seq_index=0):
    """Identity of every sequence to the target sequence (accelerator
    kernel). Parity: protocol.py:474-499."""
    id_to_query = alignment.identities_to(alignment[target_seq_index])
    return pd.DataFrame(
        {"id": alignment.ids, "identity_to_query": id_to_query}
    )


def describe_frequencies(alignment, first_index, target_seq_index=None):
    """Per-position symbol frequencies + conservation table.

    Lowercase (non-match) positions get NaN statistics.
    Parity: protocol.py:501-553.
    """
    fi = alignment.frequencies
    conservation = alignment.conservation()

    fi_cols = {
        c: fi[:, alignment.alphabet_map[c]] for c in alignment.alphabet
    }

    if target_seq_index is not None:
        target_seq = alignment[target_seq_index]
    else:
        target_seq = np.full((alignment.L,), np.nan)

    info = pd.DataFrame({
        "i": range(first_index, first_index + alignment.L),
        "A_i": target_seq,
        "conservation": conservation,
        **fi_cols,
    }).loc[:, ["i", "A_i", "conservation"] + list(alignment.alphabet)]

    info.loc[
        info.A_i.str.lower() == info.A_i,
        ["conservation"] + list(alignment.alphabet),
    ] = np.nan

    return info


def describe_coverage(alignment, prefix, first_index,
                      minimum_column_coverage):
    """buildali-style coverage statistics table, one row per column-
    coverage threshold. Parity: protocol.py:555-633."""
    res = []
    NO_MEFF = np.nan

    if not isinstance(minimum_column_coverage, Iterable):
        minimum_column_coverage = [minimum_column_coverage]

    pos = np.arange(first_index, first_index + alignment.L)
    f_gap = alignment.frequencies[
        :, alignment.alphabet_map[alignment._match_gap]
    ]

    for threshold in minimum_column_coverage:
        if isinstance(threshold, int):
            threshold /= 100

        uppercase = f_gap <= 1 - threshold
        uppercase_idx = np.nonzero(uppercase)[0]

        cov_first_idx, cov_last_idx = uppercase_idx[0], uppercase_idx[-1]
        first, last = pos[cov_first_idx], pos[cov_last_idx]
        num_lc_cov = np.sum(~uppercase[cov_first_idx:cov_last_idx + 1])

        num_cov = uppercase.sum()
        num_lc = (~uppercase).sum()
        perc_cov = num_cov / len(uppercase)

        res.append(
            (prefix, threshold, alignment.N, alignment.L,
             num_cov, num_lc, perc_cov, first, last,
             last - first + 1, num_lc_cov, NO_MEFF)
        )

    return pd.DataFrame(
        res, columns=[
            "prefix", "minimum_column_coverage", "num_seqs",
            "seqlen", "num_cov", "num_lc", "perc_cov",
            "1st_uc", "last_uc", "len_cov", "num_lc_cov", "N_eff",
        ]
    )


def modify_alignment(focus_ali, target_seq_index, target_seq_id,
                     region_start, **kwargs):
    """Apply identity/fragment/column-coverage filtering to a focus
    alignment and write statistics + the final .a2m.

    Returns (outcfg, alignment). Parity: protocol.py:806-1016.
    """
    check_required(
        kwargs,
        [
            "prefix", "seqid_filter", "hhfilter",
            "minimum_sequence_coverage", "minimum_column_coverage",
            "compute_num_effective_seqs", "theta",
        ],
    )

    prefix = kwargs["prefix"]
    create_prefix_folders(prefix)

    focus_fasta_file = prefix + "_raw_focus.fasta"

    outcfg = {
        "alignment_file": prefix + ".a2m",
        "statistics_file": prefix + "_alignment_statistics.csv",
        "frequencies_file": prefix + "_frequencies.csv",
        "identities_file": prefix + "_identities.csv",
        "raw_focus_alignment_file": focus_fasta_file,
    }

    # move the target sequence to row 0 (required so hhfilter cannot
    # drop it, and so downstream target_seq_index is always 0)
    if target_seq_index != 0:
        indices = np.arange(0, len(focus_ali))
        indices[0] = target_seq_index
        indices[target_seq_index] = 0
        target_seq_index = 0
        focus_ali = focus_ali.select(sequences=indices)

    with open(focus_fasta_file, "w") as f:
        focus_ali.write(f, "fasta")

    # optional pairwise identity filter via external hhfilter
    if kwargs["seqid_filter"] is not None:
        filtered_file = prefix + "_filtered.a3m"
        at.run_hhfilter(
            focus_fasta_file, filtered_file,
            threshold=kwargs["seqid_filter"],
            columns="first", binary=kwargs["hhfilter"],
        )
        with open(filtered_file) as f:
            focus_ali = Alignment.from_file(f, "a3m")

        filtered_fasta_file = prefix + "_raw_focus_filtered.fasta"
        with open(filtered_fasta_file, "w") as f:
            focus_ali.write(f, "fasta")

    ali = focus_ali

    # fragment filter: drop rows covering too little of the target
    min_cov = kwargs["minimum_sequence_coverage"]
    if min_cov is not None:
        if isinstance(min_cov, int):
            min_cov /= 100
        keep_seqs = (1 - ali.count("-", axis="seq")) >= min_cov
        ali = ali.select(sequences=keep_seqs)

    describe_seq_identities(
        ali, target_seq_index=target_seq_index
    ).to_csv(outcfg["identities_file"], float_format="%.3f", index=False)

    describe_frequencies(
        ali, region_start, target_seq_index=target_seq_index
    ).to_csv(outcfg["frequencies_file"], float_format="%.3f", index=False)

    coverage_stats = describe_coverage(
        ali, prefix, region_start, kwargs["minimum_column_coverage"]
    )

    pos_list = np.arange(region_start, region_start + ali.L, dtype="int32")

    # lowercase columns exceeding the gap threshold
    min_col_cov = kwargs["minimum_column_coverage"]
    if min_col_cov is not None:
        if isinstance(min_col_cov, int):
            min_col_cov /= 100
        lc_cols = ali.count(ali._match_gap, axis="pos") > 1 - min_col_cov
        ali = ali.lowercase_columns(lc_cols)
        pos_list = pos_list[~lc_cols]
    else:
        lc_cols = None

    # optional N_eff computation on the inference columns
    if kwargs["compute_num_effective_seqs"]:
        cut_ali = ali if lc_cols is None else ali.select(columns=~lc_cols)
        cut_ali.set_weights(kwargs["theta"])
        n_eff = float(cut_ali.weights.sum())
        coverage_stats.loc[:, "N_eff"] = n_eff

        outcfg["sequence_weights_file"] = (
            prefix + "_inverse_sequence_weights.csv"
        )
        pd.DataFrame({
            "id": cut_ali.ids,
            "num_cluster_members": cut_ali.num_cluster_members,
        }).to_csv(outcfg["sequence_weights_file"], index=False)
    else:
        n_eff = None

    coverage_stats.to_csv(
        outcfg["statistics_file"], float_format="%.3f", index=False
    )

    outcfg.update({
        "num_sites": len(pos_list),
        "num_sequences": len(ali),
        "effective_sequences": n_eff,
        "region_start": region_start,
    })

    outcfg["segments"] = [
        Segment(
            "aa", target_seq_id, region_start,
            region_start + ali.L - 1, pos_list,
        ).to_list()
    ]

    with open(outcfg["alignment_file"], "w") as f:
        ali.write(f, "fasta")

    return outcfg, ali


def existing(**kwargs):
    """Protocol: start from a user-supplied alignment, focus on the
    target sequence, then filter as usual.

    This is the hermetic entry point of the pipeline (no external
    binaries needed). Parity: protocol.py:635-803.
    """
    check_required(
        kwargs,
        ["prefix", "input_alignment", "sequence_id", "first_index",
         "extract_annotation"],
    )

    prefix = kwargs["prefix"]
    create_prefix_folders(prefix)

    input_alignment = kwargs["input_alignment"]
    verify_resources("Input alignment does not exist", input_alignment)

    with open(input_alignment) as f:
        format = detect_format(f, filepath=input_alignment)
        if format is None:
            raise InvalidParameterError(
                "Format of input alignment {} could not be "
                "automatically detected.".format(input_alignment)
            )

    ali_raw = Alignment.from_path(input_alignment, format)

    annotation_file = None
    if kwargs["extract_annotation"]:
        annotation_file = prefix + "_annotation.csv"
        from_anno_line = (format == "stockholm")
        extract_header_annotation(
            ali_raw, from_annotation=from_anno_line
        ).to_csv(annotation_file, index=False)

    sequence_id = kwargs["sequence_id"]
    _verify_sequence_id(sequence_id)

    # locate target sequence by identifier prefix
    focus_index = None
    for i, id_ in enumerate(ali_raw.ids):
        if id_.startswith(sequence_id):
            focus_index = i
            break
    if focus_index is None:
        raise InvalidParameterError(
            "Target sequence {} could not be found in alignment".format(
                sequence_id
            )
        )

    # focus columns: positions where the target is not gapped
    focus_seq = ali_raw[focus_index]
    focus_cols = np.array([
        c not in (ali_raw._match_gap, ali_raw._insert_gap)
        for c in focus_seq
    ])
    focus_ali = ali_raw.select(columns=focus_cols)
    focus_seq_nogap = "".join(focus_ali[focus_index])

    # determine target numbering from header or first_index override
    full_focus_header = ali_raw.ids[focus_index]
    focus_id = full_focus_header.split()[0]
    id_, region_start, region_end = parse_header(focus_id)

    if kwargs["first_index"] is not None:
        region_start = kwargs["first_index"]
        region_end = region_start + len(focus_seq_nogap) - 1

    if region_start is None or region_end is None:
        raise InvalidParameterError(
            "Could not extract region information "
            "from sequence header {} "
            "and first_index parameter is not given.".format(
                full_focus_header
            )
        )

    header = "{}/{}-{}".format(id_, region_start, region_end)
    focus_ali.ids[focus_index] = header

    target_sequence_file = prefix + ".fa"
    with open(target_sequence_file, "w") as f:
        write_fasta([(header, focus_seq_nogap)], f)

    mod_outcfg, ali = modify_alignment(
        focus_ali, focus_index, id_, region_start, **kwargs
    )

    outcfg = {
        **mod_outcfg,
        "sequence_id": sequence_id,
        "sequence_file": target_sequence_file,
        "first_index": region_start,
        "target_sequence_file": target_sequence_file,
        "focus_sequence": header,
        "focus_mode": True,
    }
    if annotation_file is not None:
        outcfg["annotation_file"] = annotation_file

    write_config_file(prefix + ".align_existing.outcfg", outcfg)
    return outcfg


def jackhmmer_search(**kwargs):
    """Protocol: iterative jackhmmer search against a sequence database.

    Parity: protocol.py:1019-1170 (incl. reuse_alignment restart from the
    saved search outcfg).
    """
    check_required(
        kwargs,
        [
            "prefix", "sequence_id", "sequence_file",
            "sequence_download_url", "region", "first_index",
            "use_bitscores", "domain_threshold", "sequence_threshold",
            "database", "iterations", "cpu", "nobias", "reuse_alignment",
            "checkpoints_hmm", "checkpoints_ali", "jackhmmer",
            "extract_annotation",
        ],
    )
    prefix = kwargs["prefix"]
    _verify_sequence_id(kwargs["sequence_id"])
    create_prefix_folders(prefix)

    target_sequence_file = prefix + ".fa"
    full_sequence_file = prefix + "_full.fa"

    full_seq_file, (full_seq_id, full_seq) = fetch_sequence(
        kwargs["sequence_id"],
        kwargs["sequence_file"],
        kwargs["sequence_download_url"],
        full_sequence_file,
    )

    (region_start, region_end), cut_seq = cut_sequence(
        full_seq,
        kwargs["sequence_id"],
        kwargs["region"],
        kwargs["first_index"],
        target_sequence_file,
    )

    ali_outcfg_file = prefix + ".align_jackhmmer_search.outcfg"

    if kwargs["reuse_alignment"] and valid_file(ali_outcfg_file):
        ali = read_config_file(ali_outcfg_file)
        verify_resources(
            "Tried to reuse alignment, but empty or does not exist",
            ali["alignment"], ali["domtblout"],
        )
    else:
        seq_threshold, domain_threshold = search_thresholds(
            kwargs["use_bitscores"],
            kwargs["sequence_threshold"],
            kwargs["domain_threshold"],
            len(cut_seq),
        )

        ali = at.run_jackhmmer(
            query=target_sequence_file,
            database=kwargs[kwargs["database"]],
            prefix=prefix,
            use_bitscores=kwargs["use_bitscores"],
            domain_threshold=domain_threshold,
            seq_threshold=seq_threshold,
            iterations=kwargs["iterations"],
            nobias=kwargs["nobias"],
            cpu=kwargs["cpu"],
            checkpoints_hmm=kwargs["checkpoints_hmm"],
            checkpoints_ali=kwargs["checkpoints_ali"],
            binary=kwargs["jackhmmer"],
        )

        # drop the bulky stdout log immediately
        try:
            os.remove(ali.output)
        except OSError:
            pass

        ali = dict(ali._asdict())
        write_config_file(ali_outcfg_file, ali)

    outcfg = {
        "sequence_id": kwargs["sequence_id"],
        "target_sequence_file": target_sequence_file,
        "sequence_file": full_sequence_file,
        "first_index": kwargs["first_index"],
        "focus_mode": True,
        "raw_alignment_file": ali["alignment"],
        "hittable_file": ali["domtblout"],
        "segments": [
            Segment(
                "aa", kwargs["sequence_id"], region_start, region_end,
                range(region_start, region_end + 1),
            ).to_list()
        ],
        "focus_sequence": "{}/{}-{}".format(
            kwargs["sequence_id"], region_start, region_end
        ),
    }
    return outcfg


def _make_hmmsearch_raw_fasta(alignment_result, prefix):
    """Prepend the (RF-gapped) query sequence to an hmmsearch Stockholm
    result and save as FASTA, so downstream focusing/numbering works.

    Parity: protocol.py:81-178.
    """
    with open(alignment_result["target_sequence_file"]) as a:
        query_ali = Alignment.from_file(a, format="fasta")

    raw_focus_alignment_file = prefix + "_raw.fasta"
    if not valid_file(alignment_result["raw_alignment_file"]):
        # empty search result: alignment is just the query
        with open(raw_focus_alignment_file, "w") as of:
            query_ali.write(of)
        return raw_focus_alignment_file

    ali = Alignment.from_path(
        alignment_result["raw_alignment_file"], "stockholm"
    )

    if not ("GC" in ali.annotation and "RF" in ali.annotation["GC"]):
        raise ValueError(
            "Stockholm alignment {} missing RF annotation of match "
            "states".format(alignment_result["raw_alignment_file"])
        )

    rf = ali.annotation["GC"]["RF"]
    match_cols = [x == "x" for x in rf]
    if sum(match_cols) != query_ali.L:
        raise ValueError(
            "HMMsearch result {} does not have a one-to-one mapping to "
            "the query sequence columns".format(
                alignment_result["raw_alignment_file"]
            )
        )

    # distribute query residues over match states, gaps elsewhere
    seq_iter = iter(query_ali.matrix[0, :])
    gapped_query = "".join(
        next(seq_iter) if is_match else "-" for is_match in match_cols
    )

    query_gapped_ali = Alignment.from_dict({
        query_ali.ids[0]: gapped_query
    })

    with open(raw_focus_alignment_file, "w") as of:
        query_gapped_ali.write(of)
        ali.write(of)
    return raw_focus_alignment_file


def hmmbuild_and_search(**kwargs):
    """Protocol: build an HMM from an input alignment and search it
    against a sequence database.

    Parity: protocol.py:1173-1431.
    """
    SYMFRAC_HMMBUILD = 0.0

    check_required(
        kwargs,
        [
            "prefix", "sequence_id", "alignment_file",
            "use_bitscores", "domain_threshold", "sequence_threshold",
            "database", "cpu", "nobias", "reuse_alignment",
            "hmmbuild", "hmmsearch",
        ],
    )
    prefix = kwargs["prefix"]
    _verify_sequence_id(kwargs["sequence_id"])
    create_prefix_folders(prefix)

    # --- focus the input alignment on the target sequence ---
    input_alignment_file = kwargs["alignment_file"]
    verify_resources("Input alignment does not exist", input_alignment_file)

    with open(input_alignment_file) as f:
        format = detect_format(f)
        if format is None:
            raise InvalidParameterError(
                "Format of input alignment {} could not be "
                "automatically detected.".format(input_alignment_file)
            )
    ali_raw = Alignment.from_path(input_alignment_file, format)

    sequence_id = kwargs["sequence_id"]
    focus_index = None
    for i, id_ in enumerate(ali_raw.ids):
        if id_.startswith(sequence_id):
            focus_index = i
            break
    if focus_index is None:
        raise InvalidParameterError(
            "Target sequence {} could not be found in alignment".format(
                sequence_id
            )
        )

    focus_seq = ali_raw[focus_index]
    focus_cols = np.array([
        c not in (ali_raw._match_gap, ali_raw._insert_gap)
        for c in focus_seq
    ])
    focus_ali = ali_raw.select(columns=focus_cols)
    focus_seq_nogap = "".join(focus_ali[focus_index])

    full_focus_header = ali_raw.ids[focus_index]
    focus_id = full_focus_header.split()[0]
    id_, region_start, region_end = parse_header(focus_id)

    if kwargs["first_index"] is not None and (
        region_start is None or region_end is None
    ):
        region_start = kwargs["first_index"]
        region_end = region_start + len(focus_seq_nogap) - 1

    if region_start is None or region_end is None:
        raise InvalidParameterError(
            "Could not extract region information "
            "from sequence header {} "
            "and first_index parameter is not given.".format(
                full_focus_header
            )
        )

    header = "{}/{}-{}".format(id_, region_start, region_end)
    focus_ali.ids[focus_index] = header

    target_sequence_file = prefix + ".fa"
    with open(target_sequence_file, "w") as f:
        write_fasta([(header, focus_seq_nogap)], f)

    if focus_index != 0:
        indices = np.arange(0, len(focus_ali))
        indices[0] = focus_index
        indices[focus_index] = 0
        focus_ali = focus_ali.select(sequences=indices)

    focus_fasta_file = prefix + "_raw_focus_input.fasta"
    with open(focus_fasta_file, "w") as f:
        focus_ali.write(f, "fasta")

    # --- hmmbuild + hmmsearch (or restart from saved outcfg) ---
    ali_outcfg_file = prefix + ".align_hmmbuild_and_search.outcfg"

    if kwargs["reuse_alignment"] and valid_file(ali_outcfg_file):
        ali = read_config_file(ali_outcfg_file)
        verify_resources(
            "Tried to reuse alignment, but empty or does not exist",
            ali["alignment"], ali["domtblout"],
        )
    else:
        sequence_length = region_end - region_start + 1
        seq_threshold, domain_threshold = search_thresholds(
            kwargs["use_bitscores"],
            kwargs["sequence_threshold"],
            kwargs["domain_threshold"],
            sequence_length,
        )

        hmmbuild_result = at.run_hmmbuild(
            alignment_file=focus_fasta_file,
            prefix=prefix,
            symfrac=SYMFRAC_HMMBUILD,
            cpu=kwargs["cpu"],
            binary=kwargs["hmmbuild"],
        )
        hmmfile = hmmbuild_result.hmmfile

        ali = at.run_hmmsearch(
            hmmfile=hmmfile,
            database=kwargs[kwargs["database"]],
            prefix=prefix,
            use_bitscores=kwargs["use_bitscores"],
            domain_threshold=domain_threshold,
            seq_threshold=seq_threshold,
            nobias=kwargs["nobias"],
            cpu=kwargs["cpu"],
            binary=kwargs["hmmsearch"],
        )

        try:
            os.remove(ali.output)
        except OSError:
            pass

        ali = dict(ali._asdict())
        ali["hmmfile"] = hmmfile
        write_config_file(ali_outcfg_file, ali)

    outcfg = {
        "sequence_file": target_sequence_file,
        "first_index": region_start,
        "input_raw_focus_alignment": focus_fasta_file,
        "target_sequence_file": target_sequence_file,
        "focus_mode": True,
        "raw_alignment_file": ali["alignment"],
        "hittable_file": ali["domtblout"],
    }
    outcfg["raw_focus_alignment_file"] = _make_hmmsearch_raw_fasta(
        outcfg, prefix
    )
    outcfg["segments"] = [
        Segment(
            "aa", kwargs["sequence_id"], region_start, region_end,
            range(region_start, region_end + 1),
        ).to_list()
    ]
    outcfg["focus_sequence"] = "{}/{}-{}".format(
        kwargs["sequence_id"], region_start, region_end
    )
    return outcfg


def standard(**kwargs):
    """Protocol: jackhmmer search, then focus/filter the result
    (buildali4 workflow). Parity: protocol.py:1434-1543."""
    check_required(kwargs, ["prefix", "extract_annotation"])

    prefix = kwargs["prefix"]
    create_prefix_folders(prefix)

    jackhmmer_outcfg = jackhmmer_search(**kwargs)
    stockholm_file = jackhmmer_outcfg["raw_alignment_file"]

    segment = Segment.from_list(jackhmmer_outcfg["segments"][0])
    target_seq_id = segment.sequence_id
    region_start = segment.region_start

    ali_raw = Alignment.from_path(stockholm_file, "stockholm")

    if kwargs["extract_annotation"]:
        annotation_file = prefix + "_annotation.csv"
        extract_header_annotation(ali_raw).to_csv(
            annotation_file, index=False
        )
    else:
        annotation_file = None

    # jackhmmer puts the query first; focus on its non-gap columns
    focus_cols = np.array([c != "-" for c in ali_raw[0]])
    focus_ali = ali_raw.select(columns=focus_cols)

    mod_outcfg, ali = modify_alignment(
        focus_ali, 0, target_seq_id, region_start, **kwargs
    )

    outcfg = {**jackhmmer_outcfg, **mod_outcfg}
    if annotation_file is not None:
        outcfg["annotation_file"] = annotation_file

    write_config_file(prefix + ".align_standard.outcfg", outcfg)

    if len(ali) <= 1:
        raise BailoutException("align: No sequences found")

    return outcfg


def complex(**kwargs):
    """Protocol: run a monomer alignment protocol, then attach genome-
    location annotations needed for complex pairing.

    Parity: protocol.py:1546-1647.
    """
    check_required(
        kwargs,
        ["prefix", "alignment_protocol", "uniprot_to_embl_table",
         "ena_genome_location_table"],
    )

    verify_resources(
        "Uniprot to EMBL mapping table does not exist",
        kwargs["uniprot_to_embl_table"],
    )
    verify_resources(
        "ENA genome location table does not exist",
        kwargs["ena_genome_location_table"],
    )

    prefix = kwargs["prefix"]
    create_prefix_folders(prefix)

    alignment_protocol = kwargs["alignment_protocol"]
    if alignment_protocol not in PROTOCOLS:
        raise InvalidParameterError(
            "Invalid choice for alignment protocol: {}".format(
                alignment_protocol
            )
        )

    outcfg = PROTOCOLS[alignment_protocol](**kwargs)

    # user-provided annotation override for the existing protocol
    if alignment_protocol == "existing":
        check_required(kwargs, ["override_annotation_file"])
        if kwargs["override_annotation_file"] is not None:
            verify_resources(
                "Override annotation file does not exist",
                kwargs["override_annotation_file"],
            )
            outcfg["annotation_file"] = prefix + "_annotation.csv"
            pd.read_csv(kwargs["override_annotation_file"]).to_csv(
                outcfg["annotation_file"]
            )

    from evcouplings_tpu.align.ena import (
        add_full_header,
        extract_cds_ids,
        extract_embl_annotation,
    )

    cds_ids = extract_cds_ids(
        outcfg["alignment_file"], kwargs["uniprot_to_embl_table"]
    )

    genome_location_filename = prefix + "_genome_location.csv"
    genome_location_table = extract_embl_annotation(
        cds_ids,
        kwargs["ena_genome_location_table"],
        genome_location_filename,
    )
    genome_location_table = add_full_header(
        genome_location_table, outcfg["alignment_file"]
    )
    genome_location_table.to_csv(genome_location_filename)
    outcfg["genome_location_file"] = genome_location_filename

    write_config_file(prefix + ".align_complex.outcfg", outcfg)
    return outcfg


PROTOCOLS = {
    # standard buildali protocol (iterative hmmer search)
    "standard": standard,
    # build raw multiple sequence alignment using jackhmmer
    "jackhmmer_search": jackhmmer_search,
    # build HMM from existing alignment, then search database
    "hmmbuild_and_search": hmmbuild_and_search,
    # start from an existing (external) alignment
    "existing": existing,
    # run alignment protocol and postprocess output for complex pipeline
    "complex": complex,
}


def run(**kwargs):
    """Dispatch to the alignment protocol named by kwargs["protocol"]."""
    check_required(kwargs, ["protocol"])

    if kwargs["protocol"] not in PROTOCOLS:
        raise InvalidParameterError(
            "Invalid protocol selection: "
            "{}. Valid protocols are: {}".format(
                kwargs["protocol"], ", ".join(PROTOCOLS.keys())
            )
        )

    return PROTOCOLS[kwargs["protocol"]](**kwargs)
