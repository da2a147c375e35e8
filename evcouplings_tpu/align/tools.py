"""
Wrappers for external alignment-generation tools (HMMER suite, HHsuite).

Parity target: reference evcouplings/align/tools.py — run_hmmbuild (:26),
run_hmmsearch (:125), run_jackhmmer (:241), run_hmmscan (:376),
tbl/domtbl parsers (:511-614), run_hhfilter (:616). These tools are
genuinely out of TPU numeric scope (profile-HMM database search); they
remain subprocess calls through the single utils.system.run chokepoint.
All output-file contracts (.sto/.tblout/.domtblout naming) match the
reference so downstream protocols are interchangeable.
"""

import io
from collections import namedtuple

import pandas as pd

from evcouplings_tpu.utils.system import (
    create_prefix_folders,
    run,
    verify_resources,
)

HmmbuildResult = namedtuple(
    "HmmbuildResult", ["prefix", "hmmfile", "output"]
)

HmmsearchResult = namedtuple(
    "HmmsearchResult",
    ["prefix", "alignment", "output", "tblout", "domtblout"],
)

JackhmmerResult = namedtuple(
    "JackhmmerResult",
    ["prefix", "alignment", "output", "tblout", "domtblout"],
)

HmmscanResult = namedtuple(
    "HmmscanResult",
    ["prefix", "output", "tblout", "domtblout", "pfamtblout"],
)


def _threshold_flags(use_bitscores, seq_threshold, domain_threshold):
    """Reporting + inclusion threshold flags shared by the HMMER search
    tools (reporting thresholds track inclusion thresholds to bound
    output size)."""
    if use_bitscores:
        return [
            "-T", str(seq_threshold),
            "--domT", str(domain_threshold),
            "--incT", str(seq_threshold),
            "--incdomT", str(domain_threshold),
        ]
    return [
        "-E", str(seq_threshold),
        "--domE", str(domain_threshold),
        "--incE", str(seq_threshold),
        "--incdomE", str(domain_threshold),
    ]


def run_jackhmmer(query, database, prefix, use_bitscores, domain_threshold,
                  seq_threshold, iterations=5, nobias=False, cpu=None,
                  stdout_redirect=None, checkpoints_hmm=False,
                  checkpoints_ali=False, binary="jackhmmer"):
    """Iterative jackhmmer search of query against sequence database.

    Returns a JackhmmerResult namedtuple of output file paths
    (alignment = Stockholm .sto). Parity: reference tools.py:241-367.
    """
    verify_resources(
        "Input file does not exist or is empty", query, database
    )
    create_prefix_folders(prefix)

    result = JackhmmerResult(
        prefix,
        prefix + ".sto",
        prefix + ".output" if stdout_redirect is None else stdout_redirect,
        prefix + ".tblout",
        prefix + ".domtblout",
    )

    cmd = [
        binary,
        "-N", str(iterations),
        "-o", result.output,
        "-A", result.alignment,
        "--tblout", result.tblout,
        "--domtblout", result.domtblout,
        "--noali",
        "--notextw",
    ]
    cmd += _threshold_flags(use_bitscores, seq_threshold, domain_threshold)
    if cpu is not None:
        cmd += ["--cpu", str(cpu)]
    if nobias:
        cmd += ["--nobias"]
    if checkpoints_ali:
        cmd += ["--chkali", prefix]
    if checkpoints_hmm:
        cmd += ["--chkhmm", prefix]
    cmd += [query, database]

    return_code, stdout, stderr = run(cmd)

    verify_resources(
        "jackhmmer returned empty alignment: "
        "stdout={} stderr={} file={}".format(
            stdout, stderr, result.alignment
        ),
        result.alignment,
    )
    return result


def run_hmmbuild(alignment_file, prefix, cpu=None, stdout_redirect=None,
                 symfrac=None, binary="hmmbuild"):
    """Build a profile HMM from a multiple sequence alignment.

    Parity: reference tools.py:26-117.
    """
    verify_resources(
        "Input file does not exist or is empty", alignment_file
    )
    create_prefix_folders(prefix)

    result = HmmbuildResult(
        prefix,
        prefix + ".hmm",
        prefix + ".output" if stdout_redirect is None else stdout_redirect,
    )

    cmd = [binary, "-o", result.output]
    if cpu is not None:
        cmd += ["--cpu", str(cpu)]
    if symfrac is not None:
        cmd += ["--symfrac", str(symfrac)]
    cmd += [result.hmmfile, alignment_file]

    return_code, stdout, stderr = run(cmd)

    verify_resources(
        "hmmbuild returned empty HMM profile: "
        "stdout={} stderr={} file={}".format(
            stdout, stderr, result.hmmfile
        ),
        result.hmmfile,
    )
    return result


def run_hmmsearch(hmmfile, database, prefix, use_bitscores,
                  domain_threshold, seq_threshold, nobias=False, cpu=None,
                  stdout_redirect=None, binary="hmmsearch"):
    """Search a profile HMM against a sequence database.

    Parity: reference tools.py:125-233.
    """
    verify_resources(
        "Input file does not exist or is empty", hmmfile, database
    )
    create_prefix_folders(prefix)

    result = HmmsearchResult(
        prefix,
        prefix + ".sto",
        prefix + ".output" if stdout_redirect is None else stdout_redirect,
        prefix + ".tblout",
        prefix + ".domtblout",
    )

    cmd = [
        binary,
        "-o", result.output,
        "-A", result.alignment,
        "--tblout", result.tblout,
        "--domtblout", result.domtblout,
        "--noali",
        "--notextw",
    ]
    cmd += _threshold_flags(use_bitscores, seq_threshold, domain_threshold)
    if cpu is not None:
        cmd += ["--cpu", str(cpu)]
    if nobias:
        cmd += ["--nobias"]
    cmd += [hmmfile, database]

    return_code, stdout, stderr = run(cmd)
    return result


def run_hmmscan(query, database, prefix, use_model_threshold=True,
                threshold_type="cut_ga", use_bitscores=True,
                domain_threshold=None, seq_threshold=None, nobias=False,
                cpu=None, stdout_redirect=None, binary="hmmscan"):
    """Scan query sequence(s) against a profile HMM database (e.g. Pfam).

    Parity: reference tools.py:376-508. By default uses the model-
    specific gathering/noise/trusted cutoffs stored in the HMM database
    (threshold_type in {cut_ga, cut_nc, cut_tc}).
    """
    verify_resources(
        "Input file does not exist or is empty", query, database
    )
    create_prefix_folders(prefix)

    result = HmmscanResult(
        prefix,
        prefix + ".output" if stdout_redirect is None else stdout_redirect,
        prefix + ".tblout",
        prefix + ".domtblout",
        prefix + ".pfamtblout",
    )

    cmd = [
        binary,
        "-o", result.output,
        "--tblout", result.tblout,
        "--domtblout", result.domtblout,
        "--pfamtblout", result.pfamtblout,
        "--notextw",
        "--acc",
    ]

    if use_model_threshold:
        if threshold_type not in ("cut_ga", "cut_nc", "cut_tc"):
            raise ValueError(
                "Invalid model threshold, valid choices are: "
                "cut_ga, cut_nc, cut_tc"
            )
        cmd += ["--" + threshold_type]
    else:
        # reference parity (tools.py:478-493): explicit thresholds are
        # REQUIRED here, and only REPORTING flags are passed — hmmscan
        # keeps its default inclusion thresholds, unlike the search
        # tools' shared flag builder
        if domain_threshold is None or seq_threshold is None:
            raise ValueError(
                "Must define sequence- and domain-level reporting "
                "thresholds (domain_threshold / seq_threshold) when "
                "not using the model-specific cutoffs"
            )
        if use_bitscores:
            cmd += ["-T", str(seq_threshold),
                    "--domT", str(domain_threshold)]
        else:
            cmd += ["-E", str(seq_threshold),
                    "--domE", str(domain_threshold)]

    if cpu is not None:
        cmd += ["--cpu", str(cpu)]
    if nobias:
        cmd += ["--nobias"]
    cmd += [database, query]

    return_code, stdout, stderr = run(cmd)

    verify_resources(
        "hmmscan returned empty results: "
        "stdout={} stderr={} file={}".format(
            stdout, stderr, result.domtblout
        ),
        # the domain table is what pfam_hits consumes
        result.domtblout,
    )
    return result


def _read_hmmer_table(filename, column_names):
    """Parse a HMMER tbl/domtbl file into a DataFrame.

    Whitespace-split with a bounded number of splits so the free-text
    description column survives; types inferred via a CSV round-trip
    in memory.
    """
    num_splits = len(column_names) - 1
    rows = []
    with open(filename) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip().split(maxsplit=num_splits)
            if len(fields) == num_splits:
                # HMMER may print an EMPTY description (not "-");
                # pad so the frame build cannot fail on short rows
                fields.append("")
            rows.append(fields)

    buf = io.StringIO()
    pd.DataFrame(rows, columns=column_names).to_csv(buf, index=False)
    buf.seek(0)
    # identifiers literally named "NA"/"None" must stay strings,
    # and empty descriptions stay empty strings
    return pd.read_csv(buf, keep_default_na=False)


TBL_COLUMNS = [
    "target_name", "target_accession",
    "query_name", "query_accession",
    "full_Evalue", "full_score", "full_bias",
    "best_domain_Evalue", "best_domain_score", "best_domain_bias",
    "domain_exp", "domain_reg", "domain_clu",
    "domain_ov", "domain_env", "domain_dom",
    "domain_rep", "domain_inc",
    "description",
]

DOMTBL_COLUMNS = [
    "target_name", "target_accession", "target_len",
    "query_name", "query_accession", "query_len",
    "full_Evalue", "full_score", "full_bias",
    "hit_number", "total_hit_number",
    "domain_c_Evalue", "domain_i_Evalue",
    "domain_score", "domain_bias",
    "hmm_from", "hmm_to",
    "ali_from", "ali_to",
    "env_from", "env_to",
    "acc", "description",
]


def read_hmmer_tbl(filename):
    """HMMER per-sequence hit table (tblout) as DataFrame."""
    return _read_hmmer_table(filename, TBL_COLUMNS)


def read_hmmer_domtbl(filename):
    """HMMER per-domain hit table (domtblout) as DataFrame."""
    return _read_hmmer_table(filename, DOMTBL_COLUMNS)


def run_hhfilter(input_file, output_file, threshold=95, columns="a2m",
                 binary="hhfilter"):
    """Redundancy-filter an alignment with HHsuite hhfilter (output A3M).

    Parity: reference tools.py:616-680.
    """
    if columns not in ("first", "a2m"):
        raise ValueError("Invalid column selection: {}".format(columns))

    verify_resources(
        "Alignment file does not exist or is empty", input_file
    )
    create_prefix_folders(output_file)

    cmd = [
        binary,
        "-i", input_file,
        "-o", output_file,
        "-id", str(threshold),
        "-M", columns,
        "-v", str(2),
    ]
    return_code, stdout, stderr = run(cmd)

    verify_resources(
        "hhfilter returned empty alignment: "
        "stdout={} stderr={} file={}".format(
            stdout, stderr, output_file
        ),
        output_file,
    )
    return output_file
