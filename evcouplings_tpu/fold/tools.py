"""
Wrappers for external folding tools: CNSsolve, PSIPRED, maxcluster.

Parity target: reference evcouplings/fold/tools.py — run_cns (:22),
run_cns_13 (:105), run_psipred (:170), read_psipred_prediction (:239),
maxcluster comparison/clustering (:317-525).
"""

import re
from collections import defaultdict
from copy import deepcopy
from os import environ, path

import pandas as pd

from evcouplings_tpu.utils.config import InvalidParameterError
from evcouplings_tpu.utils.system import (
    makedirs,
    run,
    temp,
    verify_resources,
)


def run_cns(inp_script=None, inp_file=None, log_file=None, binary="cns"):
    """Run CNSsolve 1.21, feeding the .inp script via stdin and setting
    up the CNS_* environment from the binary's installation layout.

    The caller is responsible for verifying the output products (their
    paths are determined inside the .inp scripts).
    """
    binary = path.abspath(binary)

    # installation root is three levels above the binary
    cns_main_dir = binary
    for _ in range(3):
        cns_main_dir = path.dirname(cns_main_dir)

    env = deepcopy(environ)
    library_dir = path.join(cns_main_dir, "libraries")
    module_dir = path.join(cns_main_dir, "modules")

    env["CNS_SOLVE"] = cns_main_dir
    env["CNS_LIB"] = library_dir
    env["CNS_MODULE"] = module_dir
    env["CNS_HELPLIB"] = path.join(cns_main_dir, "helplib")

    for var, subdir in [
        ("CNS_TOPPAR", "toppar"),
        ("CNS_CONFDB", "confdb"),
        ("CNS_XTALLIB", "xtal"),
        ("CNS_NMRLIB", "nmr"),
        ("CNS_XRAYLIB", "xray"),
    ]:
        env[var] = path.join(library_dir, subdir)

    for var, subdir in [
        ("CNS_XTALMODULE", "xtal"),
        ("CNS_NMRMODULE", "nmr"),
    ]:
        env[var] = path.join(module_dir, subdir)

    if inp_script is None and inp_file is None:
        raise InvalidParameterError(
            "Must specify either input_script or input_file"
        )

    if inp_file is not None:
        with open(inp_file) as f:
            inp_script = f.read()

    # note: the reference constructs this environment but never passes
    # it to the subprocess; here it is actually applied
    return_code, stdout, stderr = run(binary, stdin=inp_script, env=env)

    if log_file is not None:
        with open(log_file, "w") as f:
            f.write(stdout)


def run_cns_13(inp_script=None, inp_file=None, log_file=None,
               source_script=None, binary="cns"):
    """Run CNSsolve 1.3 (environment set up by sourcing
    .cns_solve_env_sh from the installation)."""
    cmd = (
        "source {};".format(source_script)
        if source_script is not None else ""
    )
    cmd += binary

    if inp_script is None and inp_file is None:
        raise InvalidParameterError(
            "Must specify either input_script or input_file"
        )

    if inp_file is not None:
        with open(inp_file) as f:
            inp_script = f.read()

    return_code, stdout, stderr = run(cmd, stdin=inp_script, shell=True)

    if log_file is not None:
        with open(log_file, "w") as f:
            f.write(stdout)


def run_psipred(fasta_file, output_dir, binary="runpsipred"):
    """Run PSIPRED secondary-structure prediction; returns the paths
    of the .ss2 (VFORMAT) and .horiz (HFORMAT) result files."""
    binary = path.abspath(binary)
    fasta_file = path.abspath(fasta_file)
    output_dir = path.abspath(output_dir)

    verify_resources("Input FASTA file is invalid", fasta_file)
    makedirs(output_dir)

    # runpsipred writes results into the current working directory
    return_code, stdout, stderr = run(
        [binary, fasta_file], working_dir=output_dir
    )

    rootname, _ = path.splitext(path.basename(fasta_file))
    output_prefix = path.join(output_dir, rootname)

    ss2_file = output_prefix + ".ss2"
    horiz_file = output_prefix + ".horiz"

    verify_resources("psipred output is invalid", ss2_file, horiz_file)
    return ss2_file, horiz_file


def read_psipred_prediction(filename, first_index=1):
    """Parse a PSIPRED prediction (auto-detecting horizontal/vertical
    format) into a DataFrame with columns i, A_i, sec_struct_3state
    (+ per-state scores or confidence)."""
    file_format = None
    with open(filename) as f:
        for line in f:
            if line.startswith("# PSIPRED HFORMAT"):
                file_format = "hformat"
            elif line.startswith("# PSIPRED VFORMAT"):
                file_format = "vformat"

    if file_format == "vformat":
        pred = pd.read_csv(
            filename,
            skip_blank_lines=True, comment="#",
            sep=r"\s+",
            names=[
                "i", "A_i", "sec_struct_3state",
                "score_coil", "score_helix", "score_strand",
            ],
        )
    elif file_format == "hformat":
        content = defaultdict(str)
        with open(filename) as f:
            # assemble the wrapped Conf/Pred/AA lines into one string each
            for line in f:
                line = line.rstrip().replace(" ", "")
                if ":" in line:
                    key, _, value = line.partition(":")
                    content[key] += value

        pred = pd.DataFrame({
            "A_i": list(content["AA"]),
            "sec_struct_3state": list(content["Pred"]),
            "sec_struct_conf": list(map(int, content["Conf"])),
        })
        pred.loc[:, "i"] = list(range(1, len(pred) + 1))
    else:
        raise InvalidParameterError(
            "Input file is not a valid psipred prediction file"
        )

    pred.loc[:, "i"] += (first_index - 1)
    return pred


def parse_maxcluster_comparison(comparison_output):
    """Parse maxcluster comparison stdout into a DataFrame (filename,
    num_pairs, rmsd, maxsub, tm, msi)."""
    m = re.compile(
        r"vs\. (.+?)\s+Pairs=\s*(\d+), RMSD=\s*(\d+\.\d+), "
        r"MaxSub=\s*(\d+\.\d+), TM=\s*(\d+\.\d+), MSI=\s*(\d+\.\d+)"
    )

    res = []
    for line in comparison_output.splitlines():
        match = m.search(line)
        if match:
            res.append(match.groups())

    df = pd.DataFrame(
        res, columns=[
            "filename", "num_pairs", "rmsd", "maxsub", "tm", "msi"
        ],
    )
    df = df.assign(**{
        c: pd.to_numeric(df[c]) for c in df.columns if c != "filename"
    })
    return df.assign(num_pairs=df.num_pairs.astype(int) if len(df) else [])


def run_maxcluster_compare(predictions, experiment,
                           normalization_length=None,
                           distance_cutoff=None, binary="maxcluster"):
    """Compare predicted structures to an experimental structure with
    maxcluster; returns the parsed comparison table."""
    list_file = temp()
    with open(list_file, "w") as f:
        for pred_file in predictions:
            f.write(pred_file + "\n")

    cmd = [binary, "-l", list_file, "-e", experiment]

    if normalization_length is not None:
        cmd += ["-N", str(normalization_length)]
    if distance_cutoff is not None:
        cmd += ["-d", str(distance_cutoff)]

    return_code, stdout, stderr = run(cmd)
    return parse_maxcluster_comparison(stdout)


def parse_maxcluster_clustering(clustering_output):
    """Parse maxcluster clustering stdout into a DataFrame (filename,
    cluster, cluster_size).

    Assignment lines are "INFO : <item> : <cluster>  <file>" and only
    appear between the "Clusters @ Threshold" header and the
    "Centroids" section (which repeats INFO lines in a different
    layout and must not be ingested) — reference fold/tools.py:422-464.
    """
    m = re.compile(r"INFO\s*:\s*(\d+)\s*:\s*(\d+)\s+(.+)")

    res = []
    cluster_sizes = defaultdict(int)
    read = False
    for line in clustering_output.splitlines():
        if "Clusters @ Threshold" in line:
            read = True
        if "Centroids" in line:
            read = False

        match = m.search(line)
        if read and match:
            _, cluster, filename = match.groups()
            res.append((filename.strip(), int(cluster)))
            cluster_sizes[int(cluster)] += 1

    df = pd.DataFrame(res, columns=["filename", "cluster"])
    df.loc[:, "cluster_size"] = df.cluster.map(cluster_sizes)
    return df


def run_maxcluster_cluster(predictions, method="average", rmsd=True,
                           clustering_threshold=None,
                           binary="maxcluster"):
    """Cluster predicted structures with maxcluster; returns the
    parsed clustering table."""
    list_file = temp()
    with open(list_file, "w") as f:
        for pred_file in predictions:
            f.write(pred_file + "\n")

    method_map = {
        "single": 1,
        "average": 2,
        "maximum": 3,
        "pairs_min": 4,
        "pairs_abs": 5,
    }

    if method not in method_map:
        raise InvalidParameterError(
            "Method must be one of the following: "
            + ", ".join(method_map.keys())
        )

    cmd = [binary, "-l", list_file, "-C", str(method_map[method])]

    if rmsd:
        cmd += ["-rmsd"]
    if clustering_threshold is not None:
        cmd += ["-T", str(clustering_threshold)]

    return_code, stdout, stderr = run(cmd)
    return parse_maxcluster_clustering(stdout)
