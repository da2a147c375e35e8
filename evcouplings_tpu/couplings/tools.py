"""
Compatibility surface of the reference's external-plmc wrapper module
(reference evcouplings/couplings/tools.py).

In this framework the Potts fit is native (see
evcouplings_tpu.couplings.fitter / evcouplings_tpu.ops.plm), so
`run_plmc` does not shell out to the plmc C binary — it delegates to
the in-process TPU fitter with the exact same signature and result
fields as the reference wrapper (couplings/tools.py:126-307). The
`binary` and `cpu` arguments are accepted and ignored.

`parse_plmc_log` is kept as a real parser for plmc stderr text
(couplings/tools.py:20-123 contract) so that logs from historical plmc
runs can still be ingested (e.g. when re-summarizing old job
directories).
"""

import re

import pandas as pd

from evcouplings_tpu.couplings.fitter import PlmResult, run_plm

# same field list as the reference PlmcResult namedtuple
# (couplings/tools.py:110-123); PlmResult already mirrors it, so the
# compat name is a straight alias
PlmcResult = PlmResult


def parse_plmc_log(log):
    """Parse plmc stderr text into structured run data.

    Returns (iteration_df, (focus_index, valid_seqs, total_seqs,
    valid_sites, total_sites, region_start, eff_samples, opt_status)),
    matching the reference parser (couplings/tools.py:20-108). The
    focus/sites/region entries are None/None/1 when the log comes from
    a non-focus-mode run.

    Raises KeyError if the text is not a complete plmc log (same
    behavior the reference relies on for detecting invalid output).
    """
    stat_patterns = {
        "focus": re.compile(r"Found focus (.+) as sequence (\d+)"),
        "seqs": re.compile(r"(\d+) valid sequences out of (\d+)"),
        "sites": re.compile(r"(\d+) sites out of (\d+)"),
        "region": re.compile(r"Region starts at (\d+)"),
        "samples": re.compile(
            r"Effective number of samples: (\d+\.\d+)"
        ),
        "optimization": re.compile(r"Gradient optimization: (.+)"),
    }
    # iteration rows: integer iter number followed by six float columns
    iter_pattern = re.compile(r"(\d+)" + r"\s+(\d+\.\d+)" * 6)

    found = {}
    header = None
    rows = []

    for line in log.split("\n"):
        for name, pattern in stat_patterns.items():
            m = pattern.search(line)
            if m:
                found[name] = m.groups()

        if line.startswith("iter"):
            header = line.split()

        m = iter_pattern.search(line)
        if m:
            rows.append(m.groups())

    iter_df = pd.DataFrame(rows, columns=header) if header else None

    # focus-mode-only fields
    focus_index = None
    valid_sites, total_sites = None, None
    region_start = 1
    if "focus" in found:
        focus_index = int(found["focus"][1])
    if "sites" in found:
        valid_sites, total_sites = map(int, found["sites"])
    if "region" in found:
        region_start = int(found["region"][0])

    valid_seqs, total_seqs = map(int, found["seqs"])
    eff_samples = float(found["samples"][0])
    opt_status = found["optimization"][0]

    return (
        iter_df,
        (
            focus_index, valid_seqs, total_seqs,
            valid_sites, total_sites, region_start,
            eff_samples, opt_status,
        ),
    )


def run_plmc(alignment, couplings_file, param_file=None,
             focus_seq=None, alphabet=None, theta=None,
             scale=None, ignore_gaps=False, iterations=None,
             lambda_h=None, lambda_J=None, lambda_g=None,
             cpu=None, binary="plmc", **kwargs):
    """Drop-in replacement for the reference run_plmc
    (couplings/tools.py:126-307): fits the Potts model with the native
    TPU pseudolikelihood fitter instead of the external C binary.

    `binary` and `cpu` are accepted for config compatibility and
    ignored (compute runs on the JAX default device or the mesh passed
    via **kwargs). plmc CLI conventions (focus name splitting at "/",
    gap handling) are applied inside run_plm — EXCEPT the 1-theta
    inversion: the reference wrapper inverts theta only because the
    plmc *binary's* -t flag expects the complement (reference
    couplings/tools.py:236-239); here `theta` is the clustering
    identity threshold directly, same meaning as the reference
    wrapper's own theta argument.

    Returns PlmcResult (identical field set to the reference).
    """
    return run_plm(
        alignment, couplings_file, param_file=param_file,
        focus_seq=focus_seq, alphabet=alphabet, theta=theta,
        scale=scale, ignore_gaps=ignore_gaps, iterations=iterations,
        lambda_h=lambda_h, lambda_J=lambda_J, lambda_g=lambda_g,
        cpu=cpu, binary=binary, **kwargs
    )
