"""
Mutation-effect (EVmutation) calculations on fitted couplings models.

Parity target: reference evcouplings/mutate/calculations.py —
extract_mutations (:25-51), predict_mutation_table (:54-180),
single_mutant_matrix (:183-248), split_mutants (:251-300).

The per-mutant Delta-E evaluations route through
CouplingsModel.delta_hamiltonian (vectorized kernels in
evcouplings_tpu.ops.hamiltonian); huge scans can additionally use
ops.hamiltonian.hamiltonians_device to run as MXU matmuls.
"""

import numpy as np
import pandas as pd

from evcouplings_tpu.utils.calculations import entropy_map

COMPONENT_TO_INDEX = {
    "full": 0,
    "couplings": 1,
    "fields": 2,
}


def extract_mutations(mutation_string, offset=0, sep=","):
    """Parse "K50R,I100V" into [(50 + offset, "K", "R"), ...].

    "wild"/"wt"/"" parse to an empty substitution list.
    """
    if mutation_string.lower() in ("wild", "wt", ""):
        return []
    return [
        (int(m[1:-1]) + offset, m[0], m[-1])
        for m in mutation_string.split(sep)
    ]


def predict_mutation_table(model, table, output_column="prediction_epistatic",
                           mutant_column="mutant", hamiltonian="full",
                           segment=None):
    """Add a Delta-E prediction column for every mutant in a table.

    Mutations that cannot be scored (position not covered by the model,
    invalid symbol) get NaN. With a "segment" column (or an explicit
    `segment` argument), positions are looked up as (segment, pos) keys
    for multi-segment complex models.
    """
    if hamiltonian in COMPONENT_TO_INDEX:
        component = COMPONENT_TO_INDEX[hamiltonian]
    else:
        raise ValueError(
            "Invalid selection for hamiltonian. "
            "Valid values are: " + ", ".join(COMPONENT_TO_INDEX)
        )

    if not model.has_target_seq:
        raise ValueError(
            "CouplingsModel object does not have a target "
            "sequence (non-focus mode). "
            "Set target sequence, or rerun inference in focus mode."
        )

    pred = table.copy()
    mutations = (
        pred.index if mutant_column is None
        else pred.loc[:, mutant_column]
    )

    if "segment" in pred.columns and pred.loc[:, "segment"].notnull().all():
        # per-row comma-separated segment list paired with the mutations
        mutation_list = []
        for seg_str, mut_str in zip(pred.loc[:, "segment"], mutations):
            segs = seg_str.split(",")
            muts = extract_mutations(mut_str)
            # wild-type rows ("wt"/"wild"/empty) carry no mutations;
            # their segment annotation is irrelevant and they score
            # Delta-E = 0 (the reference reaches the same outcome
            # because its zip silently truncates)
            if muts and len(segs) != len(muts):
                raise ValueError(
                    "Number of mutations does not match number of "
                    "segments of origin: {} vs {}".format(mut_str, seg_str)
                )
            mutation_list.append([
                ((seg, pos), aa_from, aa_to)
                for seg, (pos, aa_from, aa_to) in zip(segs, muts)
            ])
    elif segment is not None:
        mutation_list = [
            [((segment, pos), aa_from, aa_to)
             for (pos, aa_from, aa_to) in extract_mutations(m)]
            for m in mutations
        ]
    else:
        mutation_list = [extract_mutations(m) for m in mutations]

    def _predict(m):
        try:
            return model.delta_hamiltonian(m)[component]
        except ValueError:
            return np.nan

    pred.loc[:, output_column] = [_predict(m) for m in mutation_list]
    return pred


def single_mutant_matrix(model, output_column="prediction_epistatic",
                         exclude_self_subs=True):
    """Table of all single substitutions of the model's target sequence,
    annotated with frequency and column conservation.

    Column layout parity: reference calculations.py:183-248. The Delta-E
    values come from the precomputed (L, q) single-mutant matrix instead
    of per-substitution kernel calls.
    """
    res = []
    cons = entropy_map(model)

    for pos in model.index_list:
        wt = model.seq(pos)
        for subs in model.alphabet:
            if subs in ("-", "."):
                continue
            if exclude_self_subs and subs == wt:
                continue

            # multi-segment models index positions by (segment_id, pos)
            if isinstance(pos, tuple):
                position_str, seg = pos[1], pos[0]
            else:
                position_str, seg = pos, np.nan

            res.append({
                "segment": seg,
                "mutant": "{}{}{}".format(wt, position_str, subs),
                "pos": position_str,
                "wt": wt,
                "subs": subs,
                "frequency": model.fi(pos, subs),
                "column_conservation": cons[pos],
                output_column: model.smm(pos, subs),
            })

    pred = pd.DataFrame(res)
    return pred.loc[
        :, ["segment", "mutant", "pos", "wt", "subs", "frequency",
            "column_conservation", output_column]
    ]


def split_mutants(x, mutant_column="mutant"):
    """Split mutation strings into pos/wt/subs/num_mutations columns
    (comma-joined for higher-order mutants)."""
    def _split(mut_str):
        try:
            return sorted(extract_mutations(mut_str))
        except ValueError:
            return np.nan

    mutations = (
        x.index if mutant_column is None else x.loc[:, mutant_column]
    )
    spl = pd.Series(mutations).map(_split)

    def _is_bad(m):
        # the _split fallback marks unparseable mutant strings as NaN
        return not isinstance(m, list)

    x = x.copy()
    # whole-column assignment: replaces any pre-existing pos/wt/subs
    # column regardless of its dtype (``.loc[:, col] = strings`` on an
    # int column raises in pandas >= 2)
    x["num_mutations"] = [
        np.nan if _is_bad(m) else len(m) for m in spl
    ]
    for i, column in enumerate(["pos", "wt", "subs"]):
        x[column] = [
            np.nan if _is_bad(mutant)
            else ",".join(str(sub[i]) for sub in mutant)
            for mutant in spl
        ]
    return x
