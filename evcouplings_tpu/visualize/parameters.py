"""
EVzoom JSON export of pair-model parameters.

Parity target: reference evcouplings/visualize/parameters.py —
evzoom_data (:13), evzoom_json (:161). Output schema (map/logo/
couplings) is consumed by the EVzoom web viewer.
"""

import json

import numpy as np

from evcouplings_tpu.couplings.pairs import add_mixture_probability


def evzoom_data(model, ec_threshold=0.9, freq_threshold=0.01,
                Jij_threshold=10, score="cn", reorder=None):
    """Build the (map, logo, couplings-matrix) triple for EVzoom.

    ec_threshold in (0, 1] is a mixture-model probability cutoff,
    larger values an absolute EC count; int Jij_threshold is a
    percentage of the maximum |J|, float an absolute value.
    """
    DIGITS = 2
    DIGITS_LOGO = 2
    ecs = model.ecs

    if 0 < ec_threshold <= 1.0:
        ecs = add_mixture_probability(ecs, score=score)
        ecs_sel = ecs.loc[ecs.probability >= ec_threshold]
    else:
        ecs_sel = ecs.iloc[:int(ec_threshold)]

    if isinstance(Jij_threshold, int):
        max_val = np.max(np.abs(model.Jij()))
        Jij_threshold = max_val * Jij_threshold / 100

    if reorder is not None:
        alphabet = np.array(list(reorder))
        alphabet_order = [model.alphabet_map[c] for c in reorder]
    else:
        alphabet = model.alphabet
        alphabet_order = sorted(model.alphabet_map.values())

    map_ = {
        "letters": "".join(model.seq()),
        "indices": list(map(int, model.sn())),
    }

    # coupling sub-matrices for the selected ECs (both orientations)
    matrix = []
    for _, r in ecs_sel.iterrows():
        i, j, score_ij = r["i"], r["j"], r[score]
        Jij = model.Jij(i, j)[alphabet_order, :][:, alphabet_order]
        ai_set = np.where(np.max(np.abs(Jij), axis=1) > Jij_threshold)[0]
        aj_set = np.where(np.max(np.abs(Jij), axis=0) > Jij_threshold)[0]

        cur_matrix = [
            [round(Jij[ai, aj], DIGITS) for aj in aj_set]
            for ai in ai_set
        ]
        cur_row = {
            "i": model.mn(i) + 1,
            "j": model.mn(j) + 1,
            "score": round(score_ij, DIGITS),
            "iC": "".join(alphabet[ai_set]),
            "jC": "".join(alphabet[aj_set]),
            "matrix": cur_matrix,
        }
        cur_row_T = {
            "i": cur_row["j"],
            "j": cur_row["i"],
            "score": cur_row["score"],
            "iC": cur_row["jC"],
            "jC": cur_row["iC"],
            "matrix": [list(col) for col in zip(*cur_matrix)],
        }
        matrix.append(cur_row)
        matrix.append(cur_row_T)

    # per-position sequence logo (information-scaled frequencies)
    fi = model.fi()
    q = model.num_symbols

    fi_no0 = fi.copy()
    fi_no0[fi <= 0] = np.nan
    B = -fi * np.log2(fi_no0)
    B[fi <= 0] = 0
    R = np.log2(q) - B.sum(axis=1)

    logo = []
    for i in range(model.L):
        order = np.argsort(fi[i, :])
        frequent = order[fi[i, order] >= freq_threshold]
        symbols = model.alphabet[frequent]
        fi_row = fi[i, frequent] * R[i]
        logo.append([
            {"code": s, "bits": round(float(h), DIGITS_LOGO)}
            for s, h in zip(symbols, fi_row)
        ])

    return map_, logo, matrix


def evzoom_json(model, **kwargs):
    """EVzoom-ready JSON string for a CouplingsModel."""
    map_, logo, matrix = evzoom_data(model, **kwargs)
    return json.dumps({
        "map": map_,
        "logo": logo,
        "couplings": matrix,
    })
