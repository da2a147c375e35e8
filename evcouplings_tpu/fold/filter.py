"""
EC filters for 3D structure prediction: geometric clashes with
predicted secondary structure, and multiple-disulfide clashes.

Parity target: reference evcouplings/fold/filter.py —
detect_secstruct_clash (:16), secstruct_clashes (:95),
disulfide_clashes (:143); logic from choose_CNS_constraint_set.m.
"""

from copy import deepcopy
from operator import xor


def detect_secstruct_clash(i, j, secstruct):
    """True if pair (i, j) is geometrically impossible given the
    predicted secondary structure (helix/strand-mediated exclusion
    rules, sequence separation < 15)."""
    def _get_range(start, end):
        return "".join(
            secstruct[pos] for pos in range(start, end + 1)
        )

    def _all_equal(string, char):
        return string == len(string) * char

    b = max(i, j)
    s = min(i, j)

    # distant pairs are never considered clashing
    if b - s >= 15:
        return False

    secstruct_string = _get_range(s, b)

    # helix-mediated clashes: fully helical span between the pair...
    if _all_equal(_get_range(s + 1, b - 1), "H"):
        return True
    # ... or one endpoint in a helix with a long helical stretch
    elif xor(secstruct[s] == "H", secstruct[b] == "H"):
        h2 = "H" * (b - s - 1)
        h3 = "H" * (b - s - 2)
        if h2 in secstruct_string:
            if b - s > 6:
                return True
        elif h3 in secstruct_string:
            if b - s > 11:
                return True

    # strand-mediated clashes
    if _all_equal(_get_range(s + 1, b - 1), "E"):
        return True
    elif _all_equal(_get_range(s + 2, b - 2), "E"):
        if b - s > 8:
            return True

    if xor(secstruct[s] == "E", secstruct[b] == "E"):
        e2 = "E" * (b - s - 1)
        e3 = "E" * (b - s - 2)
        e4 = "E" * (b - s - 3)

        if e2 in secstruct_string:
            return True
        elif e3 in secstruct_string:
            return True
        elif e4 in secstruct_string:
            if b - s > 8:
                return True

    return False


def secstruct_clashes(ec_pairs, residues, output_column="ss_clash",
                      secstruct_column="sec_struct_3state"):
    """Annotate an EC table (columns i, j) with secondary-structure
    clash flags."""
    ec_pairs = deepcopy(ec_pairs)
    secstruct = dict(zip(residues.i, residues[secstruct_column]))

    ec_pairs.loc[:, output_column] = [
        detect_secstruct_clash(row["i"], row["j"], secstruct)
        for _, row in ec_pairs.iterrows()
    ]
    return ec_pairs


def disulfide_clashes(ec_pairs, output_column="cys_clash"):
    """Flag cys-cys EC pairs whose residues already occur in an
    earlier cys-cys pairing (only one bridge possible per cysteine)."""
    ec_pairs = deepcopy(ec_pairs)

    cys_pairs = ec_pairs.query("A_i == 'C' and A_j == 'C'")

    paired = set()
    clashes = []
    for idx, row in cys_pairs.iterrows():
        i, j = row["i"], row["j"]
        if i in paired or j in paired:
            clashes.append(idx)
        paired.add(i)
        paired.add(j)

    ec_pairs.loc[:, output_column] = False
    ec_pairs.loc[clashes, output_column] = True
    return ec_pairs
