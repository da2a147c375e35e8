"""
HADDOCK webserver docking restraints.

Parity target: reference evcouplings/fold/haddock.py
(haddock_dist_restraint :9-76).
"""


def haddock_dist_restraint(resid_i, chain_i, resid_j, chain_j,
                           dist, lower, upper, atom_i=None, atom_j=None,
                           comment=None):
    """Ambiguous distance restraint for the HADDOCK v2.2 webserver
    (chain names interpreted as segids).

    atom selections are currently not emitted (they break HADDOCK
    docking; the parameters are kept for API compatibility).
    """
    comment_str = comment if comment is not None else ""

    atom_str_i = ""
    atom_str_j = ""

    return (
        "! {}\n"
        "assign (resid {} and segid {}{})\n"
        "(\n"
        " (resid {} and segid {}{})\n"
        ") {} {} {}".format(
            comment_str,
            resid_i, chain_i, atom_str_i,
            resid_j, chain_j, atom_str_j,
            dist, upper, lower,
        )
    )
