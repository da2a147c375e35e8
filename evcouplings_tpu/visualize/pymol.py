"""
Pymol .pml script generation for mapping properties onto 3D structures.

Parity target: reference evcouplings/visualize/pymol.py —
pymol_secondary_structure (:34), pymol_pair_lines (:97),
pymol_mapping (:198). Pure text generation, no Pymol dependency.
"""

import pandas as pd


def _write_pymol_commands(commands, output_file):
    """Write command lines to a path or writeable handle."""
    cmd_str = "\n".join(commands) + "\n"
    if hasattr(output_file, "write"):
        output_file.write(cmd_str)
    else:
        with open(output_file, "w") as f:
            f.write(cmd_str)


def pymol_secondary_structure(residues, output_file, chain=None,
                              sec_struct_column="sec_struct_3state"):
    """Assign predicted secondary structure (H/E) to a structure."""
    chain_sel = " and chain '{}'".format(chain) if chain is not None else ""
    state_mapping = {"H": "H", "E": "S"}

    cmds = []
    for _, r in residues.iterrows():
        sec_struct = r[sec_struct_column]
        if sec_struct in state_mapping:
            cmds.append(
                "alter (resi {}{}), ss='{}'".format(
                    r["i"], chain_sel, state_mapping[sec_struct]
                )
            )
    cmds.append("rebuild")

    _write_pymol_commands(cmds, output_file)
    return cmds


def pymol_pair_lines(pairs, output_file, chain=None, atom="CA",
                     pair_prefix="ec"):
    """Draw distance lines between residue pairs (columns i, j).

    Optional columns color / dash_radius / dash_gap / dash_length style
    each line; chain may be a single chain name or a {segment: chain}
    dict used with segment_i / segment_j columns; chain_i / chain_j
    columns override both.
    """
    cmds = []

    def _selector(row, column):
        if "chain_" + column in row:
            c = row["chain_" + column]
        elif chain is not None:
            if isinstance(chain, dict):
                c = chain[row["segment_" + column]]
            else:
                c = chain
        else:
            c = None

        chain_sel = "chain '{}' and ".format(c) if c is not None else ""
        return "{}resid {} and name {}".format(chain_sel, row[column], atom)

    for i, (_, r) in enumerate(pairs.iterrows(), start=1):
        id_ = "{}{}".format(pair_prefix, i)
        cmds.append(
            "dist {}, {}, {}, label=0".format(
                id_, _selector(r, "i"), _selector(r, "j")
            )
        )

        if "color" in r and pd.notnull(r["color"]):
            cmds.append(
                "color {}, {}".format(r["color"].replace("#", "0x"), id_)
            )

        for param in ("dash_radius", "dash_gap", "dash_length"):
            if param in r and pd.notnull(r[param]):
                cmds.append("set {}, {}, {}".format(param, r[param], id_))

    _write_pymol_commands(cmds, output_file)
    return cmds


def pymol_mapping(mapping, output_file, chain=None, atom=None):
    """Map per-residue properties (color / show / b_factor columns) onto
    a structure, selecting residues by column i."""
    chain_sel = " and chain '{}'".format(chain) if chain is not None else ""
    atom_sel = " and name {}".format(atom) if atom is not None else ""

    cmds = []
    for _, r in mapping.iterrows():
        sel = "resid {}{}{}".format(r["i"], chain_sel, atom_sel)

        if "color" in r and pd.notnull(r["color"]):
            cmds.append(
                "color {}, {}".format(r["color"].replace("#", "0x"), sel)
            )
        if "show" in r and pd.notnull(r["show"]):
            cmds.append("show {}, {}".format(r["show"], sel))
        if "b_factor" in r and pd.notnull(r["b_factor"]):
            cmds.append("alter {}, b={}".format(sel, r["b_factor"]))

    _write_pymol_commands(cmds, output_file)
    return cmds
