"""
Distance / dihedral restraint generation from evolutionary couplings
and secondary-structure predictions.

Parity target: reference evcouplings/fold/restraints.py —
secstruct_dist_restraints (:75), secstruct_angle_restraints (:162),
ec_dist_restraints (:234), docking_restraints (:312); parametrization
shipped in cns_templates/restraints.yml + haddock_restraints.yml.
"""

from pathlib import Path

from evcouplings_tpu.utils.config import read_config_file
from evcouplings_tpu.utils.constants import AA1_to_AA3
from evcouplings_tpu.utils.system import verify_resources

_TEMPLATE_DIR = Path(__file__).parent / "cns_templates"


def _folding_config(config_file=None):
    """Load the folding restraint configuration (packaged default if
    no file is given)."""
    if config_file is None:
        config_file = str(_TEMPLATE_DIR / "restraints.yml")

    verify_resources(
        "Folding config file does not exist or is empty", config_file
    )
    return read_config_file(config_file)


def _docking_config(config_file=None):
    """Load the docking restraint configuration (packaged default if
    no file is given)."""
    if config_file is None:
        config_file = str(_TEMPLATE_DIR / "haddock_restraints.yml")

    verify_resources(
        "Folding config file does not exist or is empty", config_file
    )
    return read_config_file(config_file)


def secstruct_dist_restraints(residues, output_file, restraint_formatter,
                              config_file=None,
                              secstruct_column="sec_struct_3state"):
    """Write .tbl distance restraints implied by contiguous secondary-
    structure elements (helix/strand), per sequence separation.

    residues must contain columns i, A_i, and the secondary-structure
    column (H/E/C).
    """
    def _range_equal(start, end, char):
        range_str = "".join(
            secstruct[pos] for pos in range(start, end + 1)
        )
        return range_str == len(range_str) * char

    cfg = _folding_config(config_file)["secstruct_distance_restraints"]

    secstruct = dict(zip(residues.i, residues[secstruct_column]))
    aa = dict(zip(residues.i, residues.A_i))

    i_min = residues.i.min()
    i_max = residues.i.max()
    weight = cfg["weight"]

    with open(output_file, "w") as f:
        for sse, name in [("E", "strand"), ("H", "helix")]:
            sse_cfg = cfg[name]

            # restraints defined per sequence separation; apply where
            # the whole stretch has the same secondary structure
            for seq_dist, atoms in sorted(sse_cfg.items()):
                for i in range(i_min, i_max - seq_dist + 1):
                    j = i + seq_dist
                    if not _range_equal(i, j, sse):
                        continue

                    for (atom1, atom2), (dist, range_) in atoms.items():
                        # glycine has no CB
                        if ((atom1 == "CB" and aa[i] == "G")
                                or (atom2 == "CB" and aa[j] == "G")):
                            continue

                        f.write(restraint_formatter(
                            i, atom1, j, atom2,
                            dist=dist,
                            lower=range_,
                            upper=range_,
                            weight=weight,
                            comment=(
                                AA1_to_AA3[aa[i]] + " "
                                + AA1_to_AA3[aa[j]]
                            ),
                        ) + "\n")


def secstruct_angle_restraints(residues, output_file,
                               restraint_formatter, config_file=None,
                               secstruct_column="sec_struct_3state"):
    """Write .tbl phi/psi dihedral restraints for consecutive
    identical helix/strand states."""
    def _phi(pos, sse):
        return restraint_formatter(
            pos, "C",
            pos + 1, "N",
            pos + 1, "CA",
            pos + 1, "C",
            **cfg[sse]["phi"],
        )

    def _psi(pos, sse):
        return restraint_formatter(
            pos, "N",
            pos, "CA",
            pos, "C",
            pos + 1, "N",
            **cfg[sse]["psi"],
        )

    cfg = _folding_config(config_file)["secstruct_angle_restraints"]

    secstruct = dict(zip(residues.i, residues[secstruct_column]))

    i_min = residues.i.min()
    i_max = residues.i.max()

    with open(output_file, "w") as f:
        # upper bound i_max - 1 (exclusive) skips the final adjacent
        # pair (i_max-1, i_max); kept deliberately — exact restraint-
        # file parity with the reference, whose loop has the same
        # bound (reference fold/restraints.py:222)
        for i in range(i_min, i_max - 1):
            if secstruct[i] == "H" and secstruct[i + 1] == "H":
                f.write(_phi(i, "helix") + "\n")
                f.write(_psi(i, "helix") + "\n")
            elif secstruct[i] == "E" and secstruct[i + 1] == "E":
                f.write(_phi(i, "strand") + "\n")
                f.write(_psi(i, "strand") + "\n")


def ec_dist_restraints(ec_pairs, output_file, restraint_formatter,
                       config_file=None):
    """Write .tbl distance restraints for EC pairs (columns i, j, A_i,
    A_j), one per enabled restraint type (CA / CB / side-chain atom)."""
    cfg = _folding_config(config_file)["pair_distance_restraints"]

    with open(output_file, "w") as f:
        for _, ec in ec_pairs.iterrows():
            i, j, aa_i, aa_j = ec["i"], ec["j"], ec["A_i"], ec["A_j"]

            for type_ in ["c_alpha", "c_beta", "tertiary_atom"]:
                tcfg = cfg[type_]
                if not tcfg["use"]:
                    continue

                if isinstance(tcfg["weight"], str):
                    raise NotImplementedError(
                        "Restraint weighting functions not yet "
                        "implemented: " + tcfg["weight"]
                    )
                weight = tcfg["weight"]

                # atoms: residue-type-specific map or fixed atom name
                atoms = tcfg["atoms"]
                if isinstance(atoms, dict):
                    atom_i = atoms[aa_i]
                    atom_j = atoms[aa_j]
                else:
                    atom_i = atoms
                    atom_j = atoms

                # glycine has no CB
                if ((aa_i == "G" and atom_i == "CB")
                        or (aa_j == "G" and atom_j == "CB")):
                    continue

                f.write(restraint_formatter(
                    i, atom_i, j, atom_j,
                    dist=tcfg["dist"],
                    lower=tcfg["lower"],
                    upper=tcfg["upper"],
                    weight=weight,
                    comment=(
                        AA1_to_AA3[aa_i] + " " + AA1_to_AA3[aa_j]
                    ),
                ) + "\n")


def docking_restraints(ec_pairs, output_file, restraint_formatter,
                       config_file=None):
    """Write docking restraints for inter-segment EC pairs (columns i,
    j, A_i, A_j, segment_i, segment_j); segment A_1 -> chain A etc."""
    cfg = _docking_config(config_file)["docking_restraints"]

    with open(output_file, "w") as f:
        for _, ec in ec_pairs.iterrows():
            chain_i = ec["segment_i"][0]
            chain_j = ec["segment_j"][0]

            f.write(restraint_formatter(
                ec["i"], chain_i, ec["j"], chain_j,
                dist=cfg["dist"],
                lower=cfg["lower"],
                upper=cfg["upper"],
            ) + "\n")
