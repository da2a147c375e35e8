"""
EC visualization: Pymol line/enrichment scripts (contact-map plotting
lives in this module too once the compare stage lands).

Parity target: reference evcouplings/visualize/pairs.py —
ec_lines_pymol_script (:1274), enrichment_pymol_script (:1344).
"""

from copy import deepcopy

from evcouplings_tpu.visualize.pymol import pymol_mapping, pymol_pair_lines

# blue sequential colormap for enrichment categories (RGB fractions)
_ENRICHMENT_COLORS = [
    (77, 0, 75),       # dark purple
    (129, 15, 124),
    (136, 65, 157),
    (140, 107, 177),
    (140, 150, 198),
    (158, 188, 218),
    (191, 211, 230),
    (224, 236, 244),
    (247, 252, 253),   # almost white
]


def ec_lines_pymol_script(ec_table, output_file, distance_cutoff=5,
                          score_column="cn", chain=None):
    """Pymol script drawing EC pairs as lines on a structure.

    Line radius scales with score; if a "dist" column exists, pairs
    beyond distance_cutoff are colored red (false positives).
    """
    t = ec_table.copy()

    for prop, val in [
        ("dash_radius", 0.345), ("dash_gap", 0.075), ("dash_length", 0.925)
    ]:
        t.loc[:, prop] = val

    if score_column is not None:
        scaling_factor = 0.5 / ec_table.loc[:, score_column].max()
        t.loc[:, "dash_radius"] = (
            ec_table.loc[:, score_column] * scaling_factor
        )
        t.loc[t.dash_radius < 0, "dash_radius"] = 0

    if "dist" in ec_table and distance_cutoff is not None:
        t.loc[t.dist <= distance_cutoff, "color"] = "green"
        t.loc[t.dist > distance_cutoff, "color"] = "red"
    else:
        t.loc[:, "color"] = "green"

    if chain is not None:
        if isinstance(chain, dict):
            chain_sel = ", chain " + " or chain ".join(chain.values())
        else:
            chain_sel = ", chain '{}'".format(chain)
    else:
        chain_sel = ""

    with open(output_file, "w") as f:
        f.write("as cartoon{}\n".format(chain_sel))
        f.write("color grey80{}\n".format(chain_sel))
        pymol_pair_lines(t, f, chain)


def enrichment_pymol_script(enrichment_table, output_file,
                            sphere_view=True, chain=None, legacy=False):
    """Pymol script highlighting EC enrichment per position.

    Default mode bins positions into nine enrichment categories on a
    sequential colormap (top category also rendered as spheres when
    sphere_view). Legacy mode reproduces the 2011 red/yellow scheme.
    """
    if legacy:
        t = enrichment_table.query("enrichment > 1").copy()
        t.loc[:, "b_factor"] = t.enrichment

        boundary1 = int(0.05 * len(t))   # top 5%
        boundary2 = int(0.15 * len(t))   # top 15%

        t.loc[:, "color"] = "yelloworange"
        t.loc[t.iloc[0:boundary1].index, "color"] = "red"
        t.loc[t.iloc[boundary1:boundary2].index, "color"] = "orange"
        sphere_boundary = boundary2
        color_list = None
    else:
        t = deepcopy(enrichment_table)
        t.loc[:, "b_factor"] = t.enrichment

        boundary_list = [
            int(frac * len(t))
            for frac in (.11, .22, .33, .44, .55, .66, .77, .88, 1.0)
        ]
        color_list = [
            (x / 255, y / 255, z / 255) for x, y, z in _ENRICHMENT_COLORS
        ]

        prior = 0
        for idx, boundary in enumerate(boundary_list):
            t.loc[t.iloc[prior:boundary].index, "color"] = (
                "color{}".format(idx)
            )
            prior = boundary
        sphere_boundary = boundary_list[1]

    if sphere_view:
        t.loc[t.iloc[0:sphere_boundary].index, "show"] = "spheres"

    chain_sel = ", chain '{}'".format(chain) if chain is not None else ""

    with open(output_file, "w") as f:
        if chain is None:
            f.write("alter all, b=0.0\n")
        else:
            f.write("alter chain '{}', b=0.0\n".format(chain))

        if legacy:
            f.write("color grey80{}\n".format(chain_sel))
        else:
            for idx, c in enumerate(color_list):
                f.write(
                    "set_color color{}, [{},{},{}]\n".format(
                        idx, c[0], c[1], c[2]
                    )
                )
            f.write("color color{}{}\n".format(len(color_list) - 1, chain_sel))

        f.write("as cartoon{}\n".format(chain_sel))
        pymol_mapping(t, f, chain)

        if not sphere_view:
            f.write("cartoon putty{}\n".format(chain_sel))
