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


# ---------------------------------------------------------------------------
# contact map plotting
# (parity: reference visualize/pairs.py:195-1272 — same API, leaner
# rendering)
# ---------------------------------------------------------------------------

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

def _scatter_style(color, size, **extra):
    """Edge-less scatter style for contact-map dots."""
    return {"edgecolor": "none", "c": color, "s": size, **extra}


# rendering defaults mirror the reference's published figures
STYLE_EC = _scatter_style("black", 80)
STYLE_CONTACT = _scatter_style("#b6d4e9", 100)
STYLE_CONTACT_BRIGHT = _scatter_style("#d9e7f5", 100)
STYLE_CONTACT_MULTIMER = _scatter_style("#fc8c3b", 100, alpha=0.3)

STYLE_SECSTRUCT = {
    "helix_turn_length": 2,
    "strand_width_factor": 0.5,
    "min_sse_length": 2,
    "width": 1,
    "line_width": 2,
    # monochrome cartoons by default
    "helix_color": "k",
    "strand_color": "k",
    "coil_color": "k",
}

STYLE_EC_COVERAGE = {
    "color": "#d9d7d7",
    "height": 0.8,
    "width": 0.8,
    "margin": 0.5,
}

STYLE_STRUCTURE_COVERAGE = {
    "color": "#83a7c8",
    "height": 0.8,
    "missing_coverage_color": "#dddddd",
    "available_coverage_color": "#ffffff",
}


def find_secondary_structure_segments(sse_string, offset=0):
    """Identify (state, start, end) segments in an H/E/C string.

    Parity: reference pairs.py:1225-1272.
    """
    # "-" (no data) stays distinct: the cartoon SKIPS those spans
    # instead of drawing a coil line across numbering gaps

    segments = []
    seg_start = 0
    current = sse_string[0]

    for i, state in enumerate(sse_string[1:], start=1):
        if state != current:
            segments.append(
                (current, seg_start + offset, i - 1 + offset)
            )
            current = state
            seg_start = i

    segments.append(
        (current, seg_start + offset, len(sse_string) - 1 + offset)
    )
    return offset, len(sse_string) - 1 + offset, segments


def secondary_structure_cartoon(sse, ax=None, sequence_start=0,
                                sequence_end=None, horizontal=True,
                                flip_direction=False, center=0, width=1,
                                helix_turn_length=1,
                                strand_width_factor=0.5, line_width=2,
                                min_sse_length=0, clipping=False,
                                helix_color="k", strand_color="k",
                                coil_color="k", draw_coils=True):
    """Draw a 1D secondary-structure cartoon along an axis: zig-zag for
    helices, arrows for strands, thin lines for coil."""
    if ax is None:
        ax = plt.gca()

    def _pos(p):
        # full mirror of the sequence axis when flip_direction is set
        # (negating only the arrow direction drew strands OUTSIDE
        # their segments and left helices/coils unflipped)
        if flip_direction and sequence_end is not None:
            return sequence_end - (p - sequence_start)
        return p

    def _xy(pos, offset):
        # place along the sequence axis, offset on the other axis
        pos = _pos(pos)
        return (pos, center + offset) if horizontal else \
            (center + offset, pos)

    # cartoons sit OUTSIDE the axis limits (plot_secondary_structure
    # places them at max(range) + margin): default clipping would
    # silently erase every artist
    clip = bool(clipping)

    for state, start, end in sse:
        if end - start + 1 < min_sse_length and state not in ("C", "-"):
            state = "C"

        if state == "H":
            # zig-zag helix
            xs = np.arange(start, end + 0.01, helix_turn_length / 2)
            ys = np.empty_like(xs)
            ys[0::2] = center - width / 2
            ys[1::2] = center + width / 2
            xs = np.array([_pos(x) for x in xs])
            pts = np.stack([xs, ys] if horizontal else [ys, xs]).T
            ax.plot(
                pts[:, 0], pts[:, 1], color=helix_color,
                linewidth=line_width, solid_capstyle="round",
                clip_on=clip,
            )
        elif state == "E":
            # strand: arrow along the (possibly mirrored) sequence
            # direction
            x0, x1 = _pos(start), _pos(end)
            if horizontal:
                ax.arrow(
                    x0, center, x1 - x0, 0,
                    width=width * strand_width_factor,
                    head_length=min(1.5, abs(end - start)),
                    length_includes_head=True,
                    facecolor=strand_color, edgecolor="none",
                    clip_on=clip,
                )
            else:
                ax.arrow(
                    center, x0, 0, x1 - x0,
                    width=width * strand_width_factor,
                    head_length=min(1.5, abs(end - start)),
                    length_includes_head=True,
                    facecolor=strand_color, edgecolor="none",
                    clip_on=clip,
                )
        elif state == "-":
            # no data: draw nothing across the gap
            continue
        elif draw_coils:
            pts = [_xy(start, 0), _xy(end, 0)]
            ax.plot(
                [pts[0][0], pts[1][0]], [pts[0][1], pts[1][1]],
                color=coil_color, linewidth=line_width / 2,
                clip_on=clip,
            )


def find_boundaries(boundaries, ecs, monomer, multimer, symmetric):
    """Resolve axis boundaries for a contact map.

    boundaries: "union" | "intersection" | "ecs" | "structure", a
    (min, max) tuple applied to both axes, or [(min_x, max_x),
    (min_y, max_y)]. Returns ((min_x, max_x), (min_y, max_y)).

    Parity: reference visualize/pairs.py:70-192.
    """
    # manual ranges take precedence over data-derived ones
    if isinstance(boundaries, tuple):
        if len(boundaries) != 2:
            raise ValueError(
                "boundaries must be a tuple with 2 elements (min, max)."
            )
        return boundaries, boundaries

    if isinstance(boundaries, list):
        if (len(boundaries) != 2 or len(boundaries[0]) != 2
                or len(boundaries[1]) != 2):
            raise ValueError(
                "boundaries must be a list of 2 tuples with 2 elements "
                "[(min_x, max_x), (min_y, max_y)]."
            )
        return tuple(boundaries[0]), tuple(boundaries[1])

    if boundaries not in ("union", "intersection", "ecs", "structure"):
        raise ValueError(
            "Not a valid value for boundaries: {}".format(boundaries)
        )

    def _axis_extent(axis):
        def _nums(values):
            # ids may carry insertion codes / NaN — coerce like
            # _axis_ids, do not crash the whole plot
            return set(pd.to_numeric(
                pd.Series(list(values)), errors="coerce"
            ).dropna().astype(int))

        ec_pos = set()
        if ecs is not None and len(ecs) > 0:
            if symmetric:
                ec_pos = _nums(ecs.i) | _nums(ecs.j)
            else:
                ec_pos = _nums(getattr(ecs, axis))

        structure_pos = set()
        for dm in (monomer, multimer):
            if dm is not None:
                structure_pos |= _nums(
                    getattr(dm, "residues_" + axis).id
                )

        # whichever set is empty falls back to the other, making
        # union/intersection trivially the defined set
        min_ec, max_ec = (
            (min(ec_pos), max(ec_pos)) if ec_pos
            else (min(structure_pos), max(structure_pos))
        )
        min_st, max_st = (
            (min(structure_pos), max(structure_pos)) if structure_pos
            else (min(ec_pos), max(ec_pos))
        )

        return {
            "union": (min(min_ec, min_st), max(max_ec, max_st)),
            "intersection": (max(min_ec, min_st), min(max_ec, max_st)),
            "ecs": (min_ec, max_ec),
            "structure": (min_st, max_st),
        }[boundaries]

    return _axis_extent("i"), _axis_extent("j")


def set_range(pairs=None, symmetric=True, x=None, y=None,
              ax=None, margin=0, invert_y=True):
    """Set contact-map axis ranges from a pair table and/or explicit
    (min, max) tuples, preserving axis inversion.

    Parity: reference visualize/pairs.py:651-757.
    """
    if ax is None:
        ax = plt.gca()

    x_range, y_range = None, None

    if pairs is not None:
        i = pairs.i.astype(int)
        j = pairs.j.astype(int)
        if symmetric:
            x_range = (
                min(i.min(), j.min()) - margin,
                max(i.max(), j.max()) + margin,
            )
            y_range = x_range
        else:
            x_range = (i.min() - margin, i.max() + margin)
            y_range = (j.min() - margin, j.max() + margin)

    if x is not None:
        x_range = (x[0] - margin, x[1] + margin)
    if y is not None:
        y_range = (y[0] - margin, y[1] + margin)

    if x_range is None or y_range is None:
        raise ValueError(
            "Axis remained unspecified (set pairs or x/y): "
            "x: {} y: {}".format(x_range, y_range)
        )

    inverted_x = ax.xaxis_inverted()
    inverted_y = ax.yaxis_inverted()

    ax.set_xlim(x_range)
    ax.set_ylim(y_range)

    if inverted_x:
        ax.invert_xaxis()
    if inverted_y or invert_y:
        ax.invert_yaxis()

    ax.yaxis.set_ticks_position("left")
    ax.xaxis.set_ticks_position(
        "top" if ax.yaxis_inverted() else "bottom"
    )

    return x_range, y_range


def scale(style, ax=None):
    """Scale dot size / secondary-structure width in a style dict by
    the linear extent of the plot, so elements keep a constant visual
    size across map lengths. Parity: reference pairs.py:759-785."""
    if ax is None:
        ax = plt.gca()

    x_range = ax.get_xlim()
    y_range = ax.get_ylim()
    L = max(
        abs(x_range[1] - x_range[0]),
        abs(y_range[1] - y_range[0]),
    )

    style = deepcopy(style)
    if "s" in style:
        style["s"] = style["s"] ** 2 / L
    if "width" in style:
        style["width"] = style["width"] * L / 100
    return style


def plot_ec_coverage(all_ecs, symmetric, style=STYLE_EC_COVERAGE,
                     ax=None):
    """Draw bars alongside the contact map marking the consecutive
    position ranges covered by the EC table.

    Parity: reference visualize/pairs.py:787-863.
    """
    from matplotlib import patches

    from evcouplings_tpu.utils.helpers import find_segments

    if ax is None:
        ax = plt.gca()
    if style is None:
        style = {}

    if symmetric:
        all_pos = sorted(set(all_ecs.i.values) | set(all_ecs.j.values))
        pos_i, pos_j = all_pos, all_pos
    else:
        pos_i = sorted(set(all_ecs.i.values))
        pos_j = sorted(set(all_ecs.j.values))

    margin = style.get("margin", 0)
    width = style.get("width", 1)
    x_offset = max(ax.get_xlim()) + margin
    y_offset = max(ax.get_ylim()) + margin

    def _draw(segments, offset, is_x):
        for start, end in segments:
            length = end - start + 1
            if is_x:
                anchor, size_x, size_y = (start, offset), length, width
            else:
                anchor, size_x, size_y = (offset, start), width, length
            ax.add_patch(patches.Rectangle(
                anchor, size_x, size_y, linewidth=0, edgecolor="none",
                facecolor=style.get("color"), zorder=-10, clip_on=False,
            ))

    _draw(find_segments(pos_i), y_offset, True)
    _draw(find_segments(pos_j), x_offset, False)


def plot_structure_coverage(structure_coverage,
                            style=STYLE_STRUCTURE_COVERAGE, ax=None):
    """Shade the contact-map background by structural coverage: the
    axes background takes the missing-coverage color, and a rectangle
    in the available-coverage color is drawn for every covered segment
    pair of every structure.

    structure_coverage: list of (coverage_i, coverage_j, coverage_id)
    as returned by DistanceMap.structure_coverage().

    Parity: reference visualize/pairs.py:866-912.
    """
    from matplotlib import patches

    if ax is None:
        ax = plt.gca()
    if style is None:
        style = {}

    if "missing_coverage_color" in style:
        ax.set_facecolor(style["missing_coverage_color"])

    available = style.get("available_coverage_color")

    for coverage_i, coverage_j, _ in structure_coverage:
        for start_i, end_i in coverage_i:
            for start_j, end_j in coverage_j:
                ax.add_patch(patches.Rectangle(
                    (start_i, start_j),
                    end_i - start_i + 1, end_j - start_j + 1,
                    linewidth=0, edgecolor="none",
                    facecolor=available, zorder=-10,
                ))


def plot_secondary_structure(secstruct_i, secstruct_j=None, ax=None,
                             style=None, margin=None):
    """Draw secondary-structure cartoons along both contact-map axes.

    secstruct_i/j: dict position -> "H"/"E"/"C"/"-", or a DataFrame
    with "id" and "sec_struct_3state" columns (Chain.residues /
    DistanceMap.residues_i/j). Call only after the axis orientation of
    the plot has been fixed.

    Parity: reference visualize/pairs.py:915-1044.
    """
    if ax is None:
        ax = plt.gca()
    if style is None:
        style = {}
    if secstruct_j is None:
        secstruct_j = secstruct_i

    def _extract(secstruct, axis_range):
        if isinstance(secstruct, pd.DataFrame):
            if "sec_struct_3state" not in secstruct.columns:
                return None, None, None
            secstruct = secstruct.dropna(subset=["sec_struct_3state"])
            secstruct = dict(zip(
                secstruct.id.astype(int), secstruct.sec_struct_3state
            ))

        # keep only positions inside the plot range (drawing outside
        # the axes creates artifacts)
        lo, hi = min(axis_range), max(axis_range)
        secstruct = {
            pos: state for pos, state in secstruct.items()
            if lo <= pos < hi
        }
        if not secstruct:
            return None, None, None

        first, last = min(secstruct), max(secstruct) + 1
        sse_str = "".join(
            secstruct.get(pos, "-") for pos in range(first, last)
        )
        return find_secondary_structure_segments(sse_str, offset=first)

    if margin is None:
        margin = 3 * style.get("width", 1)
    else:
        margin += style.get("width", 1)

    x_range = ax.get_xlim()
    y_range = ax.get_ylim()

    start_i, end_i, segments_i = _extract(secstruct_i, x_range)
    if segments_i is not None:
        secondary_structure_cartoon(
            segments_i,
            **{
                **style,
                "center": max(y_range) + margin,
                "ax": ax,
                "sequence_start": start_i,
                "sequence_end": end_i,
                "horizontal": True,
            },
        )

    start_j, end_j, segments_j = _extract(secstruct_j, y_range)
    if segments_j is not None:
        secondary_structure_cartoon(
            segments_j,
            **{
                **style,
                "center": max(x_range) + margin,
                "ax": ax,
                "sequence_start": start_j,
                "sequence_end": end_j,
                "horizontal": False,
            },
        )


def plot_pairs(pairs, symmetric=False, ax=None, style=None):
    """Scatter a table of (i, j) pairs; optional per-pair color / size
    columns override the style. (Parameter named `pairs` for keyword
    compatibility with the reference, visualize/pairs.py.)"""
    pairs_table = pairs
    if ax is None:
        ax = plt.gca()
    style = dict(style or STYLE_EC)

    if pairs_table is None or len(pairs_table) == 0:
        return []

    i = pairs_table.i.astype(float).values
    j = pairs_table.j.astype(float).values

    if "color" in pairs_table.columns:
        style["c"] = pairs_table.color.values
    if "size" in pairs_table.columns:
        sizes = pairs_table["size"].astype(float).values
        base = style.get("s", 80)
        if np.all(sizes <= 1):
            sizes = sizes * base
        style["s"] = sizes

    paths = [ax.scatter(i, j, **style)]
    if symmetric:
        paths.append(ax.scatter(j, i, **style))
    return paths


def _axis_ids(ecs, distance_maps, which):
    """Collect numeric positions present in EC tables / distance maps."""
    ids = set()
    if ecs is not None and len(ecs) > 0:
        ids |= set(pd.to_numeric(ecs.i, errors="coerce").dropna())
        ids |= set(pd.to_numeric(ecs.j, errors="coerce").dropna())
    for dm in distance_maps:
        if dm is None:
            continue
        residues = dm.residues_i if which == "i" else dm.residues_j
        ids |= set(pd.to_numeric(residues.id, errors="coerce").dropna())
    return ids


def plot_contact_map(ecs=None, monomer=None, multimer=None,
                     distance_cutoff=5, secondary_structure=None,
                     show_secstruct=True, ec_coverage=None,
                     show_structure_coverage=False, scale_sizes=True,
                     ec_style=STYLE_EC, monomer_style=STYLE_CONTACT,
                     multimer_style=STYLE_CONTACT_MULTIMER,
                     secstruct_style=STYLE_SECSTRUCT,
                     ec_coverage_style=STYLE_EC_COVERAGE,
                     structure_coverage_style=STYLE_STRUCTURE_COVERAGE,
                     margin=5, invert_y=True, boundaries="union",
                     symmetric=True, ax=None):
    """Contact map: structure contacts as background discs, ECs as
    points (green/red split by distance_cutoff when distances known).

    Parity: reference pairs.py:195-391 (same parameters; boundary
    resolution through find_boundaries, size scaling through scale(),
    coverage bars / background through plot_ec_coverage /
    plot_structure_coverage, cartoons through
    plot_secondary_structure).
    """
    if ax is None:
        ax = plt.gca()

    # resolve and fix axis boundaries FIRST: size scaling and cartoon
    # placement read the axis extents
    ids_i = _axis_ids(ecs, [monomer, multimer], "i")
    ids_j = _axis_ids(ecs, [monomer, multimer], "j")
    # normalize manual forms for find_boundaries: a scalar pair (from
    # YAML, a list) -> tuple; a pair of per-axis pairs (tuple OR
    # list) -> list of two tuples
    if (isinstance(boundaries, (tuple, list)) and len(boundaries) == 2
            and isinstance(boundaries[0], (tuple, list))):
        boundaries = [tuple(boundaries[0]), tuple(boundaries[1])]
    elif isinstance(boundaries, list) and len(boundaries) == 2:
        boundaries = tuple(boundaries)
    if (len(ids_i) == 0 or len(ids_j) == 0) \
            and isinstance(boundaries, str):
        # a mode string cannot be resolved against an empty axis —
        # fall back to unit extents (after validating the mode)
        if boundaries not in (
                "union", "intersection", "ecs", "structure"):
            raise ValueError(
                "Not a valid value for boundaries: {}".format(
                    boundaries)
            )
        (min_i, max_i), (min_j, max_j) = (0, 1), (0, 1)
    else:
        (min_i, max_i), (min_j, max_j) = find_boundaries(
            boundaries, ecs, monomer, multimer, symmetric
        )

    ax.set_xlim(min_i - margin, max_i + margin)
    if invert_y:
        ax.set_ylim(max_j + margin, min_j - margin)
    else:
        ax.set_ylim(min_j - margin, max_j + margin)

    if scale_sizes:
        ec_style = scale(ec_style, ax=ax)
        monomer_style = scale(monomer_style, ax=ax)
        multimer_style = scale(multimer_style, ax=ax)
        secstruct_style = scale(secstruct_style, ax=ax)
        ec_coverage_style = scale(ec_coverage_style, ax=ax)

    # background: structural coverage shading, then contacts
    if show_structure_coverage:
        coverage_src = monomer if monomer is not None else multimer
        if coverage_src is not None:
            plot_structure_coverage(
                coverage_src.structure_coverage(),
                style=structure_coverage_style, ax=ax,
            )
    # contacts() already emits BOTH (i, j) and (j, i) for symmetric
    # maps — re-mirroring in plot_pairs double-composited every disc
    if monomer is not None:
        contacts = monomer.contacts(max_dist=distance_cutoff)
        plot_pairs(
            contacts, symmetric=False, ax=ax, style=monomer_style,
        )
    if multimer is not None:
        contacts = multimer.contacts(max_dist=distance_cutoff)
        plot_pairs(
            contacts, symmetric=False, ax=ax, style=multimer_style,
        )

    # coverage bars of the full EC table alongside the axes
    if ec_coverage is not None and len(ec_coverage) > 0:
        plot_ec_coverage(
            ec_coverage, symmetric, style=ec_coverage_style, ax=ax
        )

    # foreground: ECs (color split by structural distance if available)
    if ecs is not None and len(ecs) > 0:
        ecs = ecs.copy()
        if "color" not in ecs.columns and monomer is not None:
            dists = np.array([
                monomer.dist(i, j, raise_na=False)
                for i, j in zip(ecs.i, ecs.j)
            ])
            if multimer is not None:
                dists_mm = np.array([
                    multimer.dist(i, j, raise_na=False)
                    for i, j in zip(ecs.i, ecs.j)
                ])
                dists = np.fmin(dists, dists_mm)
            color = np.where(dists <= distance_cutoff, "#50a455", "#b2402f")
            color[np.isnan(dists)] = "#404040"
            ecs.loc[:, "color"] = color
        plot_pairs(ecs, symmetric=symmetric, ax=ax, style=ec_style)

    # secondary structure cartoons along both axes (gap-aware, from
    # the explicit table if given, else the distance-map residues)
    if show_secstruct:
        if secondary_structure is not None:
            # accept a Chain (use its residue table), a residue
            # DataFrame, a position -> state dict, or — for
            # asymmetric maps — a (ss_i, ss_j) pair
            if isinstance(secondary_structure, tuple):
                ss_i, ss_j = secondary_structure
                plot_secondary_structure(
                    getattr(ss_i, "residues", ss_i),
                    getattr(ss_j, "residues", ss_j),
                    ax=ax, style=secstruct_style,
                )
            elif not symmetric:
                raise ValueError(
                    "Need one secondary structure per axis for an "
                    "asymmetric map: pass a (ss_i, ss_j) tuple"
                )
            else:
                ss = getattr(
                    secondary_structure, "residues",
                    secondary_structure,
                )
                plot_secondary_structure(
                    ss, ax=ax, style=secstruct_style
                )
        elif monomer is not None:
            plot_secondary_structure(
                monomer.residues_i, monomer.residues_j,
                ax=ax, style=secstruct_style,
            )

    ax.set_xlabel("Position i")
    ax.set_ylabel("Position j")
    ax.set_aspect("equal", adjustable="box")
    return ax


def complex_contact_map(intra1_ecs, intra2_ecs, inter_ecs,
                        d_intra_i, d_multimer_i,
                        d_intra_j, d_multimer_j,
                        d_inter, margin=5, boundaries="union",
                        scale_sizes=True, show_secstruct=True, ax=None):
    """Complex contact map: monomer quadrants on the diagonal blocks,
    inter-molecule ECs/contacts off-diagonal.

    Parity: reference pairs.py:393-579 (same parameters; quadrants
    rendered into one axes with offset positions).
    """
    if ax is None:
        ax = plt.gca()

    # determine extents of both monomers, honoring the boundaries
    # mode (previously accepted and silently ignored)
    def _ec_ids(ecs_m, inter_col):
        ids = _axis_ids(ecs_m, [], "i")
        if inter_ecs is not None and len(inter_ecs) > 0:
            ids |= set(pd.to_numeric(
                getattr(inter_ecs, inter_col), errors="coerce"
            ).dropna())
        return ids

    def _extent(ids_ec, ids_st, k):
        if not ids_ec and not ids_st:
            return 0, 1
        ec_rng = (
            (min(ids_ec), max(ids_ec)) if ids_ec
            else (min(ids_st), max(ids_st))
        )
        st_rng = (
            (min(ids_st), max(ids_st)) if ids_st
            else (min(ids_ec), max(ids_ec))
        )
        if isinstance(boundaries, tuple):
            return boundaries
        if isinstance(boundaries, list):
            return tuple(boundaries[k])
        if boundaries not in (
                "union", "intersection", "ecs", "structure"):
            raise ValueError(
                "Not a valid value for boundaries: {}".format(
                    boundaries)
            )
        return {
            "union": (min(ec_rng[0], st_rng[0]),
                      max(ec_rng[1], st_rng[1])),
            "intersection": (max(ec_rng[0], st_rng[0]),
                             min(ec_rng[1], st_rng[1])),
            "ecs": ec_rng,
            "structure": st_rng,
        }[boundaries]

    min_1, max_1 = _extent(
        _ec_ids(intra1_ecs, "i"),
        _axis_ids(None, [d_intra_i, d_multimer_i], "i"), 0,
    )
    min_2, max_2 = _extent(
        _ec_ids(intra2_ecs, "j"),
        _axis_ids(None, [d_intra_j, d_multimer_j], "i"), 1,
    )

    # second monomer drawn offset after the first
    offset_2 = max_1 + 2 * margin - min_2

    # fix the full extents first so size scaling and cartoons can
    # read them
    lo = min_1 - margin
    hi = max_2 + offset_2 + margin
    ax.set_xlim(lo, hi)
    ax.set_ylim(hi, lo)

    ec_style = STYLE_EC
    contact_style = STYLE_CONTACT
    multimer_style = STYLE_CONTACT_MULTIMER
    secstruct_style = STYLE_SECSTRUCT
    if scale_sizes:
        ec_style = scale(ec_style, ax=ax)
        contact_style = scale(contact_style, ax=ax)
        multimer_style = scale(multimer_style, ax=ax)
        secstruct_style = scale(secstruct_style, ax=ax)

    def _shift(table, cols, offset):
        if table is None or len(table) == 0:
            return None
        table = table.copy()
        for c in cols:
            # whole-column assignment: the source column may be a
            # string dtype (DistanceMap residue ids), which .loc
            # refuses to overwrite with numerics under pandas >= 2
            table[c] = pd.to_numeric(table[c], errors="coerce") + offset
        return table

    # monomer 1 block (no scaling inside: styles already scaled to
    # the full complex extents here)
    plot_contact_map(
        intra1_ecs, d_intra_i, d_multimer_i,
        show_secstruct=False, scale_sizes=False, margin=margin,
        boundaries=(min_1, max_1), invert_y=False, ax=ax,
        ec_style=ec_style, monomer_style=contact_style,
        multimer_style=multimer_style,
    )
    # plot_contact_map narrows the limits to the monomer-1 block;
    # restore the full complex extents
    ax.set_xlim(lo, hi)
    ax.set_ylim(hi, lo)

    # monomer 2 block (shifted): intra + multimer contacts, then ECs
    if d_intra_j is not None:
        # contacts() already carries both orientations
        contacts = _shift(d_intra_j.contacts(), ["i", "j"], offset_2)
        plot_pairs(
            contacts, symmetric=False, ax=ax, style=contact_style
        )
    if d_multimer_j is not None:
        contacts = _shift(
            d_multimer_j.contacts(), ["i", "j"], offset_2
        )
        plot_pairs(
            contacts, symmetric=False, ax=ax, style=multimer_style
        )
    plot_pairs(
        _shift(intra2_ecs, ["i", "j"], offset_2),
        symmetric=True, ax=ax, style=ec_style,
    )

    # inter quadrant: i from monomer 1, j from monomer 2 (shifted)
    if d_inter is not None:
        contacts = d_inter.contacts()
        contacts = _shift(contacts, ["j"], offset_2)
        plot_pairs(
            contacts, symmetric=False, ax=ax, style=contact_style
        )
        if contacts is not None:
            flipped = contacts.rename(columns={"i": "j", "j": "i"})
            plot_pairs(
                flipped, symmetric=False, ax=ax, style=contact_style
            )
    inter_shifted = _shift(inter_ecs, ["j"], offset_2)
    if inter_shifted is not None:
        plot_pairs(
            inter_shifted, symmetric=False, ax=ax, style=ec_style
        )
        flipped = inter_shifted.rename(columns={"i": "j", "j": "i"})
        plot_pairs(flipped, symmetric=False, ax=ax, style=ec_style)

    # secondary-structure cartoons: monomer 1 in place, monomer 2
    # shifted into its block
    if show_secstruct:
        def _ss_dict(dm, offset):
            res = dm.residues_i
            if "sec_struct_3state" not in res.columns:
                return None
            res = res.dropna(subset=["sec_struct_3state"])
            if len(res) == 0:
                return None
            # residue ids may be strings with non-numeric entries
            # (insertion codes) — coerce like _shift above
            pos_num = pd.to_numeric(res.id, errors="coerce")
            return {
                int(pos) + offset: state for pos, state in zip(
                    pos_num, res.sec_struct_3state
                ) if pd.notna(pos)
            }

        ss = {}
        if d_intra_i is not None:
            ss.update(_ss_dict(d_intra_i, 0) or {})
        if d_intra_j is not None:
            ss.update(_ss_dict(d_intra_j, offset_2) or {})
        if ss:
            plot_secondary_structure(ss, ax=ax, style=secstruct_style)

    ax.set_xlim(lo, hi)
    ax.set_ylim(hi, lo)
    ax.set_aspect("equal", adjustable="box")
    return ax
