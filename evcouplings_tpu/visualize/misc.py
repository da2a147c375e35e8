"""
Shared visualization helpers (style context, color mapping).

Parity target: reference evcouplings/visualize/misc.py —
plot_context (:11), remove_chart_junk (:73), rgb2hex (:111),
colormap (:138).
"""

import matplotlib as mpl
import matplotlib.pyplot as plt


def plot_context(font="Helvetica", size=12, axis_label_size=12,
                 axis_title_size=14, axis_line_width=1,
                 tick_label_size=12, tick_direction="out", dpi=300,
                 additional_param_dict=None):
    """matplotlib rc_context with sensible publication-figure defaults."""
    rc_params = dict.fromkeys(
        ("xtick.labelsize", "ytick.labelsize"), tick_label_size
    )
    rc_params.update(dict.fromkeys(
        ("xtick.direction", "ytick.direction"), tick_direction
    ))
    rc_params.update(dict.fromkeys(("figure.dpi", "savefig.dpi"), dpi))
    rc_params.update({
        "font.family": font,
        "font.size": size,
        "axes.labelsize": axis_label_size,
        "axes.titlesize": axis_title_size,
        "axes.linewidth": axis_line_width,
        "savefig.bbox": "tight",
        "pdf.fonttype": 42,  # embed editable TrueType text
    })
    rc_params.update(additional_param_dict or {})

    return mpl.rc_context(rc_params)


def remove_chart_junk(ax=None, remove=("top", "right"),
                      x_ticks_loc="bottom", y_ticks_loc="left",
                      hide_x_labels=False, hide_y_labels=False):
    """Remove spines/ticks for a cleaner plot."""
    if ax is None:
        ax = plt.gca()

    for edge in remove:
        ax.spines[edge].set_visible(False)

    ax.xaxis.set_ticks_position(x_ticks_loc)
    ax.yaxis.set_ticks_position(y_ticks_loc)

    for hide, labels in (
        (hide_x_labels, ax.get_xticklabels()),
        (hide_y_labels, ax.get_yticklabels()),
    ):
        if hide:
            plt.setp(labels, visible=False)


def rgb2hex(r, g, b, a=None):
    """RGB fractions (0-1) to "#rrggbb" (alpha ignored)."""
    channels = (int(255 * c) for c in (r, g, b))
    return "#" + "".join("{:02x}".format(c) for c in channels)


def colormap(min_value, max_value, colormap=None, to_hex=True):
    """Value -> color mapping function over [min_value, max_value]."""
    mapper = plt.cm.ScalarMappable(
        norm=mpl.colors.Normalize(vmin=min_value, vmax=max_value),
        cmap=plt.cm.RdBu_r if colormap is None else colormap,
    )

    def _colmap(value):
        rgba = mapper.to_rgba(value)
        return rgb2hex(*rgba) if to_hex else rgba

    return _colmap
