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
    from matplotlib import rc_context

    param_dict = {
        "font.family": font,
        "font.size": size,
        "axes.labelsize": axis_label_size,
        "axes.titlesize": axis_title_size,
        "axes.linewidth": axis_line_width,
        "xtick.labelsize": tick_label_size,
        "ytick.labelsize": tick_label_size,
        "xtick.direction": tick_direction,
        "ytick.direction": tick_direction,
        "figure.dpi": dpi,
        "savefig.dpi": dpi,
        "savefig.bbox": "tight",
        "pdf.fonttype": 42,
    }
    if additional_param_dict is not None:
        param_dict.update(additional_param_dict)

    return rc_context(param_dict)


def remove_chart_junk(ax=None, remove=("top", "right"),
                      x_ticks_loc="bottom", y_ticks_loc="left",
                      hide_x_labels=False, hide_y_labels=False):
    """Remove spines/ticks for a cleaner plot."""
    if ax is None:
        ax = plt.gca()

    for line in remove:
        ax.spines[line].set_visible(False)

    ax.xaxis.set_ticks_position(x_ticks_loc)
    ax.yaxis.set_ticks_position(y_ticks_loc)

    if hide_x_labels:
        plt.setp(ax.get_xticklabels(), visible=False)
    if hide_y_labels:
        plt.setp(ax.get_yticklabels(), visible=False)


def rgb2hex(r, g, b, a=None):
    """RGB fractions (0-1) to "#rrggbb" (alpha ignored)."""
    return "#{:02x}{:02x}{:02x}".format(
        int(255 * r), int(255 * g), int(255 * b)
    )


def colormap(min_value, max_value, colormap=None, to_hex=True):
    """Value -> color mapping function over [min_value, max_value]."""
    if colormap is None:
        colormap = plt.cm.RdBu_r

    norm = mpl.colors.Normalize(vmin=min_value, vmax=max_value)
    mapper = plt.cm.ScalarMappable(norm=norm, cmap=colormap)

    def _colmap(value):
        rgba = mapper.to_rgba(value)
        return rgb2hex(*rgba) if to_hex else rgba

    return _colmap
