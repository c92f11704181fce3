"""Shared matplotlib styling for the example figures (VERDICT r2 item 9).

Colors are the published Okabe-Ito colorblind-safe set (the palette
validator needs node, absent in this image, so a pre-validated published
palette is used instead); series that can overlap additionally differ in
linestyle, so identity is never color-alone. Grid/axes stay recessive;
one y-axis per panel.
"""

import os

BLUE = "#0072B2"
VERMILLION = "#D55E00"
GREEN = "#009E73"
GRAY = "#999999"
INK = "#333333"

FIG_DIR = os.path.join(os.path.dirname(__file__), "figures")


def get_pyplot():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams.update(
        {
            "figure.dpi": 130,
            "axes.spines.top": False,
            "axes.spines.right": False,
            "axes.grid": True,
            "grid.color": "#e6e6e6",
            "grid.linewidth": 0.6,
            "axes.edgecolor": "#bbbbbb",
            "axes.labelcolor": INK,
            "text.color": INK,
            "xtick.color": "#666666",
            "ytick.color": "#666666",
            "font.size": 9,
            "legend.frameon": False,
        }
    )
    return plt


def save(fig, name: str) -> str:
    os.makedirs(FIG_DIR, exist_ok=True)
    path = os.path.join(FIG_DIR, name)
    fig.savefig(path, bbox_inches="tight")
    return path
