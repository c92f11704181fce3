"""Render the SNLG and MAT benchmark tables as committed figures.

Reads ``benchmarks/results.json`` (written on TPU by run_benchmarks.py)
and emits two PNGs under ``benchmarks/figures/``, each two panels:
accuracy (grouped bars, reference vs this framework — identity by legend
and position, never color alone) and per-filter speedup (log-scale
horizontal bars, direct labels). One axis per panel; palette/mark specs
from ``examples/figstyle.py`` (pre-validated Okabe-Ito; the palette
validator needs node, absent in this image).

Regenerate: python benchmarks/make_table_figures.py  (no TPU needed —
pure rendering of the checked-in results).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

import figstyle  # noqa: E402

FIG_DIR = os.path.join(REPO, "benchmarks", "figures")


def grouped_panel(ax, plt, names, ref_vals, our_vals, ylabel):
    import numpy as np

    x = np.arange(len(names))
    w = 0.38
    gap = 0.02  # ~2px surface gap between adjacent bars
    ax.bar(x - w / 2 - gap / 2, ref_vals, w, color=figstyle.GRAY,
           label="reference (CPU)")
    ax.bar(x + w / 2 + gap / 2, our_vals, w, color=figstyle.BLUE,
           label="this framework (TPU)")
    # Selective direct labels: only this framework's bars carry values
    # (labelling every bar collides at parity); the reference numbers
    # live in the BENCHMARKS.md table.
    for xi, v in zip(x + w / 2 + gap / 2, our_vals):
        ax.annotate(f"{v:.3g}", (xi, v), ha="center", va="bottom",
                    fontsize=7.5, color=figstyle.INK)
    ax.set_ylim(0, max(max(ref_vals), max(our_vals)) * 1.18)
    ax.set_xticks(x, names)
    ax.set_ylabel(ylabel)
    ax.legend(frameon=False, fontsize=8)


def speedup_panel(ax, plt, names, speedups):
    import numpy as np

    y = np.arange(len(names))[::-1]
    ax.barh(y, speedups, 0.55, color=figstyle.BLUE)
    for yi, v in zip(y, speedups):
        ax.annotate(f" {v:,.0f}×", (v, yi), va="center", fontsize=8,
                    color=figstyle.INK)
    ax.set_yticks(y, names)
    ax.set_xscale("log")
    ax.set_xlabel("speedup vs reference (log)")
    ax.set_xlim(1, max(speedups) * 8)


def main():
    res = json.load(open(os.path.join(REPO, "benchmarks", "results.json")))
    r = res["results"]
    plt = figstyle.get_pyplot()

    # ---- SNLG d=64 --------------------------------------------------------
    s = r["snlg_d64"]
    ref = s["reference"]
    rows = [
        ("KF", "kf_mse", "kf_total_s", "kf_s"),
        ("UKF", "ukf_mse", "ukf_total_s", "ukf_s"),
        ("EDH-200", "edh200_mse", "edh200_total_s", "edh200_s"),
        ("LEDH-200", "ledh200_mse", "ledh200_total_s", "ledh200_s"),
        ("EDH-10⁴", "edh10000_mse", "edh10000_total_s", "edh10000_s"),
    ]
    names = [n for n, *_ in rows]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8.6, 3.1))
    grouped_panel(
        ax1, plt, names,
        [ref[mk.replace("_total", "").replace("_mse", "_mse")] for _, mk, _, _ in rows],
        [s[mk] for _, mk, _, _ in rows],
        "MSE (100 trials, σ_z=2)",
    )
    ax1.set_title("SNLG d=64 — accuracy parity", fontsize=9)
    speedup_panel(
        ax2, plt, names,
        [ref[rk] * 100 / s[tk] for _, _, tk, rk in rows],
    )
    ax2.set_title("wall-time speedup (all 100 trials)", fontsize=9)
    fig.tight_layout()
    out1 = os.path.join(FIG_DIR, "snlg_table.png")
    fig.savefig(out1, bbox_inches="tight")
    print("wrote", out1)

    # ---- MAT --------------------------------------------------------------
    m = r["mat_flows"]
    mref = m["reference"]
    rows = [
        ("EDH", "edh_avg_omat", "edh_total_s", "edh_s", "edh_omat"),
        ("LEDH", "ledh_avg_omat", "ledh_total_s", "ledh_s", "ledh_omat"),
        ("EKF", "ekf_avg_omat", "ekf_total_s", "ekf_s", "ekf_omat"),
        ("UKF", "ukf_avg_omat", "ukf_total_s", "ukf_s", "ukf_omat"),
    ]
    names = [n for n, *_ in rows]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8.6, 3.1))
    grouped_panel(
        ax1, plt, names,
        [mref[ok] for *_, ok in rows],
        [m[mk] for _, mk, *_ in rows],
        "avg OMAT (lower = better)",
    )
    ax1.set_title("Multi-target acoustic tracking — accuracy", fontsize=9)
    speedup_panel(
        ax2, plt, names,
        [mref[rk] / m[tk] for _, _, tk, rk, _ in rows],
    )
    ax2.set_title("wall-time speedup (T=40, N=500)", fontsize=9)
    fig.tight_layout()
    out2 = os.path.join(FIG_DIR, "mat_table.png")
    fig.savefig(out2, bbox_inches="tight")
    print("wrote", out2)


if __name__ == "__main__":
    main()
