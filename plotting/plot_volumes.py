#!/usr/bin/env python3
"""Subdomain volume bar chart (analog of the reference's
plotting/plot_volumes.py, which hardcodes the paper geometry's numbers).

Here the volumes are COMPUTED from the mesh — sum of cell measures per
subdomain tag (ECS 0, cells 1,2,...) — so the chart works for any
geometry; pass --builtin or an XDMF path like plot_mesh.py.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# reference color conventions (plot_volumes.py:4-9)
COLORS = {"ECS": "#4e5f70", "glial": "#ff67ff", "neuron": "#16a085"}
FALLBACK = ["#4e5f70", "#16a085", "#ff67ff", "#00ff00", "#e1fae1"]


def load_mesh(args):
    if args.builtin:
        kind, _, arg = args.builtin.partition(":")
        arg = int(arg or 0)
        from knpemi_tpu.mesh import unit_square_mms_mesh, idealized_2d_mesh
        from knpemi_tpu.mesh.generators import idealized_3d_mesh
        from knpemi_tpu.mesh.tissue import (
            two_cell_tissue_mesh, astrocyte_tissue_mesh,
        )

        return {
            "mms": unit_square_mms_mesh,
            "idealized2d": idealized_2d_mesh,
            "idealized3d": idealized_3d_mesh,
            "two_cell": two_cell_tissue_mesh,
            "astro": astrocyte_tissue_mesh,
        }[kind](arg)
    from knpemi_tpu.io import read_mesh

    return read_mesh(args.mesh)


def bar_chart(labels, values, colors, ylabel, out):
    tot = sum(values)
    fig, ax = plt.subplots(figsize=(8, 6))
    bars = ax.bar(labels, values, color=colors)
    for bar, v in zip(bars, values):
        ax.text(
            bar.get_x() + bar.get_width() / 2,
            bar.get_height() * 1.02,
            f"{100 * v / tot:.0f}%",
            ha="center", va="bottom", fontsize=14,
        )
    ax.set_ylabel(ylabel, fontsize=16)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    ax.yaxis.grid(True, color="black", linewidth=0.8)
    plt.xticks(rotation=30, fontsize=14)
    plt.tight_layout()
    plt.savefig(out, dpi=130)
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", nargs="?", default=None, help="XDMF mesh path")
    ap.add_argument("--builtin", default=None,
                    help="mms:N | idealized2d:R | idealized3d:R | "
                         "two_cell:R | astro:R")
    ap.add_argument("--names", default=None,
                    help="comma-separated subdomain names (default: "
                         "ECS,cell1,cell2,...)")
    ap.add_argument("--unit-scale", type=float, default=1e4,
                    help="coordinate unit -> um factor (default 1e4: cm)")
    ap.add_argument("--out", default="volumes.png")
    args = ap.parse_args()

    from knpemi_tpu.ops.geometry import build_geometry

    geom = build_geometry(load_mesh(args))
    s = args.unit_scale
    dimfac = s ** geom.dim
    tags = geom.sub_tags
    vols = [float(geom.subdomains[t].vols.sum()) * dimfac for t in tags]
    if args.names:
        labels = args.names.split(",")
    else:
        labels = ["ECS" if t == 0 else f"cell{t}" for t in tags]
    colors = [
        COLORS.get(lbl, FALLBACK[i % len(FALLBACK)])
        for i, lbl in enumerate(labels)
    ]
    unit = r"$\mu m^3$" if geom.dim == 3 else r"$\mu m^2$"
    for lbl, v in zip(labels, vols):
        print(f"  {lbl}: {v:.4g} {unit}")
    bar_chart(labels, vols, colors, f"volume ({unit})", args.out)


if __name__ == "__main__":
    main()
