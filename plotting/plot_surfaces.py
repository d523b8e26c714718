#!/usr/bin/env python3
"""Membrane surface-area bar chart (analog of the reference's
plotting/plot_surfaces.py, which hardcodes the paper geometry's numbers).

Areas are COMPUTED from the mesh: sum of membrane facet measures per
membrane tag, optionally grouped per owning cell subdomain.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from plot_volumes import load_mesh, bar_chart, COLORS, FALLBACK  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", nargs="?", default=None, help="XDMF mesh path")
    ap.add_argument("--builtin", default=None,
                    help="mms:N | idealized2d:R | idealized3d:R | "
                         "two_cell:R | astro:R")
    ap.add_argument("--per-cell", action="store_true",
                    help="group membrane tags by owning cell subdomain")
    ap.add_argument("--names", default=None)
    ap.add_argument("--unit-scale", type=float, default=1e4,
                    help="coordinate unit -> um factor (default 1e4: cm)")
    ap.add_argument("--out", default="surfaces.png")
    args = ap.parse_args()

    from knpemi_tpu.ops.geometry import build_geometry

    geom = build_geometry(load_mesh(args))
    s = args.unit_scale
    dimfac = s ** (geom.dim - 1)
    if args.per_cell:
        groups = {}
        for m, sp in geom.membranes.items():
            groups.setdefault(sp.cell_tag, 0.0)
            groups[sp.cell_tag] += float(sp.areas.sum()) * dimfac
        labels = [f"cell{t}" for t in sorted(groups)]
        areas = [groups[t] for t in sorted(groups)]
    else:
        tags = sorted(geom.membranes)
        labels = [f"membrane {m}" for m in tags]
        areas = [float(geom.membranes[m].areas.sum()) * dimfac for m in tags]
    if args.names:
        labels = args.names.split(",")
    colors = [
        COLORS.get(lbl, FALLBACK[i % len(FALLBACK)])
        for i, lbl in enumerate(labels)
    ]
    unit = r"$\mu m^2$" if geom.dim == 3 else r"$\mu m$"
    for lbl, a in zip(labels, areas):
        print(f"  {lbl}: {a:.4g} {unit}")
    bar_chart(labels, areas, colors, f"surface area ({unit})", args.out)


if __name__ == "__main__":
    main()
