#!/usr/bin/env python3
"""Discover ROI probe coordinates for the astrocyte figures.

Counterpart of the point-finding half of the reference's astrocyte
``remark_mesh.py`` (local_astrocyte_depolarization/remark_mesh.py:15-59
``print_coordinates``): for each domain of interest — neuron membrane,
glial membrane, neuron ICS, glial ICS, ECS — pick the median in-ROI
point plus the +-5 neighbors, and print them in the reference's
``x_M = ...`` format for pasting into figure/compare configs.

The ROI defaults to the stimulation box of the baseline astrocyte
config (x/y 2100-2900 nm, z 2100-2500 nm, in cm).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from knpemi_tpu.mesh.tissue import find_roi_points, astrocyte_tissue_mesh
from knpemi_tpu.ops.geometry import build_geometry


def print_points(points, domain, prefix):
    for p in points:
        print(f"Coordinates of point in {domain}")
        for ax, v in zip("xyz", p):
            print(f"{ax}_{prefix} = {v}")
        print("-----------------------------------")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", nargs="?", default=None,
                    help="remarked XDMF mesh (default: builtin astro:0)")
    ap.add_argument("--resolution", type=int, default=0)
    ap.add_argument("--roi", type=float, nargs=6,
                    default=[2100e-7, 2100e-7, 2100e-7,
                             2900e-7, 2900e-7, 2500e-7],
                    metavar=("XL", "YL", "ZL", "XU", "YU", "ZU"))
    args = ap.parse_args()

    if args.mesh:
        from knpemi_tpu.io import read_mesh

        mesh = read_mesh(args.mesh)
    else:
        mesh = astrocyte_tissue_mesh(args.resolution)
    geom = build_geometry(mesh)
    lo, hi = args.roi[:3], args.roi[3:]
    lo = lo[: geom.dim]
    hi = hi[: geom.dim]

    names = {0: "ECS"}
    for t in geom.cell_tags_list:
        names[t] = f"ICS cell {t}"

    for mtag, mem in sorted(geom.membranes.items()):
        try:
            pts = find_roi_points(mem.coords, lo, hi)
        except ValueError:
            print(f"(membrane {mtag}: no dofs in ROI)")
            continue
        print_points(pts, f"membrane {mtag} (cell {mem.cell_tag})", "M")
    for t, sub in sorted(geom.subdomains.items()):
        try:
            pts = find_roi_points(sub.coords, lo, hi)
        except ValueError:
            print(f"({names[t]}: no dofs in ROI)")
            continue
        print_points(pts, names[t], "e" if t == 0 else "i")


if __name__ == "__main__":
    main()
