#!/usr/bin/env python3
"""Render saved time-series fields (matplotlib).

Analog of the reference's pyvista-based plotting/plot_roi.py /
plot_surfaces.py / examples/*/make_figures.py field renderings
(SURVEY.md C21/C23).  pyvista is not available in this environment, so
2-D fields are drawn as triangulated pseudocolor plots and 3-D fields as
axis-aligned slice scatter plots; the data source is this framework's
XDMF time-series output (knpemi_tpu.io.TimeSeriesWriter).
"""

from __future__ import annotations

import argparse
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.tri as mtri


def read_timeseries(xdmf_path):
    """Read back a TimeSeriesWriter file: (points, cells, [(t, {name: arr})])."""
    import h5py

    h5path = str(Path(xdmf_path).with_suffix(".h5"))
    with h5py.File(h5path, "r") as h5:
        points = np.asarray(h5["/Mesh/geometry"])
        cells = np.asarray(h5["/Mesh/topology"])
        steps = []
        tree = ET.parse(xdmf_path)
        for grid in tree.getroot().iter("Grid"):
            if grid.get("GridType") != "Uniform":
                continue
            tnode = grid.find("Time")
            t = float(tnode.get("Value")) if tnode is not None else 0.0
            fields = {}
            for attr in grid.findall("Attribute"):
                key = attr.find("DataItem").text.split(":", 1)[1]
                fields[attr.get("Name")] = np.asarray(h5[key])
            steps.append((t, fields))
    return points, cells, steps


def plot_field(points, cells, values, ax, title=""):
    if points.shape[1] == 2:
        tri = mtri.Triangulation(points[:, 0], points[:, 1], cells)
        tpc = ax.tripcolor(tri, values, shading="gouraud")
        plt.colorbar(tpc, ax=ax)
    else:
        # mid-z slice scatter
        z = points[:, 2]
        zmid = 0.5 * (z.min() + z.max())
        tol = (z.max() - z.min()) / 20 + 1e-30
        m = np.abs(z - zmid) < tol
        sc = ax.scatter(points[m, 0], points[m, 1], c=values[m], s=4)
        plt.colorbar(sc, ax=ax)
    ax.set_title(title)
    ax.set_aspect("equal")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("xdmf", help="TimeSeriesWriter .xdmf file")
    ap.add_argument("--field", default=None)
    ap.add_argument("--steps", type=int, nargs="+", default=None)
    ap.add_argument("--out", default="fields.png")
    args = ap.parse_args()

    points, cells, steps = read_timeseries(args.xdmf)
    names = sorted(steps[0][1])
    field = args.field or names[0]
    idxs = args.steps or [0, len(steps) // 2, len(steps) - 1]
    fig, axes = plt.subplots(1, len(idxs), figsize=(6 * len(idxs), 5))
    if len(idxs) == 1:
        axes = [axes]
    for ax, i in zip(axes, idxs):
        t, fields = steps[i]
        plot_field(points, cells, fields[field], ax, f"{field} @ t={t:g}")
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
