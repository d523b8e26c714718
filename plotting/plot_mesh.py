#!/usr/bin/env python3
"""Visualize a mesh with its cell/facet tags (analog of the reference's
astrocyte plotting/plot_mesh.py, matplotlib instead of pyvista)."""

import argparse
import sys
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", nargs="?", default=None, help="XDMF mesh path")
    ap.add_argument("--builtin", default=None,
                    help="mms:N | idealized2d:R | two_cell:R | astro:R")
    ap.add_argument("--out", default="mesh.png")
    args = ap.parse_args()

    if args.builtin:
        kind, _, arg = args.builtin.partition(":")
        arg = int(arg or 0)
        from knpemi_tpu.mesh import unit_square_mms_mesh, idealized_2d_mesh
        from knpemi_tpu.mesh.tissue import (
            two_cell_tissue_mesh, astrocyte_tissue_mesh,
        )

        mesh = {"mms": unit_square_mms_mesh,
                "idealized2d": idealized_2d_mesh,
                "two_cell": two_cell_tissue_mesh,
                "astro": astrocyte_tissue_mesh}[kind](arg)
    else:
        from knpemi_tpu.io import read_mesh

        mesh = read_mesh(args.mesh)

    fig, axes = plt.subplots(1, 2, figsize=(13, 5))
    mids = mesh.cell_midpoints()
    if mesh.dim == 3:
        zmid = 0.5 * (mesh.points[:, 2].min() + mesh.points[:, 2].max())
        sel = np.abs(mids[:, 2] - zmid) < (np.ptp(mesh.points[:, 2]) / 12)
    else:
        sel = np.ones(mesh.n_cells, bool)
    sc = axes[0].scatter(mids[sel, 0], mids[sel, 1], c=mesh.cell_tags[sel],
                         s=3, cmap="tab10")
    axes[0].set_title("cell tags" + (" (mid-z slice)" if mesh.dim == 3 else ""))
    plt.colorbar(sc, ax=axes[0])
    fmids = mesh.facet_midpoints(np.arange(mesh.n_facets))
    tagged = mesh.facet_tags > 0
    if mesh.dim == 3:
        tagged &= np.abs(fmids[:, 2] - zmid) < (np.ptp(mesh.points[:, 2]) / 12)
    sc = axes[1].scatter(fmids[tagged, 0], fmids[tagged, 1],
                         c=mesh.facet_tags[tagged], s=3, cmap="tab10")
    axes[1].set_title("facet tags (membranes + boundary)")
    plt.colorbar(sc, ax=axes[1])
    for ax in axes:
        ax.set_aspect("equal")
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
