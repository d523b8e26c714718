#!/usr/bin/env python3
"""ROI renderings of a 3-D tissue geometry (matplotlib analog of the
reference's pyvista plotting/plot_roi.py:45-305).

For each slice normal (x, y, z) through the ROI center this renders:

* the exact cross-section of the subdomain geometry on the slice plane
  (marching-tetrahedra polygons via render3d.plane_slice — the analog
  of pyvista ``grid.slice()``; ECS / per-cell reference colors),
* optionally a vertex field on the slice (a named field from a
  TimeSeriesWriter XDMF, or the computed local ECS width between two
  membranes — the reference's grid_ECS_width/grid_glial_width views),
* the ROI box outline,
* with ``--surface``, a 3-D membrane-surface rendering of the ROI
  (Poly3DCollection triangles, z-sorted; optional width coloring) —
  the pyvista-free analog of the reference's surface views.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Rectangle

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SUB_COLORS = {0: "#4e5f70", 1: "#16a085", 2: "#ff67ff", 3: "#00ff00"}
AXES = {"x": 0, "y": 1, "z": 2}


def slice_scatter(ax, geom, normal, origin, field=None, field_tag=None,
                  cmap="jet"):
    """Scatter the dofs within half a local mesh width of the plane."""
    n = AXES[normal]
    keep = [d for d in range(geom.dim) if d != n]
    sc = None
    for t, sub in sorted(geom.subdomains.items()):
        coords = sub.coords
        h = np.median(sub.vols) ** (1.0 / geom.dim)
        mask = np.abs(coords[:, n] - origin[n]) < h
        if not mask.any():
            continue
        pts = coords[mask][:, keep]
        if field is not None and t == field_tag:
            sc = ax.scatter(pts[:, 0], pts[:, 1], c=field[mask], s=4,
                            cmap=cmap)
        else:
            ax.scatter(pts[:, 0], pts[:, 1], color=SUB_COLORS.get(t, "k"),
                       s=2 if t == 0 else 4)
    return sc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", nargs="?", default=None, help="XDMF mesh path")
    ap.add_argument("--builtin", default="astro:1",
                    help="two_cell:R | astro:R (default astro:1)")
    ap.add_argument("--roi", type=float, nargs=6,
                    default=[2100e-7, 2100e-7, 2100e-7,
                             2900e-7, 2900e-7, 2500e-7])
    ap.add_argument("--width-tags", type=int, nargs=2, default=None,
                    help="render local ECS width between these membrane "
                         "tags on the first tag's membrane dofs")
    ap.add_argument("--timeseries", default=None,
                    help="TimeSeriesWriter XDMF with vertex fields")
    ap.add_argument("--field", default=None,
                    help="field name in --timeseries (last step is drawn)")
    ap.add_argument("--field-tag", type=int, default=0,
                    help="subdomain tag the field lives on")
    ap.add_argument("--surface", action="store_true",
                    help="also render the 3-D membrane surfaces in the "
                         "ROI (Poly3DCollection; colored by local ECS "
                         "width when --width-tags is given)")
    ap.add_argument("--out", default="roi.png")
    args = ap.parse_args()

    from knpemi_tpu.ops.geometry import build_geometry

    if args.mesh:
        from knpemi_tpu.io import read_mesh

        mesh = read_mesh(args.mesh)
    else:
        kind, _, arg = args.builtin.partition(":")
        from knpemi_tpu.mesh.tissue import (
            two_cell_tissue_mesh, astrocyte_tissue_mesh,
        )

        mesh = {"two_cell": two_cell_tissue_mesh,
                "astro": astrocyte_tissue_mesh}[kind](int(arg or 0))
    geom = build_geometry(mesh)
    assert geom.dim == 3, "ROI slice views are for 3-D meshes"

    field = None
    field_tag = args.field_tag
    if args.field and args.timeseries:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from plot_fields import read_timeseries

        _, _, steps = read_timeseries(args.timeseries)
        field = np.asarray(steps[-1][1][args.field])

    lo = np.asarray(args.roi[:3])
    hi = np.asarray(args.roi[3:])
    origin = 0.5 * (lo + hi)

    import render3d

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    fields = {field_tag: field} if field is not None else None
    for ax, normal in zip(axes, "xyz"):
        n = AXES[normal]
        keep = [d for d in range(3) if d != n]
        sc = render3d.plane_slice(ax, geom, n, origin, fields=fields)
        ax.add_patch(Rectangle(
            (lo[keep[0]], lo[keep[1]]),
            hi[keep[0]] - lo[keep[0]], hi[keep[1]] - lo[keep[1]],
            fill=False, edgecolor="#ffff00", linewidth=2,
        ))
        ax.set_title(f"slice normal {normal}")
        ax.set_aspect("equal")
        if sc is not None:
            fig.colorbar(sc, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print("wrote", args.out)

    if args.surface:
        fig3 = plt.figure(figsize=(9, 7))
        ax3 = fig3.add_subplot(111, projection="3d")
        wfields = None
        if args.width_tags:
            sys.path.insert(
                0,
                str(Path(__file__).resolve().parents[1]
                    / "examples" / "astrocyte" / "tools"),
            )
            from compute_local_width import local_ecs_width

            ta, tb = args.width_tags
            wfields = {ta: local_ecs_width(geom, ta, tb) * 1e7}
        mp = render3d.membrane_surface(
            ax3, geom, fields=wfields, clip=(lo, hi),
        )
        render3d.roi_box_outline(ax3, lo, hi)
        if mp is not None:
            fig3.colorbar(mp, ax=ax3, shrink=0.7, label="ECS width (nm)")
        ax3.set_title("membrane surfaces in ROI")
        out3 = str(Path(args.out).with_suffix("")) + "_surface.png"
        fig3.savefig(out3, dpi=130, bbox_inches="tight")
        print("wrote", out3)

    if args.width_tags:
        sys.path.insert(
            0,
            str(Path(__file__).resolve().parents[1]
                / "examples" / "astrocyte" / "tools"),
        )
        from compute_local_width import local_ecs_width

        ta, tb = args.width_tags
        w = local_ecs_width(geom, ta, tb)
        mem = geom.membranes[ta]
        fig2, axes2 = plt.subplots(1, 3, figsize=(16, 5))
        for ax, normal in zip(axes2, "xyz"):
            n = AXES[normal]
            keep = [d for d in range(3) if d != n]
            h = np.median(geom.subdomains[0].vols) ** (1.0 / 3)
            mask = np.abs(mem.coords[:, n] - origin[n]) < 2 * h
            pts = mem.coords[mask][:, keep]
            sc = ax.scatter(pts[:, 0], pts[:, 1], c=w[mask] * 1e7, s=6,
                            cmap="jet")
            ax.add_patch(Rectangle(
                (lo[keep[0]], lo[keep[1]]),
                hi[keep[0]] - lo[keep[0]], hi[keep[1]] - lo[keep[1]],
                fill=False, edgecolor="#ffff00", linewidth=2,
            ))
            ax.set_title(f"ECS width (nm), slice normal {normal}")
            ax.set_aspect("equal")
            fig2.colorbar(sc, ax=ax, shrink=0.8)
        out2 = str(Path(args.out).with_suffix("")) + "_width.png"
        fig2.tight_layout()
        fig2.savefig(out2, dpi=130, bbox_inches="tight")
        print("wrote", out2)


if __name__ == "__main__":
    main()
