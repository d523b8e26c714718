#!/usr/bin/env python3
"""Estimate the local ECS width around a cell membrane (equivalent of the
reference's compute_local_width.py, which uses pyvista+KDTree): for each
membrane vertex, the distance to the nearest membrane vertex of the
OTHER cell (or the domain boundary), computed with scipy's cKDTree on
this framework's mesh structures."""

import argparse
import sys
from pathlib import Path

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))


def local_ecs_width(geom, tag_a: int, tag_b: int):
    """Distance from each membrane-dof of cell `tag_a` to the nearest
    membrane-dof of cell `tag_b`."""
    pa = geom.membranes[tag_a].coords
    pb = geom.membranes[tag_b].coords
    tree = cKDTree(pb)
    d, _ = tree.query(pa)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None, help="remarked emimesh XDMF")
    ap.add_argument("--tags", type=int, nargs=2, default=[1, 2])
    args = ap.parse_args()
    from knpemi_tpu.ops.geometry import build_geometry

    if args.mesh:
        from knpemi_tpu.io import read_mesh

        mesh = read_mesh(args.mesh)
    else:
        from knpemi_tpu.mesh.tissue import astrocyte_tissue_mesh

        mesh = astrocyte_tissue_mesh(0)
    geom = build_geometry(mesh)
    d = local_ecs_width(geom, *args.tags)
    print(f"ECS width between membranes {args.tags}: "
          f"min {d.min():.3e} cm, median {np.median(d):.3e} cm, "
          f"max {d.max():.3e} cm")


if __name__ == "__main__":
    main()
