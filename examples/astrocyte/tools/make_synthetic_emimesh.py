#!/usr/bin/env python3
"""Generate a synthetic emimesh-convention tissue mesh for the flagship
driver's ``mesh_file`` path.

The reference's flagship runs on emimesh reconstructions converted by
its remark_mesh.py (nm coordinates, ECS cell tag 1, neuron/glial cell
tags, membrane facets tagged by owning-cell tag, exterior by a spare
tag) — but ships no emimesh inputs.  This tool writes a tissue mesh *in
those conventions* so the whole config-driven pipeline — read_mesh ->
remark (tag_map + nm->cm scale) -> geometry -> simulation — runs end to
end exactly as it would on a real reconstruction:

    python examples/astrocyte/tools/make_synthetic_emimesh.py \
        --n 16 --out results/emimesh/mesh.xdmf
    python examples/astrocyte/run_stim_duration.py -c emimesh --Tstop 2

Conventions written (reference remark_mesh.py:91-150): coordinates nm,
ECS cells 1, neuron cells 7, glial cells 100, membrane facets tagged by
the owning cell tag, exterior facets 200.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from knpemi_tpu.mesh.core import Mesh
from knpemi_tpu.mesh.generators import _structured_tets, _tag_cells_in_boxes
from knpemi_tpu.io.xdmf import write_mesh


def synthetic_emimesh(n: int = 16, L: float = 4000.0) -> Mesh:
    """(L nm)^3 ECS box with a neuron strip (emimesh tag 7) and a glial
    strip (tag 100), mirroring the two-cell tissue topology."""
    points, cells = _structured_tets(n, n, n, (0, 0, 0), (L, L, L))
    w = L / 8.0
    boxes = [
        ((L / 8, 2 * w, 2 * w), (7 * L / 8, 3 * w, 3 * w), 7),
        ((L / 8, 5 * w, 5 * w), (7 * L / 8, 6 * w, 6 * w), 100),
    ]
    tags = _tag_cells_in_boxes(points, cells, boxes)
    tags[tags == 0] = 1  # emimesh ECS convention
    mesh = Mesh(points=points, cells=cells, cell_tags=tags)
    ft = np.zeros(mesh.n_facets, np.int32)
    for tag in (7, 100):
        ft[mesh.interface_facet_mask(1, tag)] = tag
    ft[mesh.exterior_facet_mask()] = 200
    mesh.facet_tags = ft
    return mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="cells per axis")
    ap.add_argument("--L", type=float, default=4000.0, help="edge (nm)")
    ap.add_argument("--out", default="results/emimesh/mesh.xdmf")
    args = ap.parse_args()

    mesh = synthetic_emimesh(args.n, args.L)
    write_mesh(Path(args.out), mesh, cell_tag_name="mesh",
               facet_tag_name="mesh_facets")
    counts = {int(t): int((mesh.cell_tags == t).sum())
              for t in np.unique(mesh.cell_tags)}
    print(f"wrote {args.out}: {mesh.n_cells} cells, tags {counts}, "
          f"{int((mesh.facet_tags > 0).sum())} tagged facets")


if __name__ == "__main__":
    main()
