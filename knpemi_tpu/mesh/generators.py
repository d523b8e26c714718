"""Mesh generators replicating the reference geometries.

Replaces (with identical tag conventions):
* tests/make_mesh_mms.py        -> :func:`unit_square_mms_mesh`
* examples/.../make_mesh_2D.py  -> :func:`idealized_2d_mesh`
* examples/.../make_mesh_3D.py  -> :func:`idealized_3d_mesh`

Design delta vs the reference: the 3-D idealized mesh is generated as a
face-consistent Kuhn tetrahedralization of the structured box (6 tets per
hex) rather than dolfinx's hexahedral ``create_box``
(make_mesh_3D.py:99-102).  The geometry (4 axon boxes in a
32 x 0.9 x 0.9 um box) and all tags are the same; the framework's element
kernels are simplex (P1) kernels.
"""

from __future__ import annotations

import numpy as np

from .core import Mesh, EXTERIOR_BOUNDARY_TAG


def _structured_triangles(nx: int, ny: int, p0, p1):
    """Uniform triangulation of [p0, p1], 2 triangles per quad (diagonal from
    lower-left to upper-right, matching dolfinx's default 'right' diagonal)."""
    xs = np.linspace(p0[0], p1[0], nx + 1)
    ys = np.linspace(p0[1], p1[1], ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    points = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    i = i.ravel()
    j = j.ravel()
    v00 = vid(i, j)
    v10 = vid(i + 1, j)
    v01 = vid(i, j + 1)
    v11 = vid(i + 1, j + 1)
    # two triangles per quad: (v00, v10, v11) and (v00, v11, v01)
    tris = np.concatenate(
        [
            np.stack([v00, v10, v11], axis=1),
            np.stack([v00, v11, v01], axis=1),
        ],
        axis=0,
    )
    return points, tris.astype(np.int32)


# The 6 tetrahedra of the Kuhn subdivision of the unit cube: each tet is the
# path 0 -> +e_{p(0)} -> +e_{p(1)} -> +e_{p(2)} for a permutation p.  Face
# diagonals always run from the cube's min corner path, so neighbouring
# cubes' faces match.
_KUHN_PERMS = [
    (0, 1, 2),
    (0, 2, 1),
    (1, 0, 2),
    (1, 2, 0),
    (2, 0, 1),
    (2, 1, 0),
]


def _structured_tets(nx: int, ny: int, nz: int, p0, p1):
    xs = np.linspace(p0[0], p1[0], nx + 1)
    ys = np.linspace(p0[1], p1[1], ny + 1)
    zs = np.linspace(p0[2], p1[2], nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    points = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    i, j, k = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    i = i.ravel()
    j = j.ravel()
    k = k.ravel()
    base = np.stack([i, j, k], axis=1)  # (ncube, 3)
    tets = []
    e = np.eye(3, dtype=np.int64)
    for perm in _KUHN_PERMS:
        c0 = base
        c1 = c0 + e[perm[0]]
        c2 = c1 + e[perm[1]]
        c3 = c2 + e[perm[2]]
        ids = [vid(c[:, 0], c[:, 1], c[:, 2]) for c in (c0, c1, c2, c3)]
        tets.append(np.stack(ids, axis=1))
    cells = np.concatenate(tets, axis=0).astype(np.int32)
    return points, cells


def _tag_cells_in_boxes(points, cells, boxes, tol=1e-12):
    """Cell tag = box tag if ALL cell vertices lie inside the (padded) box,
    mirroring dolfinx.mesh.locate_entities with the reference's vertex
    predicates (make_mesh_2D.py:35-41)."""
    tags = np.zeros(cells.shape[0], dtype=np.int32)
    mids = points[cells]  # (nc, d+1, dim)
    for lo, hi, tag in boxes:
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        inside = ((mids >= lo - tol) & (mids <= hi + tol)).all(axis=(1, 2))
        tags[inside] = tag
    return tags


def _finish(points, cells, cell_tags, membrane_tag_of_cell_tag=None):
    mesh = Mesh(points=points, cells=cells, cell_tags=cell_tags)
    mesh.facet_tags = mesh.default_facet_tags(membrane_tag_of_cell_tag)
    return mesh


def rectangle_2d_mesh(nx, ny, p0, p1, boxes):
    points, cells = _structured_triangles(nx, ny, p0, p1)
    tags = _tag_cells_in_boxes(points, cells, boxes)
    return _finish(points, cells, tags)


def box_3d_mesh(nx, ny, nz, p0, p1, boxes, membrane_tag_of_cell_tag=None):
    points, cells = _structured_tets(nx, ny, nz, p0, p1)
    tags = _tag_cells_in_boxes(points, cells, boxes)
    return _finish(points, cells, tags, membrane_tag_of_cell_tag)


def unit_square_mms_mesh(M: int) -> Mesh:
    """Unit square, M x M, inner box [0.25, 0.75]^2 tagged 1
    (tests/make_mesh_mms.py:21-24, 43-100).  Membrane facet tag 1,
    exterior boundary tag 5."""
    return rectangle_2d_mesh(
        M, M, (0.0, 0.0), (1.0, 1.0), [((0.25, 0.25), (0.75, 0.75), 1)]
    )


def unit_cube_mms_mesh(M: int) -> Mesh:
    """3-D MMS mesh: unit cube, inner box [0.25, 0.75]^3 tagged 1 (the
    3-D extension of tests/make_mesh_mms.py; the reference verifies in
    2-D only)."""
    return box_3d_mesh(
        M, M, M, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
        [((0.25, 0.25, 0.25), (0.75, 0.75, 0.75), 1)],
    )


def idealized_2d_mesh(resolution_factor: int) -> Mesh:
    """62 x 4 um rectangle with embedded 60 x 2 um neuron strip tagged 1
    (make_mesh_2D.py:21-27, 43-50): nx = 31 * 2^r, ny = 2 * 2^r."""
    r = resolution_factor
    return rectangle_2d_mesh(
        31 * 2**r,
        2 * 2**r,
        (0.0, 0.0),
        (62.0e-6, 4.0e-6),
        [((1e-6, 1e-6), (61e-6, 3e-6), 1)],
    )


def idealized_3d_mesh(resolution_factor: int, l: int = 2) -> Mesh:
    """4-axon box, all axons tagged 1 (make_mesh_3D.py:12-25, 89-143):
    box [0, l*16e-6] x [0, 0.9e-6]^2, nx = l*16*2^r, ny = nz = 9*2^r."""
    r = resolution_factor
    L = l * 16e-6
    axons = [
        ((5e-6, 0.2e-6, 0.2e-6), (L - 5e-6, 0.4e-6, 0.4e-6), 1),
        ((5e-6, 0.5e-6, 0.5e-6), (L - 5e-6, 0.7e-6, 0.7e-6), 1),
        ((5e-6, 0.5e-6, 0.2e-6), (L - 5e-6, 0.7e-6, 0.4e-6), 1),
        ((5e-6, 0.2e-6, 0.5e-6), (L - 5e-6, 0.4e-6, 0.7e-6), 1),
    ]
    return box_3d_mesh(
        l * 16 * 2**r,
        9 * 2**r,
        9 * 2**r,
        (0.0, 0.0, 0.0),
        (L, 0.9e-6, 0.9e-6),
        axons,
    )
