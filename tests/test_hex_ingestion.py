"""Hexahedral XDMF ingestion: reference-style hex meshes (the idealized
3-D geometries are dolfinx box meshes of hexes, make_mesh_3D.py:99-102)
must load via read_mesh as face-consistent Kuhn tets with cell and facet
tags carried over."""

import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np
import pytest

from knpemi_tpu.io import read_mesh
from knpemi_tpu.mesh.core import Mesh, split_hex_cells
from knpemi_tpu.ops.geometry import build_geometry


def _write_hex_xdmf(path, points, hexes, cell_tags, quads, facet_tags):
    """Minimal dolfinx-layout hex XDMF (mesh grid + cell/facet tag grids)."""
    import h5py

    path = Path(path)
    h5p = path.with_suffix(".h5")
    with h5py.File(h5p, "w") as h5:
        h5["/Mesh/geometry"] = points
        h5["/Mesh/topology"] = hexes.astype(np.int64)
        h5["/Mesh/cell_values"] = cell_tags.astype(np.int32)
        h5["/Mesh/facet_topology"] = quads.astype(np.int64)
        h5["/Mesh/facet_values"] = facet_tags.astype(np.int32)

    root = ET.Element("Xdmf", Version="3.0")
    dom = ET.SubElement(root, "Domain")

    def grid(name, topo_type, topo_key, nv, n_ents, attr_name=None,
             attr_key=None, with_geo=False):
        g = ET.SubElement(dom, "Grid", Name=name)
        topo = ET.SubElement(g, "Topology", TopologyType=topo_type,
                             NumberOfElements=str(n_ents))
        di = ET.SubElement(topo, "DataItem",
                           Dimensions=f"{n_ents} {nv}", Format="HDF")
        di.text = f"{h5p.name}:{topo_key}"
        if with_geo:
            geo = ET.SubElement(g, "Geometry", GeometryType="XYZ")
            di = ET.SubElement(geo, "DataItem",
                               Dimensions=f"{len(points)} 3", Format="HDF")
            di.text = f"{h5p.name}:/Mesh/geometry"
        if attr_name:
            at = ET.SubElement(g, "Attribute", Name=attr_name,
                               Center="Cell")
            di = ET.SubElement(at, "DataItem", Dimensions=str(n_ents),
                               Format="HDF")
            di.text = f"{h5p.name}:{attr_key}"

    grid("mesh", "Hexahedron", "/Mesh/topology", 8, len(hexes),
         with_geo=True)
    grid("cell_marker", "Hexahedron", "/Mesh/topology", 8, len(hexes),
         attr_name="cell_marker", attr_key="/Mesh/cell_values")
    grid("facet_marker", "Quadrilateral", "/Mesh/facet_topology", 4,
         len(quads), attr_name="facet_marker", attr_key="/Mesh/facet_values")
    ET.ElementTree(root).write(path)


def _hex_box(nx, ny, nz):
    """Structured hex grid on the unit box, VTK ring vertex order."""
    xs = np.linspace(0, 1, nx + 1)
    ys = np.linspace(0, 1, ny + 1)
    zs = np.linspace(0, 1, nz + 1)
    P = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    pts = P.reshape(-1, 3)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    hexes = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                hexes.append([
                    vid(i, j, k), vid(i + 1, j, k),
                    vid(i + 1, j + 1, k), vid(i, j + 1, k),
                    vid(i, j, k + 1), vid(i + 1, j, k + 1),
                    vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1),
                ])
    return pts, np.asarray(hexes)


def test_hex_xdmf_roundtrip(tmp_path):
    nx = ny = nz = 4
    pts, hexes = _hex_box(nx, ny, nz)
    mids = pts[hexes].mean(axis=1)
    # inner box tagged 1 (an "axon"), rest ECS 0
    inner = (
        (np.abs(mids[:, 0] - 0.5) < 0.25)
        & (np.abs(mids[:, 1] - 0.5) < 0.25)
        & (np.abs(mids[:, 2] - 0.5) < 0.25)
    )
    cell_tags = inner.astype(np.int32)

    # tag the membrane quads (between 0/1 cells) 1 and exterior quads 5
    ref = Mesh(points=pts, cells=split_hex_cells(hexes)[0].astype(np.int32),
               cell_tags=cell_tags[split_hex_cells(hexes)[1]])
    # quads: all faces of all hexes, dedup
    faces_l = np.array([
        [0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
        [2, 3, 7, 6], [0, 3, 7, 4], [1, 2, 6, 5],
    ])
    all_q = hexes[:, faces_l].reshape(-1, 4)
    qs = np.sort(all_q, axis=1)
    uq, inv, counts = np.unique(qs, axis=0, return_inverse=True,
                                return_counts=True)
    owner_tag = np.zeros((len(uq), 2), np.int32) - 1
    for f, h in zip(inv, np.repeat(np.arange(len(hexes)), 6)):
        t = cell_tags[h]
        if owner_tag[f, 0] == -1:
            owner_tag[f, 0] = t
        else:
            owner_tag[f, 1] = t
    ftags = np.zeros(len(uq), np.int32)
    ext = counts == 1
    ftags[ext] = 5
    mem = (owner_tag[:, 0] + owner_tag[:, 1] == 1) & (~ext)
    ftags[mem] = 1
    keep = ftags > 0
    _write_hex_xdmf(tmp_path / "hex.xdmf", pts, hexes, cell_tags,
                    uq[keep], ftags[keep])

    mesh = read_mesh(tmp_path / "hex.xdmf")
    assert mesh.cells.shape == (len(hexes) * 6, 4)
    # volume preserved exactly (Kuhn split fills each hex)
    np.testing.assert_allclose(mesh.cell_volumes().sum(), 1.0, rtol=1e-12)
    # per-tag volumes match the hex tagging
    v = mesh.cell_volumes()
    np.testing.assert_allclose(v[mesh.cell_tags == 1].sum(), 0.5**3,
                               rtol=1e-12)
    # facet tags: membrane quads -> 2 triangles each, exterior -> tag 5
    n_mem_tris = int((mesh.facet_tags == 1).sum())
    assert n_mem_tris == 2 * int((ftags == 1).sum())
    n_ext_tris = int((mesh.facet_tags == 5).sum())
    assert n_ext_tris == 2 * int(ext.sum())

    # full geometry build: membrane found between ECS and cell 1
    geom = build_geometry(mesh)
    assert 1 in geom.membranes
    assert geom.membranes[1].cell_tag == 1
    # membrane area = surface of the 0.5-box
    np.testing.assert_allclose(geom.membranes[1].areas.sum(),
                               6 * 0.5**2, rtol=1e-12)


def test_kuhn_split_face_consistent():
    """Neighboring hexes must agree on the shared-face diagonal: every
    interior triangle appears exactly twice in the split tet mesh."""
    pts, hexes = _hex_box(3, 2, 2)
    tets, _ = split_hex_cells(hexes)
    m = Mesh(points=pts, cells=tets.astype(np.int32),
             cell_tags=np.zeros(len(tets), np.int32))
    # Mesh._build_facets would have failed on non-matching faces (a facet
    # shared by >2 cells or hanging); also check Euler-consistent counts
    ext = m.exterior_facet_mask()
    # exterior quads of the box = 2*(3*2 + 3*2 + 2*2) = 32 -> 64 tris
    assert int(ext.sum()) == 64
