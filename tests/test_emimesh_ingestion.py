"""End-to-end emimesh ingestion: synthetic emimesh-convention XDMF ->
read_mesh -> remark_emimesh -> geometry build.

The reference consumes emimesh-generated tissue reconstructions through
remark_mesh.py (local_astrocyte_depolarization/remark_mesh.py:91-150:
nm coordinates, ECS cell tag 1, glial tag 100 -> 2, exterior facets 5,
nm -> cm scaling).  No emimesh files ship with the reference repo, so
this test writes a small tetrahedral mesh *in emimesh conventions* to
XDMF/HDF5, reads it back, converts it, and verifies the converted mesh
drives the geometry pipeline.
"""

import numpy as np

from knpemi_tpu.mesh.core import Mesh, EXTERIOR_BOUNDARY_TAG
from knpemi_tpu.mesh.generators import _structured_tets, _tag_cells_in_boxes
from knpemi_tpu.mesh.tissue import remark_emimesh
from knpemi_tpu.io.xdmf import write_mesh, read_mesh
from knpemi_tpu.ops.geometry import build_geometry


def _synthetic_emimesh(n=8, L=4000.0):
    """(L nm)^3 ECS box (emimesh tag 1) with a neuron box (emimesh tag 7)
    and a glial box (emimesh tag 100)."""
    points, cells = _structured_tets(n, n, n, (0, 0, 0), (L, L, L))
    boxes = [
        ((500.0, 500.0, 500.0), (3500.0, 1500.0, 1500.0), 7),
        ((500.0, 2500.0, 2500.0), (3500.0, 3500.0, 3500.0), 100),
    ]
    tags = _tag_cells_in_boxes(points, cells, boxes)
    tags[tags == 0] = 1  # emimesh ECS convention
    mesh = Mesh(points=points, cells=cells, cell_tags=tags)
    # emimesh facet files tag membranes by owning-cell tag and the
    # exterior with a tag absent from the cell tags (here 200)
    ft = np.zeros(mesh.n_facets, np.int32)
    for tag in (7, 100):
        ft[mesh.interface_facet_mask(1, tag)] = tag
    ft[mesh.exterior_facet_mask()] = 200
    mesh.facet_tags = ft
    return mesh


def test_emimesh_roundtrip_and_remark(tmp_path):
    src = _synthetic_emimesh()
    path = tmp_path / "emimesh" / "mesh.xdmf"
    write_mesh(path, src, cell_tag_name="mesh", facet_tag_name="mesh_facets")

    back = read_mesh(path, cell_tag_name="mesh", facet_tag_name="mesh_facets")
    assert np.allclose(back.points, src.points)
    assert np.array_equal(back.cells, src.cells)
    assert np.array_equal(back.cell_tags, src.cell_tags)
    assert np.array_equal(back.facet_tags, src.facet_tags)

    out = remark_emimesh(back, ecs_tag_in=1, scale=1e-7,
                         tag_map={7: 1, 100: 2})

    # knpemi conventions: ECS 0, neuron 1, glial 2; nm -> cm
    assert set(np.unique(out.cell_tags)) == {0, 1, 2}
    assert np.isclose(out.points.max(), 4000.0 * 1e-7)
    n_neuron = int(np.sum(src.cell_tags == 7))
    assert int(np.sum(out.cell_tags == 1)) == n_neuron
    assert int(np.sum(out.cell_tags == 2)) == int(np.sum(src.cell_tags == 100))

    # facets: membranes tagged by owning cell tag, exterior 5
    for tag in (1, 2):
        want = out.interface_facet_mask(0, tag)
        assert np.array_equal(out.facet_tags == tag, want)
    assert np.array_equal(
        out.facet_tags == EXTERIOR_BOUNDARY_TAG, out.exterior_facet_mask()
    )

    # the converted mesh must drive the geometry pipeline
    geo = build_geometry(out)
    assert geo.membranes[1].n_dofs > 0 and geo.membranes[2].n_dofs > 0
    vol = sum(float(np.sum(s.vols)) for s in geo.subdomains.values())
    assert np.isclose(vol, (4000.0e-7) ** 3, rtol=1e-10)


def test_remark_membrane_slab_split(tmp_path):
    """Benchmark-driver convention: single-cell membrane split into
    x-slabs tagged 5/6/7 (benchmark remark_mesh.py:144-150)."""
    src = _synthetic_emimesh()
    # keep only the glial cell so max-tag slab split applies to it
    src.cell_tags[src.cell_tags == 7] = 1
    src = Mesh(points=src.points, cells=src.cells, cell_tags=src.cell_tags)
    out = remark_emimesh(src, ecs_tag_in=1, scale=1e-7,
                         tag_map={100: 1},
                         membrane_slab_cuts=[1500.0, 2500.0],
                         membrane_slab_tags=[5, 6, 7])
    mem = out.interface_facet_mask(0, 1)
    got = np.unique(out.facet_tags[mem])
    assert set(got) <= {5, 6, 7} and len(got) >= 2
    mids = out.facet_midpoints(np.flatnonzero(mem))
    assert (out.facet_tags[mem][mids[:, 0] < 1500.0e-7] == 5).all()
    assert (out.facet_tags[mem][mids[:, 0] > 2500.0e-7] == 7).all()


def test_read_mesh_default_names_fall_back(tmp_path):
    """read_mesh with DEFAULT tag names must still pick up cell tags
    written under emimesh's names ("mesh"/"mesh_facets") — the driver's
    config mesh_file path reads without explicit names (round-4 fix:
    tags were silently zero and the remark produced no membranes)."""
    src = _synthetic_emimesh(n=4)
    path = tmp_path / "mesh.xdmf"
    write_mesh(path, src, cell_tag_name="mesh", facet_tag_name="mesh_facets")
    back = read_mesh(path)  # no tag names given
    assert np.array_equal(back.cell_tags, src.cell_tags)
    assert np.array_equal(back.facet_tags, src.facet_tags)
