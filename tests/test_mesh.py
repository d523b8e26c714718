"""Mesh layer tests: tag conventions, connectivity, geometry parity.

Checks the invariants the reference relies on (README.md:67-72 tag
conventions; scifem.find_interface semantics, make_mesh_2D.py:88-108).
"""

import numpy as np
import pytest

from knpemi_tpu.mesh import (
    unit_square_mms_mesh,
    idealized_2d_mesh,
    idealized_3d_mesh,
)
from knpemi_tpu.mesh.core import EXTERIOR_BOUNDARY_TAG
from knpemi_tpu.ops.geometry import build_geometry


def test_mms_mesh_tags():
    M = 8
    mesh = unit_square_mms_mesh(M)
    mesh.validate()
    assert mesh.n_cells == 2 * M * M
    assert mesh.n_points == (M + 1) ** 2
    # inner box [0.25, 0.75]^2 = 1/4 of the area -> 1/4 of the cells
    assert (mesh.cell_tags == 1).sum() == mesh.n_cells // 4
    # exterior boundary facets tagged 5
    assert (mesh.facet_tags == EXTERIOR_BOUNDARY_TAG).sum() == 4 * M
    # membrane facets: perimeter of the box = 4 * (M/2) grid edges
    assert (mesh.facet_tags == 1).sum() == 4 * (M // 2)
    # volume partition is exact
    np.testing.assert_allclose(mesh.cell_volumes().sum(), 1.0)


def test_idealized_2d_mesh_tags():
    # resolution_factor >= 1: at factor 0 the 2 um grid cannot resolve the
    # 1 um-offset neuron strip (true of the reference generator as well,
    # make_mesh_2D.py:21-27 with nx=31, ny=2).
    mesh = idealized_2d_mesh(1)
    mesh.validate()
    # 62 x 4 um domain, neuron strip 60 x 2 um (make_mesh_2D.py:21-27)
    vols = mesh.cell_volumes()
    np.testing.assert_allclose(vols.sum(), 62e-6 * 4e-6)
    np.testing.assert_allclose(
        vols[mesh.cell_tags == 1].sum(), 60e-6 * 2e-6, rtol=1e-12
    )
    assert set(np.unique(mesh.facet_tags)) == {0, 1, 5}


def test_idealized_3d_mesh_tags():
    mesh = idealized_3d_mesh(0, l=1)  # small variant for test speed
    mesh.validate()
    vols = mesh.cell_volumes()
    np.testing.assert_allclose(vols.sum(), 16e-6 * 0.9e-6 * 0.9e-6)
    # 4 axons of 6e-6 x 0.2e-6 x 0.2e-6 each
    np.testing.assert_allclose(
        vols[mesh.cell_tags == 1].sum(),
        4 * (16e-6 - 10e-6) * 0.2e-6 * 0.2e-6,
        rtol=1e-9,
    )


def test_geometry_interface_data():
    mesh = unit_square_mms_mesh(8)
    geom = build_geometry(mesh)
    assert set(geom.subdomains) == {0, 1}
    assert set(geom.membranes) == {1}
    mem = geom.membranes[1]
    # every membrane facet separates ECS and ICS; dofs resolve on both sides
    assert (mem.facet_edofs >= 0).all() and (mem.facet_idofs >= 0).all()
    # membrane dof coordinates agree through both trace maps
    e_coords = geom.subdomains[0].coords[mem.mem_to_ecs]
    i_coords = geom.subdomains[1].coords[mem.mem_to_ics]
    np.testing.assert_allclose(e_coords, mem.coords)
    np.testing.assert_allclose(i_coords, mem.coords)
    # normals point outward from the ICS box (away from (0.5, 0.5))
    mids = mesh.points[mem.facet_verts].mean(axis=1)
    outward = ((mids - [0.5, 0.5]) * mem.normals).sum(axis=1)
    assert (outward > 0).all()
    # total membrane length = box perimeter
    np.testing.assert_allclose(mem.areas.sum(), 4 * 0.5)


def test_3d_membrane_area():
    mesh = idealized_3d_mesh(0, l=1)
    geom = build_geometry(mesh)
    mem = geom.membranes[1]
    # 4 axons: each lateral area 4 * 6e-6 * 0.2e-6, two end caps 0.2e-6^2
    expect = 4 * (4 * 6e-6 * 0.2e-6 + 2 * 0.2e-6**2)
    np.testing.assert_allclose(mem.areas.sum(), expect, rtol=1e-9)
