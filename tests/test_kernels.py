"""Element-kernel verification: the matrix-free device kernels must agree
with the independent host (scipy) assembly to machine precision, and the
EMI operator must be symmetric (CG requirement)."""

import numpy as np
import jax.numpy as jnp
import pytest

from knpemi_tpu.mesh import unit_square_mms_mesh, idealized_3d_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.types import Ion, PhysicalParams
from knpemi_tpu.systems.emi import emi_system
from knpemi_tpu.systems.knp import knp_system
from knpemi_tpu.solvers import direct as D


def _setup(mesh):
    geom = build_geometry(mesh)
    tags = geom.sub_tags
    ions = [
        Ion("a", 1.0, {t: 1.3 for t in tags}, {t: 1.0 for t in tags}),
        Ion("b", -1.0, {t: 0.7 for t in tags}, {t: 2.0 for t in tags}),
        Ion("c", 1.0, {t: 2.1 for t in tags}, {t: 1.0 for t in tags}),
    ]
    params = PhysicalParams(
        dt=0.5, F=2.0, R=1.0, temperature=1.0, C_M=1.5,
        rho={t: 0.0 for t in tags},
    )
    return geom, ions, params


@pytest.mark.parametrize("mesh_fn", [lambda: unit_square_mms_mesh(8),
                                     lambda: idealized_3d_mesh(0, l=1)])
def test_emi_matvec_matches_assembly(mesh_fn):
    geom, ions, params = _setup(mesh_fn())
    esys = emi_system(geom, ions, params)
    rng = np.random.default_rng(1)
    c = {
        t: jnp.asarray(rng.uniform(1.0, 2.0, (3, geom.subdomains[t].n_dofs)))
        for t in geom.sub_tags
    }
    kappa = esys.kappa(c)
    A = D.assemble_emi_csr(esys, {t: np.asarray(v) for t, v in kappa.items()})
    x = rng.standard_normal(esys.n)
    y_mf = np.asarray(esys.matvec(jnp.asarray(x), kappa))
    scale = np.abs(A @ x).max()
    np.testing.assert_allclose(y_mf, A @ x, atol=1e-12 * max(scale, 1))
    np.testing.assert_allclose(
        np.asarray(esys.diag(kappa)), A.diagonal(), atol=1e-12 * max(scale, 1)
    )
    # symmetry
    assert abs(A - A.T).max() < 1e-14 * max(scale, 1)


@pytest.mark.parametrize("mesh_fn", [lambda: unit_square_mms_mesh(8),
                                     lambda: idealized_3d_mesh(0, l=1)])
def test_knp_matvec_matches_assembly(mesh_fn):
    geom, ions, params = _setup(mesh_fn())
    ksys = knp_system(geom, ions, params)
    rng = np.random.default_rng(2)
    phi = {
        t: jnp.asarray(rng.standard_normal(geom.subdomains[t].n_dofs))
        for t in geom.sub_tags
    }
    gp = ksys.gradphi_cells(phi)
    for t in geom.sub_tags:
        n = geom.subdomains[t].n_dofs
        X = jnp.asarray(rng.standard_normal((2, n)))
        Y = np.asarray(ksys.matvec(t, X, gp[t]))
        dmf = np.asarray(ksys.diag(t, gp[t]))
        for k in range(2):
            Ak = D.assemble_knp_csr(ksys, t, k, np.asarray(gp[t]["cell"]))
            scale = max(np.abs(Ak @ np.asarray(X[k])).max(), 1)
            np.testing.assert_allclose(Y[k], Ak @ np.asarray(X[k]), atol=1e-11 * scale)
            np.testing.assert_allclose(dmf[k], Ak.diagonal(), atol=1e-11 * scale)


def test_mass_and_stiffness_exact_values():
    """P1 mass integrates constants/linears exactly; stiffness annihilates
    constants."""
    from knpemi_tpu.ops import kernels as K

    mesh = unit_square_mms_mesh(4)
    geom = build_geometry(mesh)
    sub = geom.subdomains[0]
    cells = jnp.asarray(sub.cells)
    vols = jnp.asarray(sub.vols)
    grads = jnp.asarray(sub.grads)
    one = jnp.ones(sub.n_dofs)
    # integral of 1 over ECS = 1 - 0.25
    m1 = K.mass_apply(sub.n_dofs, one, cells, vols)
    np.testing.assert_allclose(float(m1.sum()), 0.75, rtol=1e-14)
    # integral of x over ECS (by symmetry = 0.75 * 0.5)
    xf = jnp.asarray(sub.coords[:, 0])
    np.testing.assert_allclose(
        float(jnp.vdot(one, K.mass_apply(sub.n_dofs, xf, cells, vols))),
        0.375,
        rtol=1e-13,
    )
    # stiffness of constant field = 0
    s1 = K.stiffness_apply(sub.n_dofs, one, cells, grads, vols)
    np.testing.assert_allclose(np.asarray(s1), 0.0, atol=1e-14)
