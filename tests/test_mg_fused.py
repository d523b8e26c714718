"""Fused post-smooth (AP-product slab) == generic second operator apply.

The V(1,1) Jacobi cycle's post-smoothing residual r - A(x1 + P xc) is
computed as res1 - (AP) xc from a lagged banded A@P product
(solvers/mg.py::MGLevel.ap_band) — one ~n/8-sized slab read instead of a
second full fine-operator apply.  This pins (a) exact algebraic
equivalence of the two formulations on an f64 hierarchy, and (b) that
stripping the AP slabs reproduces the fused result to solver tolerance,
so the fused path is the same preconditioner, not a different cycle.
"""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from knpemi_tpu.solvers.mg import build_hierarchy, DeviceMG


def _laplacian_2d(n):
    ex = np.ones(n)
    T = sp.diags([-ex, 2 * ex, -ex], [-1, 0, 1], shape=(n, n))
    eye = sp.identity(n)
    return (sp.kron(T, eye) + sp.kron(eye, T)).tocsr()


def _strip_ap(mg: DeviceMG) -> DeviceMG:
    levels = [dict(lv, ap_band=None) for lv in mg.levels]
    return DeviceMG(levels, mg.coarse_V, mg.coarse_ilam, mg.nu,
                    fine_diag=mg.fine_diag, gamma=mg.gamma)


def test_fused_post_smooth_matches_generic():
    n = 24
    A = _laplacian_2d(n)
    hier = build_hierarchy(A, theta=0.04, coarse_max=50,
                           smoother="jacobi", degree=1)
    assert any(
        getattr(lv, "ap_band", None) is not None for lv in hier.levels
    ), "AP slabs missing from the built hierarchy"
    mg = hier.device(jnp.float64)
    mg_plain = _strip_ap(mg)

    Aop = lambda x: jnp.asarray(A @ np.asarray(x))
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(A.shape[0]))

    z_fused = np.asarray(mg.apply(Aop, r))
    z_plain = np.asarray(mg_plain.apply(Aop, r))
    # identical linear map, different roundoff path (f64: ~1e-13)
    err = np.linalg.norm(z_fused - z_plain) / np.linalg.norm(z_plain)
    assert err < 1e-10, err


def test_fused_post_smooth_matches_generic_batched():
    n = 20
    A = _laplacian_2d(n)
    hier = build_hierarchy(A, theta=0.04, coarse_max=50,
                           smoother="jacobi", degree=1)
    mg = hier.device(jnp.float64)
    mg_plain = _strip_ap(mg)

    Aop = lambda X: jnp.asarray((A @ np.asarray(X).T).T)
    rng = np.random.default_rng(1)
    R = jnp.asarray(rng.standard_normal((3, A.shape[0])))

    Z_fused = np.asarray(mg.apply_batch(Aop, R))
    Z_plain = np.asarray(mg_plain.apply_batch(Aop, R))
    err = np.linalg.norm(Z_fused - Z_plain) / np.linalg.norm(Z_plain)
    assert err < 1e-10, err


def _lap2d(n1=24):
    I = sp.eye(n1, dtype=float)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n1, n1))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def test_solver_layout_fine_cycle_matches_perm_wrap():
    """A permuted hierarchy with a matrix-free fine level must produce
    bit-identical cycles whether level 0 smooths through the perm-
    wrapped A0 (reference path) or directly in solver layout
    (dinv_solver fast path — D^-1 commutes with the permutation)."""
    rng = np.random.default_rng(3)
    A_s = _lap2d()
    n = A_s.shape[0]
    perm = rng.permutation(n)
    A_p = A_s[perm][:, perm].tocsr()
    hier = build_hierarchy(A_p, banded=False, fine_ell=False, coarse_max=60)
    hier.perm = perm
    assert hier.levels[0].a_cols is None
    dmg = hier.device(jnp.float32)
    assert dmg.levels[0]["dinv_solver"] is not None

    As_j = jnp.asarray(A_s.toarray(), jnp.float32)
    A0 = lambda x: As_j @ x
    r = jnp.asarray(rng.standard_normal(n), jnp.float32)
    fast = dmg.apply(A0, r)
    dmg.levels[0]["dinv_solver"] = None  # force the reference path
    ref = dmg.apply(A0, r)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_solver_layout_fine_cycle_matches_perm_wrap_batched():
    rng = np.random.default_rng(4)
    A_s = _lap2d(20)
    n = A_s.shape[0]
    perm = rng.permutation(n)
    A_p = A_s[perm][:, perm].tocsr()
    hier = build_hierarchy(A_p, banded=False, fine_ell=False, coarse_max=60)
    hier.perm = perm
    dmg = hier.device(jnp.float32)
    assert dmg.levels[0]["dinv_solver"] is not None

    As_j = jnp.asarray(A_s.toarray(), jnp.float32)
    A0b = lambda X: X @ As_j.T
    R = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    fast = dmg.apply_batch(A0b, R)
    dmg.levels[0]["dinv_solver"] = None
    ref = dmg.apply_batch(A0b, R)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
