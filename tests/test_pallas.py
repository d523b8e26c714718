"""Blocked (Pallas) assembly path vs the XLA reference path.

On CPU the kernels run in interpreter mode; the same code compiles to
Mosaic on TPU.  Coverage: kernel-level parity for both operators and a
full coupled step."""

import os
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from knpemi_tpu.mesh import unit_square_mms_mesh, idealized_3d_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.ops.pallas_assembly import (
    build_blocking, build_facet_blocking, emi_stiffness_blocked,
    facet_mass_blocked, knp_apply_blocked,
    prepare_emi_weight, prepare_knp_drift,
)
from knpemi_tpu.ops import kernels as K


@pytest.mark.parametrize("make", [lambda: unit_square_mms_mesh(12),
                                  lambda: idealized_3d_mesh(0, l=1)])
def test_blocked_kernels_match_xla(make):
    geom = build_geometry(make())
    for t, sub in geom.subdomains.items():
        bk = build_blocking(sub.cells, sub.grads, sub.vols, sub.n_dofs, S=256)
        assert bk is not None
        rng = np.random.default_rng(t)
        x = jnp.asarray(rng.standard_normal(sub.n_dofs), jnp.float32)
        kap = jnp.asarray(rng.uniform(1, 2, sub.n_dofs), jnp.float32)
        g32 = jnp.asarray(bk.grads_lane, jnp.float32)
        v32 = jnp.asarray(bk.vols_lane, jnp.float32)
        wv = prepare_emi_weight(kap, bk, v32)
        y = emi_stiffness_blocked(x, wv, bk, g32, interpret=True)
        yref = K.stiffness_apply(
            sub.n_dofs, x, jnp.asarray(sub.cells),
            jnp.asarray(sub.grads, jnp.float32),
            jnp.asarray(sub.vols, jnp.float32), coef_vertex=kap,
        )
        scale = float(jnp.abs(yref).max())
        np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                                   atol=5e-6 * scale)


@pytest.mark.parametrize("make", [lambda: unit_square_mms_mesh(12),
                                  lambda: idealized_3d_mesh(0, l=1)])
def test_facet_mass_blocked_matches_xla(make):
    """Membrane-space surface-mass kernel vs the facet-level XLA path
    (the EMI membrane coupling, emiWeakForm.py:164-165)."""
    geom = build_geometry(make())
    for m, sp in geom.membranes.items():
        bkm = build_facet_blocking(sp.facet_dofs, sp.areas, sp.n_dofs)
        assert bkm is not None
        rng = np.random.default_rng(m)
        g = jnp.asarray(rng.standard_normal(sp.n_dofs), jnp.float32)
        kf = sp.facet_dofs.shape[1]
        wv = jnp.asarray(bkm.vols_lane / (kf * (kf + 1)), jnp.float32)
        y = facet_mass_blocked(g, bkm, wv, interpret=True)
        vals = K.facet_mass_values(
            g[jnp.asarray(sp.facet_dofs)], jnp.asarray(sp.areas, jnp.float32)
        )
        yref = K.scatter_add(sp.n_dofs, jnp.asarray(sp.facet_dofs), vals)
        scale = float(jnp.abs(yref).max())
        np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                                   atol=5e-6 * scale)


def test_blocked_step_matches_xla_step():
    from run_2d import build_simulation

    os.environ["KNPEMI_PALLAS"] = "1"
    try:
        simP = build_simulation(resolution=1, dtype=jnp.float32)
    finally:
        os.environ["KNPEMI_PALLAS"] = "0"
    simX = build_simulation(resolution=1, dtype=jnp.float32)
    assert simP.emi_sys.use_pallas and not simX.emi_sys.use_pallas
    sP = simP.step(simP.init_state())
    sX = simX.step(simX.init_state())
    # f32 Krylov paths differ in op order between the two assemblies;
    # agreement to ~1e-6 V is the attainable equality
    np.testing.assert_allclose(
        np.asarray(sP.phi_M[1]), np.asarray(sX.phi_M[1]), atol=3e-6
    )
    for tag in sP.c:
        np.testing.assert_allclose(
            np.asarray(sP.c[tag]), np.asarray(sX.c[tag]), rtol=2e-5
        )


def test_banded_matvec_interpret_matches_scipy():
    """Block-banded slabT layout + Pallas window kernel (interpret mode)
    against scipy, including the COO far remainder (solvers/mg.py::
    _csr_to_banded + ops/pallas_banded.py)."""
    import scipy.sparse as sp
    from knpemi_tpu.solvers.mg import _csr_to_banded, _banded_mv
    from knpemi_tpu.ops.pallas_banded import banded_matvec

    n = 3000
    rng = np.random.default_rng(3)
    A = sp.diags([-1, 2.1, -1], [-1, 0, 1], shape=(n, n)).tocsr()
    rr = rng.integers(0, n, 40)
    cc = rng.integers(0, n, 40)
    F = sp.csr_matrix((rng.standard_normal(40) * 0.01, (rr, cc)),
                      shape=(n, n))
    A = (A + F + F.T).tocsr()
    band = _csr_to_banded(A, R=256)
    assert band is not None
    windows, fr, fc, fv, nn, mm = band
    dev = dict(
        windows=[
            dict(slabT=jnp.asarray(sT, jnp.float32), w0=jnp.asarray(w0),
                 w0_rows=jnp.asarray(w0 // 128, jnp.int32), W=W)
            for sT, w0, W in windows
        ],
        far_rows=jnp.asarray(fr), far_cols=jnp.asarray(fc),
        far_vals=jnp.asarray(fv, jnp.float32), n=nn, m=mm,
        pallas=False,
    )
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y_ref = A @ np.asarray(x, np.float64)
    scale = np.abs(y_ref).max()

    y_xla = np.asarray(_banded_mv(dev, x))
    assert np.abs(y_xla - y_ref).max() / scale < 1e-5

    y_pl = sum(
        banded_matvec(w["slabT"], w["w0_rows"], x, nn, w["W"],
                      interpret=True)
        for w in dev["windows"]
    )
    y_pl = np.asarray(
        y_pl.at[dev["far_rows"]].add(dev["far_vals"] * x[dev["far_cols"]])
    )
    assert np.abs(y_pl - y_ref).max() / scale < 1e-5

    # batched: one slab read for B vectors must equal per-vector applies
    from knpemi_tpu.ops.pallas_banded import banded_matvec_batch
    from knpemi_tpu.solvers.mg import _banded_mv_batch

    X = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    Yb = sum(
        banded_matvec_batch(w["slabT"], w["w0_rows"], X, nn, w["W"],
                            interpret=True)
        for w in dev["windows"]
    )
    Yb = np.asarray(
        Yb.at[:, dev["far_rows"]].add(dev["far_vals"] * X[:, dev["far_cols"]])
    )
    Yref = np.stack([A @ np.asarray(X[b], np.float64) for b in range(3)])
    assert np.abs(Yb - Yref).max() / scale < 1e-5
    Yx = np.asarray(_banded_mv_batch(dev, X))  # XLA fallback path
    assert np.abs(Yx - Yref).max() / scale < 1e-5


def test_knp_batched_kernel_matches_per_ion():
    """knp_apply_blocked_batch (all ions, shared one-hot E) must equal
    per-ion knp_apply_blocked."""
    from knpemi_tpu.ops.pallas_assembly import knp_apply_blocked_batch

    geom = build_geometry(idealized_3d_mesh(0, l=1))
    sub = geom.subdomains[0]
    bk = build_blocking(sub.cells, sub.grads, sub.vols, sub.n_dofs, S=256)
    rng = np.random.default_rng(7)
    B = 2
    X = jnp.asarray(rng.standard_normal((B, sub.n_dofs)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal(sub.n_dofs), jnp.float32)
    g32 = jnp.asarray(bk.grads_lane, jnp.float32)
    v32 = jnp.asarray(bk.vols_lane, jnp.float32)
    drift = prepare_knp_drift(phi, bk, g32)
    dt_inv, psi = 10.0, 38.7
    D_vec = jnp.asarray([1.3, 2.0], jnp.float32)
    z_vec = jnp.asarray([1.0, -1.0], jnp.float32)

    Y = knp_apply_blocked_batch(
        X, bk, g32, v32, drift, dt_inv, D_vec, z_vec, psi, interpret=True
    )
    for b in range(B):
        y_ref = knp_apply_blocked(
            X[b], bk, g32, v32, drift, dt_inv, float(D_vec[b]),
            float(z_vec[b]) * psi * float(D_vec[b]), interpret=True,
        )
        scale = float(jnp.abs(y_ref).max())
        np.testing.assert_allclose(
            np.asarray(Y[b]), np.asarray(y_ref), atol=5e-6 * scale
        )


@pytest.mark.parametrize("make", [lambda: unit_square_mms_mesh(12),
                                  lambda: idealized_3d_mesh(0, l=1)])
def test_knp_membrane_rhs_blocked_matches_xla(make):
    """The membrane-space blocked KNP Robin RHS (facet_gather_blocked +
    dense quadrature + facet_scatter_blocked) must equal the facet-level
    XLA path (knpWeakForm.py:146-216)."""
    from knpemi_tpu.systems.knp import KNPSystem
    from knpemi_tpu.systems.types import Ion, PhysicalParams

    geom = build_geometry(make())
    tags = geom.sub_tags
    ions = [
        Ion(name="Na", z=1.0, D={t: 1.33e-5 for t in tags}),
        Ion(name="K", z=1.0, D={t: 1.96e-5 for t in tags}),
        Ion(name="Cl", z=-1.0, D={t: 2.03e-5 for t in tags}),
    ]
    params = PhysicalParams(dt=1e-5)
    kws = dict(dtype=jnp.float32, splitting_scheme=True)
    ksP = KNPSystem(geom, ions, params, use_pallas=True,
                    pallas_interpret=True, **kws)
    ksX = KNPSystem(geom, ions, params, use_pallas=False, **kws)
    assert ksP.use_pallas and ksP.mem_blocked

    rng = np.random.default_rng(5)
    c = {
        t: jnp.asarray(
            rng.uniform(1.0, 150.0, (len(ions), s.n_dofs)), jnp.float32
        )
        for t, s in geom.subdomains.items()
    }
    phi = {
        t: jnp.asarray(rng.standard_normal(s.n_dofs) * 1e-2, jnp.float32)
        for t, s in geom.subdomains.items()
    }
    phi_M = {
        m: jnp.asarray(rng.standard_normal(sp.n_dofs) * 1e-2, jnp.float32)
        for m, sp in geom.membranes.items()
    }
    I_ch = {
        m: jnp.asarray(
            rng.standard_normal((len(ions), sp.n_dofs)) * 1e-5, jnp.float32
        )
        for m, sp in geom.membranes.items()
    }
    rP = ksP.rhs(c, phi, phi_M, I_ch)
    rX = ksX.rhs(c, phi, phi_M, I_ch)
    for t in rX:
        scale = float(jnp.abs(rX[t]).max())
        np.testing.assert_allclose(
            np.asarray(rP[t]), np.asarray(rX[t]), atol=2e-5 * scale
        )


def test_emi_diag_blocked_matches_xla():
    """diag() on the blocked path (dense per-slot math + one scatter
    kernel + precomputed static membrane diagonal) vs the XLA path."""
    from knpemi_tpu.systems.emi import EMISystem
    from knpemi_tpu.systems.types import Ion, PhysicalParams

    geom = build_geometry(idealized_3d_mesh(0, l=1))
    tags = geom.sub_tags
    ions = [
        Ion("Na", 1.0, {t: 1.33e-5 for t in tags}),
        Ion("K", 1.0, {t: 1.96e-5 for t in tags}),
        Ion("Cl", -1.0, {t: 2.03e-5 for t in tags}),
    ]
    params = PhysicalParams(dt=1e-5)
    esP = EMISystem(geom, ions, params, dtype=jnp.float32,
                    use_pallas=True, pallas_interpret=True)
    esX = EMISystem(geom, ions, params, dtype=jnp.float32, use_pallas=False)
    assert esP.use_pallas and esP._mem_diag_flat is not None
    rng = np.random.default_rng(1)
    kappa = {
        t: jnp.asarray(rng.uniform(1, 2, s.n_dofs), jnp.float32)
        for t, s in geom.subdomains.items()
    }
    dP, dX = esP.diag(kappa), esX.diag(kappa)
    np.testing.assert_allclose(
        np.asarray(dP), np.asarray(dX),
        atol=1e-5 * float(jnp.abs(dX).max()),
    )


def test_mg_apply_batch_matches_vmap():
    """DeviceMG.apply_batch (one slab read per level for the whole ion
    batch) must equal the per-row V-cycle."""
    from run_2d import build_simulation

    sim = build_simulation(resolution=1, dtype=jnp.float32)
    mg = sim.knp_solver.mg.get(0) or sim.emi_solver.mg
    assert mg is not None
    n = len(mg.fine_diag)
    rng = np.random.default_rng(2)
    R = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    _noA = lambda v: v
    Yb = mg.apply_batch(_noA, R)
    Yv = jax.vmap(lambda r: mg.apply(_noA, r))(R)
    scale = float(jnp.abs(Yv).max())
    np.testing.assert_allclose(
        np.asarray(Yb), np.asarray(Yv), atol=1e-5 * scale
    )


def test_gmres_batched_matches_single():
    from knpemi_tpu.solvers.gmres import gmres, gmres_batched

    rng = np.random.default_rng(11)
    n, B = 80, 2
    Q = rng.standard_normal((n, n))
    A_np = Q @ Q.T + n * np.eye(n) + 0.3 * rng.standard_normal((n, n))
    b_np = rng.standard_normal((B, n))
    A = jnp.asarray(A_np)
    b = jnp.asarray(b_np)

    res_b = gmres_batched(lambda X: X @ A.T, b, rtol=1e-10, restart=30)
    assert bool(res_b.converged)
    for k in range(B):
        res_1 = gmres(lambda x: A @ x, b[k], rtol=1e-10, restart=30)
        np.testing.assert_allclose(
            np.asarray(res_b.x[k]), np.asarray(res_1.x), rtol=1e-6,
            atol=1e-8,
        )
        x_dir = np.linalg.solve(A_np, b_np[k])
        np.testing.assert_allclose(np.asarray(res_b.x[k]), x_dir,
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("make", [lambda: unit_square_mms_mesh(12),
                                  lambda: idealized_3d_mesh(0, l=1)])
def test_interp_ellw_prep_matches_gather(make):
    """The frozen windowed-ELL coefficient preparations (mean-vertex
    kappa, grad(phi) drift context) must reproduce the XLA-gather prep
    to f32 roundoff — they replace a ~40 ms/solve gather at flagship
    scale."""
    from knpemi_tpu.ops.pallas_assembly import build_interp_ellw

    geom = build_geometry(make())
    for t, sub in geom.subdomains.items():
        bk = build_blocking(sub.cells, sub.grads, sub.vols, sub.n_dofs,
                            S=256)
        assert bk is not None
        rng = np.random.default_rng(10 + t)
        kap = jnp.asarray(rng.uniform(1, 2, sub.n_dofs), jnp.float32)
        phi = jnp.asarray(rng.standard_normal(sub.n_dofs), jnp.float32)
        g32 = jnp.asarray(bk.grads_lane, jnp.float32)
        v32 = jnp.asarray(bk.vols_lane, jnp.float32)

        k_c = bk.cells_chunk.shape[-1]
        pad = (bk.vols_lane[:, :, 0, : bk.C] != 0)[:, :, None, None, :]
        kbar = build_interp_ellw(
            bk,
            np.broadcast_to(pad / k_c,
                            (bk.n_blocks, bk.n_chunks, 1, k_c, bk.C)),
        )
        assert kbar is not None
        wv_ref, rest_ref = prepare_emi_weight(kap, bk, v32)
        wv, rest = prepare_emi_weight(
            kap, bk, v32, kbar_ellw=kbar.device(jnp.float32),
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(wv), np.asarray(wv_ref),
                                   rtol=1e-5, atol=1e-7)

        drift = build_interp_ellw(
            bk,
            bk.grads_lane.reshape(bk.n_blocks, bk.n_chunks, bk.dim,
                                  bk.k, bk.C),
        )
        assert drift is not None
        w_ref, _ = prepare_knp_drift(phi, bk, g32)
        w, _ = prepare_knp_drift(
            phi, bk, g32, drift_ellw=drift.device(jnp.float32),
            interpret=True,
        )
        scale = float(jnp.abs(w_ref).max()) or 1.0
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=1e-5 * scale)
