"""Windowed-ELL kernels (ops/pallas_ell.py): exactness vs scipy.

These are the MG transfer/lagged-operator kernels; the gather must be
f32-exact (three bf16 one-hot passes), the scatter likewise, far-COO
spill must compose, and refills must preserve the frozen shape so a
refreshed hierarchy does not retrace the compiled step.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from knpemi_tpu.ops import pallas_ell as PE


def _banded_random(n, m, k_per_row, bw, seed=0, shuffle_frac=0.0):
    """Random CSR with ~k entries/row within a +-bw band around the
    diagonal ray (scaled to rectangular shapes); optionally scatter a
    fraction of entries anywhere (exercises the far-COO path)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), k_per_row)
    center = (rows * (m / n)).astype(np.int64)
    cols = center + rng.integers(-bw, bw + 1, len(rows))
    cols = np.clip(cols, 0, m - 1)
    if shuffle_frac:
        nf = int(shuffle_frac * len(cols))
        idx = rng.choice(len(cols), nf, replace=False)
        cols[idx] = rng.integers(0, m, nf)
    vals = rng.standard_normal(len(rows))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()
    A.sum_duplicates()
    return A


@pytest.mark.parametrize("n,m,k,bw", [
    (1000, 1000, 7, 40),      # square operator
    (2000, 233, 4, 30),       # prolongator-like (tall)
    (233, 2000, 20, 150),     # restriction-like (wide)
])
def test_ellw_matvec_matches_scipy(n, m, k, bw):
    A = _banded_random(n, m, k, bw, seed=n + m)
    e = PE.build_ellw(A)
    assert e is not None
    ed = e.device(jnp.float32)
    x = np.random.default_rng(1).standard_normal(m)
    y = PE.ellw_matvec(ed, jnp.asarray(x, jnp.float32), interpret=True)
    ref = A @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,m,k,bw", [
    (1000, 1000, 7, 40),
    (2000, 233, 4, 30),
])
def test_ellw_rmatvec_matches_scipy(n, m, k, bw):
    A = _banded_random(n, m, k, bw, seed=3 * n + m)
    e = PE.build_ellw(A)
    assert e is not None
    ed = e.device(jnp.float32)
    r = np.random.default_rng(2).standard_normal(n)
    y = PE.ellw_rmatvec(ed, jnp.asarray(r, jnp.float32), interpret=True)
    ref = A.T @ r
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_ellw_far_coo_spill():
    """2% of entries scattered anywhere must land in the far-COO
    remainder and still produce the exact product."""
    A = _banded_random(6000, 6000, 6, 25, seed=9, shuffle_frac=0.02)
    e = PE.build_ellw(A, Wr_cap=24)
    assert e is not None and e.far_cap > 0
    ed = e.device(jnp.float32)
    x = np.random.default_rng(3).standard_normal(6000)
    y = PE.ellw_matvec(ed, jnp.asarray(x, jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=2e-5, atol=2e-5)
    r = np.random.default_rng(4).standard_normal(6000)
    yt = PE.ellw_rmatvec(ed, jnp.asarray(r, jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(yt), A.T @ r, rtol=2e-5, atol=2e-5)


def test_ellw_refuses_unordered():
    """A fully random (bandwidth-free) pattern must be refused, not
    silently built with a giant far remainder."""
    rng = np.random.default_rng(0)
    A = sp.random(4000, 4000, density=0.002, random_state=0).tocsr()
    assert PE.build_ellw(A, Wr_cap=16) is None


def test_ellw_refill_keeps_shape_and_values():
    """force_shape refill: same sparsity, new values -> identical static
    shape (no retrace) and the new product."""
    A = _banded_random(1200, 400, 5, 30, seed=7)
    e1 = PE.build_ellw(A)
    A2 = A.copy()
    A2.data = A2.data * 1.7 + 0.1
    shape = (e1.C, e1.K, e1.Wr, e1.G, e1.far_cap)
    e2 = PE.build_ellw(A2, force_shape=shape)
    for f in ("C", "K", "Wr", "G", "NCH", "far_cap"):
        assert getattr(e1, f) == getattr(e2, f)
    x = np.random.default_rng(5).standard_normal(400)
    y = PE.ellw_matvec(e2.device(jnp.float32), jnp.asarray(x, jnp.float32),
                       interpret=True)
    np.testing.assert_allclose(np.asarray(y), A2 @ x, rtol=2e-5, atol=2e-5)
    # same treedef: a jitted consumer would NOT retrace
    t1 = jax.tree_util.tree_structure(e1.device(jnp.float32))
    t2 = jax.tree_util.tree_structure(e2.device(jnp.float32))
    assert t1 == t2


def test_ellw_refill_raises_on_drift():
    A = _banded_random(800, 800, 5, 20, seed=11)
    e1 = PE.build_ellw(A)
    # add a dense row: exceeds frozen K
    B = A.tolil()
    B[0, :300] = 1.0
    with pytest.raises(ValueError, match="drifted|frozen K"):
        PE.build_ellw(B.tocsr(),
                      force_shape=(e1.C, e1.K, e1.Wr, e1.G, e1.far_cap))


def test_ellw_batch_forms():
    A = _banded_random(900, 300, 4, 25, seed=13)
    e = PE.build_ellw(A).device(jnp.float32)
    X = np.random.default_rng(6).standard_normal((3, 300))
    Y = PE.ellw_matvec_batch(e, jnp.asarray(X, jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(Y), X @ A.T.toarray(),
                               rtol=2e-5, atol=2e-5)
    R = np.random.default_rng(7).standard_normal((3, 900))
    Yt = PE.ellw_rmatvec_batch(e, jnp.asarray(R, jnp.float32),
                               interpret=True)
    np.testing.assert_allclose(np.asarray(Yt), R @ A.toarray(),
                               rtol=2e-5, atol=2e-5)


def test_vcycle_with_ellw_matches_banded(monkeypatch):
    """Force the hierarchy builder to refuse every banded layout: all
    roles (A, AP, P, Pt) must fall through to windowed-ELL and the
    V-cycle must match the banded-path cycle to f32 accuracy."""
    from knpemi_tpu.solvers import mg

    A = _banded_random(3000, 3000, 9, 50, seed=21)
    A = (A + A.T).tocsr()
    A = A + sp.diags(np.abs(A).sum(axis=1).A.ravel() + 1.0)
    h_band = mg.build_hierarchy(A, coarse_max=80, banded=True)
    monkeypatch.setattr(mg, "_csr_to_banded", lambda *a, **k: None)
    h_ellw = mg.build_hierarchy(A, coarse_max=80, banded=True)
    lv0 = h_ellw.levels[0]
    assert lv0.a_band is None and lv0.a_ellw is not None
    assert lv0.p_ellw is not None and lv0.pt_ellw is not None

    d_band = h_band.device(jnp.float32)
    d_ellw = h_ellw.device(jnp.float32)
    r = jnp.asarray(
        np.random.default_rng(22).standard_normal(3000), jnp.float32
    )
    A0 = lambda x: x  # unused: level 0 carries a stored operator
    y_band = d_band.apply(A0, r)
    y_ellw = d_ellw.apply(A0, r)
    ref = np.asarray(y_band)
    np.testing.assert_allclose(np.asarray(y_ellw), ref,
                               rtol=5e-5, atol=5e-5 * np.abs(ref).max())
    Yb = d_band.apply_batch(lambda X: X, jnp.stack([r, 2 * r]))
    Ye = d_ellw.apply_batch(lambda X: X, jnp.stack([r, 2 * r]))
    np.testing.assert_allclose(np.asarray(Ye), np.asarray(Yb),
                               rtol=5e-5,
                               atol=5e-5 * np.abs(np.asarray(Yb)).max())


def test_refresh_refills_ellw(monkeypatch):
    """Value-refresh must refill the windowed-ELL level operators with
    the new coefficients while keeping the frozen transfer layouts."""
    from knpemi_tpu.solvers import mg

    A = _banded_random(2000, 2000, 7, 40, seed=31)
    A = (A + A.T).tocsr()
    A = A + sp.diags(np.abs(A).sum(axis=1).A.ravel() + 1.0)
    monkeypatch.setattr(mg, "_csr_to_banded", lambda *a, **k: None)
    h = mg.build_hierarchy(A, coarse_max=80, banded=True)
    assert h.levels[0].a_ellw is not None
    A2 = (1.5 * A).tocsr()
    h2 = mg.refresh_hierarchy(h, A2)
    e1, e2 = h.levels[0].a_ellw, h2.levels[0].a_ellw
    assert e2 is not None and e2.vals.shape == e1.vals.shape
    np.testing.assert_allclose(e2.vals, 1.5 * e1.vals, rtol=1e-12)
    # transfers frozen
    assert h2.levels[0].p_ellw is h.levels[0].p_ellw


def test_ellw_two_pass_near_exact(monkeypatch):
    """KNPEMI_ELLW_PASSES=2 truncates the vector operand to 16 mantissa
    bits inside the one-hot products (preconditioner-only fast path,
    certified on the flagship — RESULTS round 5): the result must stay
    within the 2^-17 relative envelope of the exact product."""
    monkeypatch.setattr(PE, "_ELLW_PASSES", 2)
    A = _banded_random(1500, 1500, 7, 45, seed=9)
    e = PE.build_ellw(A)
    assert e is not None
    x = np.random.default_rng(3).standard_normal(1500)
    y2 = np.asarray(PE.ellw_matvec(
        e.device(jnp.float32), jnp.asarray(x, jnp.float32), interpret=True))
    ref = A @ x
    rel = np.abs(y2 - ref).max() / np.abs(ref).max()
    assert rel < 3e-5, rel
    # and the batch form agrees with the single form's arithmetic class
    Y = np.asarray(PE.ellw_matvec_batch(
        e.device(jnp.float32),
        jnp.asarray(np.stack([x, 0.5 * x]), jnp.float32), interpret=True))
    assert np.abs(Y[0] - ref).max() / np.abs(ref).max() < 3e-5
