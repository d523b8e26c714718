"""Mosaic-compiled Pallas smoke tests on the real TPU chip.

Each test compiles one of the hot kernel families with interpret=False
(the configuration the bench and drivers actually run) and checks the
result against an independent host computation.  These exist to catch
Mosaic lowering regressions before a bench run does — the CPU-backend
main suite exercises the same kernels only in interpret mode.

Sizes are kept small so remote-tunnel compiles stay in the tens of
seconds; the final test compiles one full coupled 2-D step (the same
unit the driver's `entry()` compile-check uses) on the chip.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
)


def _banded_random(n, m, k_per_row, bw, seed=0):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), k_per_row)
    center = (rows * (m / n)).astype(np.int64)
    cols = np.clip(center + rng.integers(-bw, bw + 1, len(rows)), 0, m - 1)
    vals = rng.standard_normal(len(rows))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()
    A.sum_duplicates()
    return A


def test_ellw_matvec_mosaic():
    """Windowed-ELL matvec (MG transfers / lagged operators) compiled by
    Mosaic on the chip matches scipy."""
    from knpemi_tpu.ops import pallas_ell as PE

    A = _banded_random(2000, 2000, 7, 40, seed=7)
    e = PE.build_ellw(A)
    assert e is not None
    ed = e.device(jnp.float32)
    x = np.random.default_rng(1).standard_normal(2000)
    y = PE.ellw_matvec(ed, jnp.asarray(x, jnp.float32), interpret=False)
    ref = A @ x
    np.testing.assert_allclose(
        np.asarray(y), ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max()
    )


def test_ellw_matvec_batch_mosaic():
    from knpemi_tpu.ops import pallas_ell as PE

    A = _banded_random(1500, 1500, 6, 50, seed=11)
    e = PE.build_ellw(A)
    assert e is not None
    ed = e.device(jnp.float32)
    X = np.random.default_rng(2).standard_normal((2, 1500))
    Y = PE.ellw_matvec_batch(ed, jnp.asarray(X, jnp.float32), interpret=False)
    ref = (A @ X.T).T
    np.testing.assert_allclose(
        np.asarray(Y), ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max()
    )


def test_banded_matvec_mosaic():
    """Block-banded smoother slab kernel compiled by Mosaic."""
    import scipy.sparse as sp
    from knpemi_tpu.solvers.mg import _csr_to_banded
    from knpemi_tpu.ops.pallas_banded import banded_matvec

    n = 3000
    A = sp.diags([-1, 2.1, -1], [-1, 0, 1], shape=(n, n)).tocsr()
    band = _csr_to_banded(A, R=256)
    assert band is not None
    windows, fr, fc, fv, nn, mm = band
    x = jnp.asarray(np.random.default_rng(5).standard_normal(n), jnp.float32)
    y = np.asarray(sum(
        banded_matvec(
            jnp.asarray(sT, jnp.float32),
            jnp.asarray(w0 // 128, jnp.int32),
            x, nn, W, interpret=False,
        )
        for sT, w0, W in windows
    ))
    # the layout's COO far remainder (w0 lane alignment pushes a few
    # boundary entries outside the windows) is part of the contract
    if len(fr):
        np.add.at(y, fr, fv * np.asarray(x)[fc])
    ref = A @ np.asarray(x, np.float64)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_coupled_step_compiles_and_runs():
    """One full coupled KNP-EMI step (2-D idealized, res 1) on the chip:
    the Pallas-blocked assembly, banded MG V-cycle, and Krylov solves all
    lower through Mosaic; fields stay finite and iteration counts sane."""
    from run_2d import build_simulation

    sim = build_simulation(resolution=1)
    state = sim.init_state()
    chunk = sim._chunk(1)
    state, (it_e, it_k, ok) = chunk(state)
    state.t.block_until_ready()
    assert bool(np.asarray(ok).all())
    assert 0 < int(it_e[-1]) < 200
    assert 0 < int(it_k[-1]) < 200
    for tag, phi in state.phi.items():
        assert np.isfinite(np.asarray(phi)).all(), f"phi[{tag}] not finite"
    for tag, c in state.c.items():
        assert np.isfinite(np.asarray(c)).all(), f"c[{tag}] not finite"
