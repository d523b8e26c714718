"""bf16 banded slabs are a STORAGE dtype, not a compute dtype.

The V-cycle's fine-level cost is HBM slab reads; storing the lagged
slabs in bfloat16 halves that traffic.  The original (rejected) variant
rounded the *vector* to bf16 inside the contraction, which makes the
preconditioner an input-dependent map — plain CG stalled 19 -> 137
iterations (RESULTS.md).  The storage-only semantics asserted here:

  (a) the banded matvec with a bf16 slab equals the bf16-ROUNDED
      operator applied in exact f32 arithmetic (a fixed linear map);
  (b) a full EMI solve with ``mg_band_bf16=True`` converges in the same
      iteration count (+ small margin) as the f32-slab hierarchy.

``mg_band_bf16`` rounds ONLY the fine-level smoothing slab (the
dominant HBM read): rounding the Galerkin coarse operators breaks the
B-compatible near-null annihilation and stalls EMI CG outright at 3-D
res 2 (measured: 9 iterations -> the 1000 cap), while a perturbed
smoother is harmless.

Reference analog: hypre BoomerAMG keeps its interpolation operators in
the solve precision (src/knpemi/pdeSolver.py:24-38); the TPU design
trades preconditioner-internal storage precision for HBM bandwidth.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
)


def _banded_fixture(n=3000, seed=3):
    import scipy.sparse as sp
    from knpemi_tpu.solvers.mg import _csr_to_banded

    rng = np.random.default_rng(seed)
    A = sp.diags([-1, 2.1, -1], [-1, 0, 1], shape=(n, n)).tocsr()
    rr = rng.integers(0, n, 40)
    cc = rng.integers(0, n, 40)
    F = sp.csr_matrix(
        (rng.standard_normal(40) * 0.01, (rr, cc)), shape=(n, n)
    )
    A = (A + F + F.T).tocsr()
    band = _csr_to_banded(A, R=256)
    assert band is not None
    return A, band, rng


def _dev_band(band, slab_dtype):
    windows, fr, fc, fv, nn, mm = band
    return dict(
        windows=[
            dict(
                slabT=jnp.asarray(sT, slab_dtype),
                w0=jnp.asarray(w0),
                w0_rows=jnp.asarray(w0 // 128, jnp.int32),
                W=W,
            )
            for sT, w0, W in windows
        ],
        far_rows=jnp.asarray(fr),
        far_cols=jnp.asarray(fc),
        far_vals=jnp.asarray(fv, jnp.float32),
        n=nn,
        m=mm,
        pallas=False,
    )


def test_bf16_slab_equals_rounded_operator_in_f32():
    """XLA fallback + Pallas interpret path: y(bf16 slab) == A_rounded
    @ x computed in f64, to f32 roundoff — NOT the f32-slab result, and
    NOT a bf16-vector contraction."""
    from knpemi_tpu.solvers.mg import _banded_mv, _banded_mv_batch
    from knpemi_tpu.ops.pallas_banded import banded_matvec

    A, band, rng = _banded_fixture()
    n = A.shape[0]
    dev16 = _dev_band(band, jnp.bfloat16)
    windows, fr, fc, fv, nn, mm = band

    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    xf = np.asarray(x, np.float64)

    def windowed_rounded(vec):
        """A_rounded(window part) @ vec in f64, far part in f32 values."""
        acc = None
        for sT, w0, W in windows:
            R = sT.shape[1]
            NB = sT.shape[0] // W
            s16 = np.asarray(
                jnp.asarray(sT, jnp.bfloat16).astype(jnp.float64)
            ).reshape(NB, W, R)
            xp = np.pad(vec, (0, W))
            yp = np.zeros(NB * R)
            for b in range(NB):
                xw = xp[w0[b]:w0[b] + W]
                yp[b * R:(b + 1) * R] = s16[b].T @ xw
            acc = yp[:n] if acc is None else acc + yp[:n]
        np.add.at(acc, fr, fv * vec[fc])
        return acc

    y16 = np.asarray(_banded_mv(dev16, x), np.float64)
    y_ref = windowed_rounded(xf)

    scale = np.abs(y_ref).max()
    assert np.abs(y16 - y_ref).max() / scale < 1e-5

    # a bf16-vector contraction would differ at ~2^-8: prove we are NOT
    # doing that (distance to the rounded-x result must exceed the f32
    # tolerance we just met, unless the rounding is a no-op)
    x_r = np.asarray(
        jnp.asarray(x, jnp.bfloat16).astype(jnp.float64)
    )
    if not np.array_equal(x_r, xf):
        y_xr = windowed_rounded(x_r)
        assert np.abs(y_xr - y_ref).max() / scale > 1e-5

    # Pallas kernel (interpret mode) agrees with the XLA fallback
    y_pl = sum(
        banded_matvec(
            w["slabT"], w["w0_rows"], x, nn, w["W"], interpret=True
        )
        for w in dev16["windows"]
    )
    y_pl = np.asarray(
        y_pl.at[dev16["far_rows"]].add(
            dev16["far_vals"] * x[dev16["far_cols"]]
        ),
        np.float64,
    )
    assert np.abs(y_pl - y_ref).max() / scale < 1e-5

    # batched path: identical per-row semantics
    X = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    Yb = np.asarray(_banded_mv_batch(dev16, X), np.float64)
    y0 = np.asarray(_banded_mv(dev16, X[0]), np.float64)
    assert np.abs(Yb[0] - y0).max() / scale < 1e-6


def test_emi_iterations_unchanged_with_bf16_slabs():
    """Full EMI solve: bf16-slab hierarchy preconditions to the same
    count as the f32 one (± 2 iterations) and yields the same potential
    field — the solver-level guarantee that storage-only bf16 does not
    reintroduce the 19 -> 137 stall."""
    from run_2d import build_simulation
    from knpemi_tpu.sim.stepper import SolverOptions

    def run(bf16):
        sim = build_simulation(
            resolution=1,
            solver_options=SolverOptions(
                mg_banded=True, mg_band_bf16=bf16
            ),
        )
        state = sim.init_state()
        state, it_e, _ = sim.run(state, 3)
        phi = np.concatenate(
            [np.asarray(state.phi[k]) for k in sorted(state.phi)]
        )
        return np.asarray(it_e), phi

    it32, phi32 = run(False)
    it16, phi16 = run(True)
    assert bool((it16 <= it32 + 2).all()), (it16, it32)
    scale = np.abs(phi32).max()
    assert np.abs(phi16 - phi32).max() / scale < 1e-4
