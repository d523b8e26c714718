"""f32 vs f64 compute-path agreement.

TPU v5e has no native f64; the TPU compute path runs f32 with
dtype-floored solver tolerances.  This test pins the f32/f64 agreement
over half an action potential on the idealized 2-D scenario.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402


def test_f32_matches_f64_over_ap():
    sim32 = build_simulation(resolution=1, dtype=jnp.float32)
    sim64 = build_simulation(resolution=1, dtype=jnp.float64)
    s32 = sim32.init_state()
    s64 = sim64.init_state()
    s32, _, _ = sim32.run(s32, 50, save_every=50)
    s64, _, _ = sim64.run(s64, 50, save_every=50)
    dphi = np.abs(np.asarray(s64.phi_M[1]) - np.asarray(s32.phi_M[1])).max()
    # f32 solves stop at their dtype-attainable residual floor; the
    # divergence must stay far below physiological scales (~100 mV)
    assert dphi < 2e-4, f"phi_M f32/f64 divergence {dphi * 1e3} mV"
    for tag in s64.c:
        rel = np.abs(
            (np.asarray(s64.c[tag]) - np.asarray(s32.c[tag]))
            / np.asarray(s64.c[tag])
        ).max()
        assert rel < 3e-3, f"concentration divergence {rel}"


def test_dot2_tracks_f64():
    """Compensated f32 dot (solvers/precision.py) must track the f64 dot
    to near f32-representation limits on ill-conditioned sums."""
    from knpemi_tpu.solvers.precision import dot2, bdot2

    rng = np.random.default_rng(0)
    n = 100_000
    # physiological-style vector: large near-constant part + small signal
    u64 = 140.0 + 1e-3 * rng.standard_normal(n)
    v64 = rng.standard_normal(n)
    ref = float(np.dot(u64, v64))
    u32 = jnp.asarray(u64, jnp.float32)
    v32 = jnp.asarray(v64, jnp.float32)
    plain = float(jnp.vdot(u32, v32))
    comp = float(dot2(u32, v32))
    # representation error of the f32 inputs bounds what any dot can do
    rep = np.abs(np.dot(u64 - np.asarray(u32, np.float64), v64))
    err_comp = abs(comp - ref)
    err_plain = abs(plain - ref)
    assert err_comp <= max(3 * rep, 1e-6 * abs(ref))
    assert err_comp <= err_plain + 1e-30

    B = bdot2(jnp.stack([u32, u32]), jnp.stack([v32, v32]))
    assert np.allclose(np.asarray(B), comp, rtol=1e-7)


def test_compensated_run_stays_near_f64():
    """An f32 run with compensated Krylov dots (the TPU default) must
    stay within the tight f64 envelope.  (Comparing compensated against
    plain f32 head-to-head is meaningless at this scale: both runs sit
    at ~3e-8 V from f64 after 30 steps, i.e. at solver-tolerance noise,
    so only the absolute bound is asserted.)"""
    from knpemi_tpu.sim.stepper import SolverOptions

    def final(dtype, comp):
        sim = build_simulation(
            resolution=1, dtype=dtype,
            solver_options=SolverOptions(
                rtol_emi=1e-5, rtol_knp=1e-7, compensated_dots=comp
            ),
        )
        s = sim.init_state()
        s, _, _ = sim.run(s, 30, save_every=30)
        return s

    s64 = final(jnp.float64, False)
    s32c = final(jnp.float32, True)
    ref = np.asarray(s64.phi_M[1])
    d_comp = np.abs(np.asarray(s32c.phi_M[1]) - ref).max()
    assert d_comp < 1e-6, f"phi_M divergence {d_comp} V"
