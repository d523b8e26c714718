"""Membrane ODE engine tests.

The reference integrates each membrane dof with C LSODA at rtol 1e-8 /
atol 1e-10 in a serial python loop (odeSolver.py:107-122).  Here the
vmapped RK4 substep integrator is validated against scipy's LSODA on the
same models and tolerances.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from knpemi_tpu.models.registry import get_model
from knpemi_tpu.models.engine import rk4_step


def _integrate_scipy(model, y0, p, t0, t1):
    f = lambda t, y: np.asarray(model.rhs(t, jnp.asarray(y), jnp.asarray(p)))
    sol = solve_ivp(f, (t0, t1), y0, method="LSODA", rtol=1e-8, atol=1e-10)
    return sol.y[:, -1]


def _integrate_rk4(model, y0, p, t0, t1, n_sub):
    h = (t1 - t0) / n_sub
    y = jnp.asarray(y0)
    t = t0
    for _ in range(n_sub):
        y = rk4_step(model.rhs, t, y, jnp.asarray(p), h)
        t += h
    return np.asarray(y)


def test_hh_fixture_step_matches_lsoda():
    model = get_model("hh_fixture")
    y0 = model.init_states()
    p = model.init_params(stim_amplitude=10.0)
    # One PDE step with 25 substeps (run_3D.py:178).  The fixture's stimulus
    # decays on a 0.002 timescale (mm_test_ode.py:152), so the step must
    # resolve it the way the production configs do (dt/n_sub << 0.002).
    y_rk = _integrate_rk4(model, y0, p, 0.0, 0.01, 25)
    y_ref = _integrate_scipy(model, y0, p, 0.0, 0.01)
    np.testing.assert_allclose(y_rk, y_ref, rtol=1e-6, atol=1e-7)


def test_hh_si_units_step():
    model = get_model("hh")
    y0 = model.init_states()
    p = model.init_params(
        Cm=0.02, psi=96485.0 / (8.314 * 300.0),
        K_e=3.32, K_i=124.15, Na_e=100.71, Na_i=12.83,
        Cl_e=104.03, Cl_i=136.99, stim_amplitude=10.0,
    )
    y_rk = _integrate_rk4(model, y0, p, 0.0, 1e-4, 25)
    y_ref = _integrate_scipy(model, y0, p, 0.0, 1e-4)
    np.testing.assert_allclose(y_rk, y_ref, rtol=1e-6, atol=1e-9)


def test_glial_step_matches_lsoda():
    model = get_model("glial")
    psi = 96500e3 / (8.315e3 * 307e3)  # astrocyte driver units
    p = model.init_params(
        Cm=1.0, psi=psi,
        K_e=3.09, K_i=99.31, Na_e=144.66, Na_i=15.19,
        Cl_e=133.31, Cl_i=5.15,
    )
    y0 = model.init_states()
    y_rk = _integrate_rk4(model, y0, p, 0.0, 0.1, 25)
    y_ref = _integrate_scipy(model, y0, p, 0.0, 0.1)
    np.testing.assert_allclose(y_rk, y_ref, rtol=1e-7, atol=1e-9)


def test_hh_action_potential_fires():
    """With synaptic stimulus the HH fixture must fire (V crosses 0 mV),
    without it V stays at rest — the physics sanity check behind the
    reference's calibration workflow (run_calibration.py:99-114)."""
    model = get_model("hh_fixture")
    p_stim = model.init_params(stim_amplitude=30.0)
    p_rest = model.init_params()
    y = model.init_states()

    def run(p, T=5.0, n=2000):
        f = lambda t, yy: np.asarray(model.rhs(t, jnp.asarray(yy), jnp.asarray(p)))
        sol = solve_ivp(f, (0, T), y, method="LSODA", rtol=1e-8, atol=1e-10,
                        dense_output=False, max_step=0.05)
        return sol.y[3]

    V_stim = run(p_stim)
    V_rest = run(p_rest)
    assert V_stim.max() > 0.0, "stimulated membrane must fire"
    assert abs(V_rest - V_rest[0]).max() < 2.0, "resting membrane must stay at rest"


def test_membrane_model_vmapped_step():
    """The engine's batched step must equal per-point integration."""
    from knpemi_tpu.mesh import unit_square_mms_mesh
    from knpemi_tpu.ops.geometry import build_geometry
    from knpemi_tpu.models.engine import MembraneModel

    geom = build_geometry(unit_square_mms_mesh(8))
    model = get_model("hh_fixture")
    mm = MembraneModel(model, geom.membranes[1], n_steps_ODE=10)
    states = jnp.asarray(mm.init_states())
    params = np.asarray(mm.init_params())
    params[:, mm.param_index("stim_amplitude")] = np.linspace(0, 20, mm.n_dofs)
    params = jnp.asarray(params)
    out = np.asarray(mm.step(states, params, 0.0, 0.05))
    # spot-check 3 dofs against the scalar path
    for i in [0, mm.n_dofs // 2, mm.n_dofs - 1]:
        y = _integrate_rk4(model, np.asarray(states[i]), np.asarray(params[i]),
                           0.0, 0.05, 10)
        np.testing.assert_allclose(out[i], y, rtol=1e-12, atol=1e-12)
    # currents API
    I = mm.currents(jnp.asarray(out), params, 0.05)
    assert set(I) == {"Na", "K", "Cl"}
    assert I["Na"].shape == (mm.n_dofs,)
