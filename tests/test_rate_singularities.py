"""The HH rate functions' removable singularities must be finite in f32.

alpha_m and alpha_n contain x/(exp(x/k)-1), which the raw form turns
into 0/0 = NaN whenever x rounds exp to exactly 1 (|x| < ~2^-25·k in
f32).  The reference evaluates these rates in f64 LSODA
(local_astrocyte_depolarization/mm_hh.py:163-170) where the window is
never hit; this framework's f32 TPU path measurably lands in it (a
100 ms idealized 2-D run died at step 916, V crossing -55 mV during
the 4th stimulus pulse).  models/rates.py::exprel_inv is the stable
form; these tests pin it at the exact singular potentials and a dense
f32 neighborhood, for every model that carries the pattern.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _dense_window(center, halfwidth=1e-5, n=4001):
    """f32 values densely covering [center-h, center+h], including the
    exact center."""
    w = np.linspace(center - halfwidth, center + halfwidth, n)
    return jnp.asarray(np.append(w, center), jnp.float32)


def test_exprel_inv_limit_and_series():
    from knpemi_tpu.models.rates import exprel_inv

    z = jnp.asarray([0.0, 1e-8, -1e-8, 1e-4, -1e-4, 1.0, -1.0, 30.0], jnp.float32)
    out = np.asarray(exprel_inv(z), np.float64)
    ref = np.array([
        1.0,
        1.0 - 1e-8 / 2,
        1.0 + 1e-8 / 2,
        1.0 - 1e-4 / 2 + 1e-8 / 12,
        1.0 + 1e-4 / 2 + 1e-8 / 12,
        1.0 / (np.e - 1.0),
        -1.0 / (np.exp(-1.0) - 1.0),
        30.0 / (np.exp(30.0) - 1.0),
    ])
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 1e-6


def test_hh_gates_finite_at_singular_potentials():
    """V in volts: alpha_m singular at -40 mV (u=25), alpha_n at -55 mV
    (u=10)."""
    from knpemi_tpu.models.hh import _gates

    for v_sing, limit_idx, limit in [
        (-40.0e-3, 0, 1e3 * 0.1 * 10.0),   # alpha_m -> 1e3*0.1*10*1
        (-55.0e-3, 2, 1e3 * 0.01 * 10.0),  # alpha_n
    ]:
        V = _dense_window(v_sing, 1e-8)
        (am, _), _, (an, _) = _gates(V)
        rates = [am, None, an]
        r = np.asarray(rates[limit_idx], np.float64)
        assert np.isfinite(r).all(), f"NaN at V={v_sing}"
        # limit value at the exact singular point (last element)
        assert abs(r[-1] - limit) / limit < 1e-5


def test_hh_mv_gates_finite_at_singular_potentials():
    from knpemi_tpu.models.hh import _gates_mv

    for v_sing, idx, limit in [(-40.0, 0, 1.0), (-55.0, 2, 0.1)]:
        V = _dense_window(v_sing, 1e-5)
        (am, _), _, (an, _) = _gates_mv(V)
        r = np.asarray([am, None, an][idx], np.float64)
        assert np.isfinite(r).all(), f"NaN at V={v_sing}"
        assert abs(r[-1] - limit) / limit < 1e-5


def test_fixture_and_calibration_rhs_finite_at_singular_potentials():
    from knpemi_tpu.models.test_ode import _gates as fixture_gates
    from knpemi_tpu.models.calibration import MODEL as CAL

    (am, _), _, (an, _) = fixture_gates(_dense_window(-40.0) + 0.0)
    assert np.isfinite(np.asarray(am)).all()
    (am, _), _, (an, _) = fixture_gates(_dense_window(-55.0) + 0.0)
    assert np.isfinite(np.asarray(an)).all()

    # calibration rhs at V_n exactly -40 / -55 mV
    y = jnp.asarray(CAL.default_states, jnp.float32)
    p = jnp.asarray(CAL.default_params, jnp.float32)
    from knpemi_tpu.models.calibration import _S

    for v in (-40.0, -55.0):
        yv = y.at[_S["V_n"]].set(v)
        dy = CAL.rhs(0.0, yv, p)
        assert np.isfinite(np.asarray(dy)).all(), f"calibration NaN at V_n={v}"


def test_rk4_sweep_through_singularity_stays_finite():
    """A vmapped RK4 sweep (the engine's integrator) over a dense f32
    grid straddling both singular potentials — the exact failure mode
    of the 100 ms TPU run."""
    from types import SimpleNamespace

    from knpemi_tpu.models import get_model
    from knpemi_tpu.models.engine import MembraneModel

    model = get_model("hh")
    dummy = SimpleNamespace(tag=1, n_dofs=0, coords=np.zeros((0, 2)))
    mm = MembraneModel(model, dummy, n_steps_ODE=25)

    n = 2001
    V = np.concatenate([
        np.linspace(-40.2e-3, -39.8e-3, n),
        np.linspace(-55.2e-3, -54.8e-3, n),
        [-40.0e-3, -55.0e-3],
    ])
    k = V.size
    sts = jnp.asarray(
        np.column_stack([
            np.full(k, 0.11), np.full(k, 0.78), np.full(k, 0.24), V,
        ]),
        jnp.float32,
    )
    prms = jnp.tile(
        jnp.asarray(model.default_params, jnp.float32)[None, :], (k, 1)
    )
    # realistic trace concentrations (the defaults carry zeros for the
    # per-step-injected fields)
    from knpemi_tpu.models.hh import _P

    fills = dict(K_e=3.9, K_i=124.0, Na_e=100.0, Na_i=13.4,
                 Cl_e=104.0, Cl_i=137.0, Cm=0.02, psi=38.68,
                 stim_amplitude=5.0)
    for name, val in fills.items():
        prms = prms.at[:, _P[name]].set(val)

    out = mm.step(sts, prms, jnp.float32(0.0916), 1e-4)
    assert np.isfinite(np.asarray(out)).all()
