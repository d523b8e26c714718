"""Calibration workflow test: the reference's published dynamic steady
state (hard-coded into its PDE drivers, astrocyte run_stim_duration.py:232-242)
must stay at rest under this framework's implementation of the closed
compartment model — the reference's own implicit quality check
(run_calibration.py:99-114)."""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "calibrate"))


def test_calibrated_state_is_steady():
    from run_calibration import run
    from knpemi_tpu.models import get_model

    model = get_model("calibration")
    y0 = model.init_states()
    y = run(n_steps=500, dt=0.1)
    rel = np.abs((y - y0) / np.maximum(np.abs(y0), 1e-3)).max()
    assert rel < 1e-3, f"steady state drifted by {rel}"


def test_stimulated_neuron_fires_in_calibration_model():
    from knpemi_tpu.models import get_model
    from knpemi_tpu.models.engine import rk4_step
    import jax.numpy as jnp

    model = get_model("calibration")
    y = jnp.asarray(model.init_states())
    p = jnp.asarray(model.init_params(stim_amplitude=20.0))
    h = 0.02
    V_max = -100.0
    t = 0.0
    for _ in range(500):  # 10 ms
        y = rk4_step(model.rhs, t, y, p, h)
        t += h
        V_max = max(V_max, float(y[3]))
    assert V_max > 0.0, "stimulated neuron must fire"
