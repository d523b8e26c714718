"""Krylov non-convergence must be detected, not silently ignored.

The reference aborts on solver divergence via PETSc's
``ksp_error_if_not_converged`` (pdeSolver.py:20,27,95).  Here the jitted
step threads ``SolveInfo`` into SimState and ``Simulation.run`` raises
(or warns, per ``SolverOptions.on_divergence``) on the host after each
scan chunk.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402
from knpemi_tpu.sim.stepper import SolverOptions  # noqa: E402


def _broken_sim(on_divergence="raise"):
    # maxiter=2 cannot reach rtol 1e-7 on this system: the solve must
    # report converged=False and run() must surface it
    return build_simulation(
        resolution=1,
        solver_options=SolverOptions(
            maxiter=2, emi_precond="jacobi", on_divergence=on_divergence
        ),
    )


def test_divergence_raises():
    sim = _broken_sim()
    state = sim.init_state()
    with pytest.raises(RuntimeError, match="did NOT converge"):
        sim.run(state, 2)


def test_divergence_warn_mode_continues(capsys):
    sim = _broken_sim(on_divergence="warn")
    state = sim.init_state()
    state, it_e, it_k = sim.run(state, 2)
    assert int(state.step) == 2
    assert "WARNING" in capsys.readouterr().out


def test_healthy_run_passes():
    sim = build_simulation(resolution=1)
    state = sim.init_state()
    state, it_e, it_k = sim.run(state, 2)
    assert bool(state.emi_ok) and bool(state.knp_ok)
    assert int(state.step) == 2
    assert float(state.emi_res) >= 0.0 and np.isfinite(float(state.knp_res))
