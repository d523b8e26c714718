"""Distributed-equivalence tests: 1-device vs 8-virtual-device stepping.

The reference has no distributed test at all (SURVEY.md section 4,
"Distributed testing: none explicit"); here the sharded step must
reproduce the single-device step to solver tolerance on a virtual 8-CPU
mesh (conftest sets xla_force_host_platform_device_count=8).
"""

import sys
from pathlib import Path

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402
from knpemi_tpu.parallel.spmd import SpmdSimulation  # noqa: E402


@pytest.fixture(scope="module")
def sims():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    sim = build_simulation(resolution=1)
    spmd = SpmdSimulation(sim, devices=jax.devices()[:8])
    return sim, spmd


def test_spmd_matches_single_device(sims):
    sim, spmd = sims
    s_ref = sim.init_state()
    s_par = spmd.init_state()
    for _ in range(3):
        s_ref = sim.step(s_ref)
        s_par = spmd.step(s_par)
    # solver tolerance equality (not bitwise: reductions reorder)
    for tag in s_ref.c:
        np.testing.assert_allclose(
            np.asarray(s_par.c[tag]), np.asarray(s_ref.c[tag]),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(s_par.phi[tag]), np.asarray(s_ref.phi[tag]),
            rtol=1e-5, atol=1e-8,
        )
    for m in s_ref.phi_M:
        np.testing.assert_allclose(
            np.asarray(s_par.phi_M[m]), np.asarray(s_ref.phi_M[m]),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(s_par.ode_states[m]), np.asarray(s_ref.ode_states[m]),
            rtol=1e-9, atol=1e-12,
        )


def test_spmd_iteration_counts_sane(sims):
    sim, spmd = sims
    s = spmd.init_state()
    s = spmd.step(s)
    assert 0 < int(s.emi_iters) < sim.opts.maxiter
    assert 0 < int(s.knp_iters) < sim.opts.maxiter
