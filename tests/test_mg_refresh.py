"""Lagged-AMG value refresh: shapes frozen, no recompile, iterations held.

The round-1 hierarchy was built once from the t=0 operator and never
refreshed (VERDICT item 7); this asserts the refresh path: after a large
local conductivity perturbation the refreshed hierarchy (a) has an
identical pytree structure (=> the compiled chunk is reused, no
recompilation), (b) still preconditions the perturbed operator to
convergence, and (c) does not do worse than the stale hierarchy.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402
from knpemi_tpu.sim.stepper import SolverOptions  # noqa: E402


def _perturb(sim, state):
    """Triple [K] in the right half of the ECS: a strong local kappa
    drift (the astrocyte stimulation regime)."""
    coords = sim.geom.subdomains[0].coords
    mask = jnp.asarray(coords[:, 0] > coords[:, 0].mean())
    cK = state.c[0].at[0].multiply(jnp.where(mask, 3.0, 1.0))
    c = dict(state.c)
    c[0] = cK
    return state._replace(c=c)


def _emi_iters(sim, state):
    phi, info = sim.emi_solver.solve(state.c, state.phi_M, None, x0=state.phi)
    return int(info.iters), bool(info.converged)


def test_refresh_keeps_shapes_and_convergence():
    sim = build_simulation(resolution=1)
    state = sim.init_state()
    state, *_ = sim.run(state, 2)

    state_p = _perturb(sim, state)

    mg_old = sim.emi_solver.mg
    it_stale, ok_stale = _emi_iters(sim, state_p)

    sim.refresh_mg(state_p)
    mg_new = sim.emi_solver.mg

    # (a) identical pytree structure and leaf shapes/dtypes -> the
    # compiled chunk (DeviceMG is an argument) is reused without retrace
    lo, to = jax.tree_util.tree_flatten(mg_old)
    ln, tn = jax.tree_util.tree_flatten(mg_new)
    assert to == tn
    assert [(x.shape, x.dtype) for x in lo] == [(x.shape, x.dtype) for x in ln]

    # (b) the refreshed hierarchy still converges on the perturbed state
    it_fresh, ok_fresh = _emi_iters(sim, state_p)
    assert ok_fresh
    # (c) and is at least as good as the stale one
    assert it_fresh <= max(it_stale, 1)


def test_refresh_3d_stimulation_excursion():
    """3-D variant of the staleness test, at the excursion the flagship
    actually sees: [K]e tripled inside a source-box region (reference
    stimulation drives 3.1 -> 9.3 mM locally), which moves kappa by
    ~30% exactly where the source sits.  The refreshed hierarchy must
    still converge and not do worse than the stale t=0 one.  The
    at-scale (840k dof) version of this measurement is
    tools/stress_mg_refresh.py (RESULTS.md round 3)."""
    import run_3d

    sim = run_3d.build_simulation(resolution=0)
    state = sim.init_state()
    state, *_ = sim.run(state, 2)

    coords = sim.geom.subdomains[0].coords
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    mid = (lo + hi) / 2
    box = jnp.asarray(
        np.all((coords > mid) & (coords < mid + 0.3 * (hi - lo)), axis=1)
    )
    c = dict(state.c)
    c[0] = state.c[0].at[0].multiply(jnp.where(box, 3.0, 1.0))
    state_p = state._replace(c=c)

    it_stale, ok_stale = _emi_iters(sim, state_p)
    sim.refresh_mg(state_p)
    it_fresh, ok_fresh = _emi_iters(sim, state_p)
    assert ok_fresh
    assert it_fresh <= max(it_stale, 1)


def test_refresh_no_retrace_in_run():
    sim = build_simulation(
        resolution=1,
        solver_options=SolverOptions(
            rtol_emi=1e-5, rtol_knp=1e-7, mg_refresh_every=2
        ),
    )
    state = sim.init_state()
    # 6 steps in chunks of 2 -> refresh fires twice between chunks
    state, it_e, it_k = sim.run(state, 6, save_every=2)
    assert int(state.step) == 6
    chunk_fn = sim._chunk_jit[2]
    # one trace despite two mid-run hierarchy swaps
    assert chunk_fn._cache_size() == 1
