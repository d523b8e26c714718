"""End-to-end physiology test: the idealized 2-D HH scenario.

The reference validates this scenario by eyeballing action-potential
traces (SURVEY.md section 4).  Here it is asserted: the stimulated
membrane must fire and repolarize, concentrations must stay positive,
bulk electroneutrality must hold by construction, and total ion content
must be (approximately) conserved — invariants the reference never
checks programmatically.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402
from knpemi_tpu.ops import kernels as K  # noqa: E402


def _total_moles(sim, state):
    """integral of each ion concentration over both subdomains."""
    tot = np.zeros(len(sim.ions))
    for tag, sub in sim.geom.subdomains.items():
        cells = jnp.asarray(sub.cells)
        vols = jnp.asarray(sub.vols)
        ones = jnp.ones(sub.n_dofs)
        for k in range(len(sim.ions)):
            m = K.mass_apply(sub.n_dofs, state.c[tag][k], cells, vols)
            tot[k] += float(jnp.vdot(ones, m))
    return tot


@pytest.fixture(scope="module")
def ap_run():
    sim = build_simulation(resolution=1)
    state0 = sim.init_state()
    moles0 = _total_moles(sim, state0)
    phi_M_max = []

    def obs(s):
        phi_M_max.append(float(s.phi_M[1].max()))

    state, it_emi, it_knp = sim.run(state0, 100, save_every=10, observer=obs)
    return sim, state0, state, moles0, phi_M_max, it_emi, it_knp


def test_action_potential_fires_and_recovers(ap_run):
    sim, state0, state, moles0, phi_M_max, it_emi, it_knp = ap_run
    assert max(phi_M_max) > 0.0, "stimulated axon must fire (phi_M > 0)"
    final = np.asarray(state.phi_M[1])
    assert final.max() < -0.05, "membrane must repolarize by 10 ms"
    assert final.min() > -0.12, "no runaway hyperpolarization"


def test_concentrations_positive_and_bounded(ap_run):
    sim, state0, state, *_ = ap_run
    for tag in state.c:
        c = np.asarray(state.c[tag])
        assert np.isfinite(c).all()
        assert c.min() > 0.0
        assert c.max() < 300.0  # mol/m^3, physiological scale


def test_electroneutrality_by_construction(ap_run):
    """sum_k z_k c_k + z_rho rho = 0 at every dof (utils.py:247-267)."""
    sim, state0, state, *_ = ap_run
    zs = np.array([ion.z for ion in sim.ions])
    for tag in state.c:
        charge = np.einsum("k,kn->n", zs, np.asarray(state.c[tag]))
        np.testing.assert_allclose(charge, 0.0, atol=1e-10)


def test_total_ion_content_nearly_conserved(ap_run):
    """No-flux exterior + conservative membrane exchange => total content
    per ion moves only by the splitting/linearization error."""
    sim, state0, state, moles0, *_ = ap_run
    moles1 = _total_moles(sim, state)
    rel = np.abs(moles1 - moles0) / np.abs(moles0)
    assert (rel < 5e-3).all(), f"relative drift {rel}"


def test_solver_iteration_counts_recorded(ap_run):
    sim, state0, state, moles0, phi_M_max, it_emi, it_knp = ap_run
    assert len(it_emi) == 100 and len(it_knp) == 100
    assert 0 < it_emi.mean() < sim.opts.maxiter
    assert 0 < it_knp.mean() < sim.opts.maxiter
