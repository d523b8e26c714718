"""Golden-trace regression fixture (VERDICT round-1 item 10).

The FEniCSx reference stack is not installable in this environment
(zero egress), so reference-GENERATED traces cannot be produced here;
tests/data/golden_2d_res1.npz instead pins this framework's own
highest-fidelity solution of the idealized 2-D HH scenario — f64,
direct LU (the MUMPS-parity path), 100 steps through the action
potential — as committed data.  This test asserts the production path
(iterative Krylov + AMG, whatever kernels the platform selects)
reproduces it within splitting/solver tolerance, which (a) freezes the
physics against regressions across kernel rewrites and (b) is exactly
the harness a reference-generated trace drops into once one exists
(see RESULTS.md "Reference parity" for the honest gap statement).
"""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402

GOLDEN = Path(__file__).parent / "data" / "golden_2d_res1.npz"


def _golden_dof_maps(sim):
    """Map the golden fixture's dof order to the current run's.

    The fixture stores subdomain concentration vectors in the INTERNAL
    dof numbering of the run that generated it (Morton, pre-RCM); dof
    numbering is an implementation detail that legitimately changes
    (e.g. the round-3 RCM reordering), so the comparison goes through
    the global vertex ids: rebuild the geometry under the generating
    order and match vertices.  Membrane spaces are numbered by sorted
    global vertex id independent of the volume ordering, so phi_M
    needs no remapping."""
    import os

    os.environ["KNPEMI_ORDER"] = "morton"
    try:
        geom_m = build_simulation(resolution=1).geom
    finally:
        os.environ.pop("KNPEMI_ORDER")
    maps = {}
    for tag, sp in sim.geom.subdomains.items():
        inv = np.full(int(sp.vertices.max()) + 1, -1, dtype=np.int64)
        inv[np.asarray(sp.vertices)] = np.arange(sp.n_dofs)
        # golden dof g holds vertex geom_m.vertices[g] -> current dof
        maps[tag] = inv[np.asarray(geom_m.subdomains[tag].vertices)]
        assert (maps[tag] >= 0).all()
    return maps


def test_iterative_path_matches_golden():
    g = np.load(GOLDEN)
    sim = build_simulation(resolution=1)
    state = sim.init_state()
    probe = int(g["probe"])
    trace = []

    def obs(s):
        trace.append(float(s.phi_M[1][probe]))

    state, *_ = sim.run(state, 100, save_every=5, observer=obs)

    # membrane-potential trace through the AP: absolute agreement well
    # under physiological scales (golden swings ~134 mV)
    np.testing.assert_allclose(
        np.asarray(trace), g["phi_M_probe"], atol=2e-4
    )
    # final fields: potentials and concentrations (concentrations are
    # dof-ordered in the fixture -> compare via the vertex-id map)
    np.testing.assert_allclose(
        np.asarray(state.phi_M[1]), g["phi_M_final"], atol=2e-4
    )
    maps = _golden_dof_maps(sim)
    np.testing.assert_allclose(
        np.asarray(state.c[0])[:, maps[0]], g["c_final_ecs"], rtol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(state.c[1])[:, maps[1]], g["c_final_ics"], rtol=3e-3
    )


def test_golden_is_physical():
    """Sanity of the committed data itself: the golden run fires and
    repolarizes (guards against regenerating it from a broken state)."""
    g = np.load(GOLDEN)
    assert g["phi_M_probe"].min() < -0.08
    assert g["phi_M_probe"].max() > 0.03
    assert g["phi_M_probe"][-1] < -0.05
    assert g["K_e_max"].max() < 20.0
