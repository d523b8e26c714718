"""MMS convergence tests — the framework's primary correctness gates.

Reproduces the reference's manual verification programs
(tests/run_mms.py, tests/run_mms_emi.py) as *asserted* pytest cases
(SURVEY.md section 4: the reference prints L2 errors for a human to
inspect; here the O(h^2) rates are enforced):

* EMI potentials (phi_e, phi_i) with Dirichlet data on boundary tag 5,
* KNP concentrations (a, b in both subdomains) with the exact potential
  in the drift (run_mms.py:444) and unit interface coupling constants,
* both the direct (LU) and the TPU-native iterative paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from knpemi_tpu.mesh import unit_square_mms_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.mms import reference_mms_case, build_mms_data, l2_error
from knpemi_tpu.systems.emi import emi_system
from knpemi_tpu.systems.knp import knp_system
from knpemi_tpu.systems.coupling import set_initial_conditions
from knpemi_tpu.solvers import direct as D
from knpemi_tpu.solvers.api import create_solver_emi, create_solver_knp


def _solve(M, iterative=False):
    mesh = unit_square_mms_mesh(M)
    geom = build_geometry(mesh)
    case = reference_mms_case(geom)
    ions, emi_data, knp_data = build_mms_data(geom, case)
    p = case.params
    esys = emi_system(geom, ions, p, mms=emi_data)
    ksys = knp_system(geom, ions, p, mms=knp_data)
    c0 = set_initial_conditions(geom, ions)
    phiM0 = {m: jnp.zeros(sp.n_dofs) for m, sp in geom.membranes.items()}

    if iterative:
        emi_solver = create_solver_emi(esys, rtol=1e-10, maxiter=4000)
        knp_solver = create_solver_knp(ksys, rtol=1e-10, maxiter=4000)
        phi, info_emi = emi_solver.solve(c0, phiM0)
        cK, info_knp = knp_solver.solve(c0, phi, phiM0)
        assert int(info_emi.iters) < 4000 and int(info_knp.iters) < 4000
    else:
        x = D.solve_emi_direct(esys, c0, phiM0)
        phi = esys.split(jnp.asarray(x))
        cK, _ = (D.solve_knp_direct(ksys, c0, phi, phiM0), 0)

    errs = dict(
        phi_e=l2_error(geom, 0, phi[0], case.phi[0]),
        phi_i=l2_error(geom, 1, phi[1], case.phi[1]),
        a_e=l2_error(geom, 0, cK[0][0], case.conc[("a", 0)]),
        b_e=l2_error(geom, 0, cK[0][1], case.conc[("b", 0)]),
        a_i=l2_error(geom, 1, cK[1][0], case.conc[("a", 1)]),
        b_i=l2_error(geom, 1, cK[1][1], case.conc[("b", 1)]),
    )
    return errs


def _rates(errs_by_M, Ms):
    rates = {}
    for k in errs_by_M[Ms[0]]:
        rates[k] = [
            np.log2(errs_by_M[Ms[i - 1]][k] / errs_by_M[Ms[i]][k])
            for i in range(1, len(Ms))
        ]
    return rates


def test_mms_direct_rate2():
    Ms = [8, 16, 32]
    errs = {M: _solve(M) for M in Ms}
    rates = _rates(errs, Ms)
    for field, rs in rates.items():
        assert rs[-1] > 1.8, f"{field}: rates {rs}, errors {[errs[M][field] for M in Ms]}"


def test_mms_iterative_matches_direct():
    """The TPU-native Krylov path must reproduce the direct solve."""
    M = 16
    e_dir = _solve(M, iterative=False)
    e_it = _solve(M, iterative=True)
    for k in e_dir:
        assert abs(e_dir[k] - e_it[k]) < 1e-6 + 1e-3 * e_dir[k], (
            k, e_dir[k], e_it[k],
        )
