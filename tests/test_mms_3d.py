"""3-D MMS convergence — validates the tetrahedral kernels end-to-end
(the reference verifies only in 2-D, run_mms.py)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from knpemi_tpu.mesh import unit_cube_mms_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.mms import reference_mms_case_3d, build_mms_data, l2_error
from knpemi_tpu.systems.emi import emi_system
from knpemi_tpu.systems.knp import knp_system
from knpemi_tpu.systems.coupling import set_initial_conditions
from knpemi_tpu.solvers import direct as D


def _solve(M):
    geom = build_geometry(unit_cube_mms_mesh(M))
    case = reference_mms_case_3d(geom)
    ions, emi_data, knp_data = build_mms_data(geom, case)
    p = case.params
    esys = emi_system(geom, ions, p, mms=emi_data)
    ksys = knp_system(geom, ions, p, mms=knp_data)
    c0 = set_initial_conditions(geom, ions)
    phiM0 = {m: jnp.zeros(sp.n_dofs) for m, sp in geom.membranes.items()}
    x = D.solve_emi_direct(esys, c0, phiM0)
    phi = esys.split(jnp.asarray(x))
    cK = D.solve_knp_direct(ksys, c0, phi, phiM0)
    return dict(
        phi_e=l2_error(geom, 0, phi[0], case.phi[0]),
        phi_i=l2_error(geom, 1, phi[1], case.phi[1]),
        a_e=l2_error(geom, 0, cK[0][0], case.conc[("a", 0)]),
        a_i=l2_error(geom, 1, cK[1][0], case.conc[("a", 1)]),
    )


def test_mms_3d_rate2():
    errs = {M: _solve(M) for M in [4, 8, 16]}
    for field in errs[4]:
        r = np.log2(errs[8][field] / errs[16][field])
        assert r > 1.6, (
            field, [errs[M][field] for M in [4, 8, 16]], r,
        )
