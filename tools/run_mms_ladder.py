#!/usr/bin/env python3
"""Reference-scale MMS verification ladder.

The reference verifies at unit-square resolutions M=100...1600
(tests/make_mesh_mms.py:96-100, run_mms.py:614-616, run_mms_emi.py:342).
tests/test_mms.py asserts rate 2 at M=8/16/32 for CI speed; this script
demonstrates the same asserted convergence at the reference's sizes and
prints the familiar error tables.

    python tools/run_mms_ladder.py --Ms 100 200 400 [--iterative]

Direct (MUMPS-parity scipy LU) by default; --iterative runs the
TPU-native Krylov path at rtol 1e-10.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# MMS verification is an f64 host computation: force the CPU platform
# BEFORE any knpemi_tpu import (under the axon TPU plugin the
# JAX_PLATFORMS env var alone is ignored, and the package's TPU policy
# would silently truncate f64 to f32)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Ms", type=int, nargs="+", default=[100, 200, 400])
    ap.add_argument("--iterative", action="store_true")
    ap.add_argument("--min-rate", type=float, default=1.9)
    args = ap.parse_args()

    import jax.numpy as jnp
    from knpemi_tpu.mesh import unit_square_mms_mesh
    from knpemi_tpu.ops.geometry import build_geometry
    from knpemi_tpu.systems.emi import emi_system
    from knpemi_tpu.systems.knp import knp_system
    from knpemi_tpu.systems.coupling import set_initial_conditions
    from knpemi_tpu.systems.mms import (
        reference_mms_case, build_mms_data, l2_error,
    )
    from knpemi_tpu.solvers import direct as D
    from knpemi_tpu.solvers.api import create_solver_emi, create_solver_knp

    errs_by_M = {}
    for M in args.Ms:
        t0 = time.perf_counter()
        mesh = unit_square_mms_mesh(M)
        geom = build_geometry(mesh)
        case = reference_mms_case(geom)
        ions, emi_data, knp_data = build_mms_data(geom, case)
        p = case.params
        esys = emi_system(geom, ions, p, mms=emi_data)
        ksys = knp_system(geom, ions, p, mms=knp_data)
        c0 = set_initial_conditions(geom, ions)
        phiM0 = {m: jnp.zeros(sp.n_dofs) for m, sp in geom.membranes.items()}
        if args.iterative:
            # production-grade preconditioning: without the SA-AMG
            # hierarchies the KNP GMRES stagnates at rtol 1e-10 beyond
            # M~200 (measured: 20010 iterations at M=400, errors
            # solver-dominated at O(1)) — same recipe as
            # sim/stepper.py::_setup_emi_mg/_setup_knp_mg, f64 ELL
            import scipy.sparse as spr
            from knpemi_tpu.solvers.mg import build_hierarchy_cached
            from knpemi_tpu.solvers.direct import (
                assemble_emi_csr, _mass_coo, _stiffness_coo, _coo_accumulate,
            )

            # EMI hierarchy on the MASKED operator: the MMS variant
            # solves with symmetric Dirichlet elimination (identity on
            # bc rows, systems/emi.py), so the hierarchy must be built
            # from the same masked matrix — a hierarchy on the raw
            # assembled operator WORSENS CG (239 vs 61 its at M=100,
            # measured), and without any MG the deflation-CG fallback
            # stalls at M>=400 (false 61-iteration exit, O(1) error)
            kappa0 = {t: np.asarray(v) for t, v in esys.kappa(c0).items()}
            A0 = assemble_emi_csr(esys, kappa0).tocsr()
            if esys.mms is not None and esys.mms.dirichlet_dofs is not None:
                bc = esys.offsets[0] + np.asarray(esys.mms.dirichlet_dofs)
                msk = np.ones(A0.shape[0])
                msk[bc] = 0.0
                Dm = spr.diags(msk)
                A0 = (Dm @ A0 @ Dm + spr.diags(1.0 - msk)).tocsr()
            d0 = A0.diagonal()
            d0 = np.where(d0 != 0, d0, 1.0)
            s0 = 1.0 / np.sqrt(np.abs(d0))
            emi_hier = build_hierarchy_cached(
                (spr.diags(s0) @ A0 @ spr.diags(s0)).tocsr(),
                B=1.0 / s0, theta=0.04, banded=False, smoother="jacobi",
            )
            emi_mg = emi_hier.device(jnp.float64)
            emi_mg.fine_diag = jnp.asarray(d0, jnp.float64)

            knp_mg = {}
            for t, sub in geom.subdomains.items():
                Dbar = float(np.mean([ion.D[t] for ion in ions[:-1]]))
                r1, c1, v1 = _mass_coo(sub.cells, sub.vols, 1.0 / p.dt)
                r2, c2, v2 = _stiffness_coo(
                    sub.cells, sub.grads, sub.vols, coef_cell=Dbar
                )
                Ak = _coo_accumulate([r1, r2], [c1, c2], [v1, v2], sub.n_dofs)
                dk = Ak.diagonal()
                dk = np.where(dk != 0, dk, 1.0)
                sk = 1.0 / np.sqrt(np.abs(dk))
                hier_k = build_hierarchy_cached(
                    (spr.diags(sk) @ Ak @ spr.diags(sk)).tocsr(),
                    B=1.0 / sk, theta=0.04, banded=False, smoother="jacobi",
                )
                knp_mg[t] = hier_k.device(jnp.float64)
                knp_mg[t].fine_diag = jnp.asarray(dk, jnp.float64)

            es = create_solver_emi(esys, rtol=1e-10, maxiter=20000, mg=emi_mg)
            ks = create_solver_knp(ksys, rtol=1e-10, maxiter=20000, mg=knp_mg)
            phi, ie = es.solve(c0, phiM0)
            cK, ik = ks.solve(c0, phi, phiM0)
            solver_note = f"emi_it={int(ie.iters)} knp_it={int(ik.iters)}"
            if not bool(ie.converged):
                solver_note += " EMI-NOT-CONVERGED"
            if not bool(ik.converged):
                solver_note += " KNP-NOT-CONVERGED"
        else:
            x = D.solve_emi_direct(esys, c0, phiM0)
            phi = esys.split(jnp.asarray(x))
            cK = D.solve_knp_direct(ksys, c0, phi, phiM0)
            cK = {t: jnp.asarray(v) for t, v in cK.items()}
            solver_note = "direct LU"
        errs = dict(
            phi_e=l2_error(geom, 0, phi[0], case.phi[0]),
            phi_i=l2_error(geom, 1, phi[1], case.phi[1]),
            a_e=l2_error(geom, 0, cK[0][0], case.conc[("a", 0)]),
            b_e=l2_error(geom, 0, cK[0][1], case.conc[("b", 0)]),
            a_i=l2_error(geom, 1, cK[1][0], case.conc[("a", 1)]),
            b_i=l2_error(geom, 1, cK[1][1], case.conc[("b", 1)]),
        )
        errs_by_M[M] = errs
        dofs = geom.emi_size
        print(f"M={M:5d} (dofs {dofs}, {time.perf_counter() - t0:.1f}s, "
              f"{solver_note}): "
              + "  ".join(f"{k}={v:.3e}" for k, v in errs.items()))

    print("\nconvergence rates (vs previous M):")
    ok = True
    Ms = args.Ms
    for k in errs_by_M[Ms[0]]:
        rates = [
            float(np.log2(errs_by_M[Ms[i - 1]][k] / errs_by_M[Ms[i]][k])
                  / np.log2(Ms[i] / Ms[i - 1]))
            for i in range(1, len(Ms))
        ]
        tail = rates[-1] if rates else float("nan")
        flag = "" if tail > args.min_rate else "  <-- BELOW TARGET"
        ok = ok and tail > args.min_rate
        print(f"  {k:6s}: " + "  ".join(f"{r:.2f}" for r in rates) + flag)
    print("\nPASS" if ok else "\nFAIL", f"(target rate {args.min_rate})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
