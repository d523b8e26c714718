#!/usr/bin/env python3
"""Host-side AMG quality sweep: CG iteration counts of V-cycle variants
on the EMI operator, independent of TPU kernels (CPU, f64 math in f32
deployment precision optional).

    python tools/tune_mg_quality.py --res 2
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=2)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--rtol", type=float, default=1e-5)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    import scipy.sparse as sp
    from knpemi_tpu.mesh.generators import idealized_3d_mesh
    from knpemi_tpu.ops.geometry import build_geometry
    from knpemi_tpu.systems.types import Ion, PhysicalParams
    from knpemi_tpu.systems.emi import EMISystem
    from knpemi_tpu.systems.coupling import set_initial_conditions
    from knpemi_tpu.solvers import direct as D
    from knpemi_tpu.solvers.mg import build_hierarchy
    from knpemi_tpu.solvers.cg import cg
    from run_3d import D_K, D_CL, D_NA, K_E_INIT, K_I_INIT, CL_E_INIT, \
        CL_I_INIT, NA_E_INIT, NA_I_INIT

    dt = jnp.float32 if args.dtype == "float32" else jnp.float64
    mesh = idealized_3d_mesh(args.res)
    geom = build_geometry(mesh)
    params = PhysicalParams(dt=1e-4, rho={0: 0.0, 1: 0.0})
    ions = [
        Ion("K", 1.0, {0: D_K, 1: D_K}, {0: K_E_INIT, 1: K_I_INIT}),
        Ion("Cl", -1.0, {0: D_CL, 1: D_CL}, {0: CL_E_INIT, 1: CL_I_INIT}),
        Ion("Na", 1.0, {0: D_NA, 1: D_NA}, {0: NA_E_INIT, 1: NA_I_INIT}),
    ]
    esys = EMISystem(geom, ions, params, dtype=jnp.float64)
    c0 = set_initial_conditions(geom, ions, dtype=jnp.float64)
    kappa = {t: np.asarray(v) for t, v in esys.kappa(c0).items()}
    A0 = D.assemble_emi_csr(esys, kappa)
    n = A0.shape[0]
    print(f"res {args.res}: n = {n}")
    d = A0.diagonal()
    s = 1.0 / np.sqrt(np.abs(np.where(d != 0, d, 1.0)))
    A_hat = (sp.diags(s) @ A0 @ sp.diags(s)).tocsr().astype(np.float64)

    # physical-style rhs: the diffusive driving term
    rng = np.random.default_rng(0)
    b = (A_hat @ rng.standard_normal(n)).astype(np.float64)
    b = jnp.asarray(b, dt)
    Ah = sp.csr_matrix(A_hat, dtype=np.float64)
    cols, vals = None, None

    def matvec(x):
        # ELL-free scipy matvec via callback is not jittable; use a
        # jnp CSR-as-ELL? simplest: dense segments — just use the
        # hierarchy's own fine ELL (fine_ell=True) as the operator:
        raise RuntimeError

    nullv = jnp.asarray((1.0 / s) / np.linalg.norm(1.0 / s), dt)

    variants = [
        dict(theta=0.08, smoother="jacobi", degree=1, omega_p=4/3, label="jacobi th.08"),
        dict(theta=0.04, smoother="jacobi", degree=1, omega_p=4/3, label="jacobi th.04"),
        dict(theta=0.02, smoother="jacobi", degree=1, omega_p=4/3, label="jacobi th.02"),
        dict(theta=0.08, smoother="cheby", degree=3, omega_p=4/3, label="cheby3 th.08"),
        dict(theta=0.04, smoother="cheby", degree=3, omega_p=4/3, label="cheby3 th.04"),
    ]
    for v in variants:
        t0 = time.perf_counter()
        hier = build_hierarchy(
            A_hat, B=1.0 / s, theta=v["theta"], smoother=v["smoother"],
            degree=v["degree"], omega_p=v["omega_p"],
            coarse_max=v.get("coarse_max", 800), banded=False,
        )
        dev = hier.device(dt)
        lv0 = dev.levels[0]
        op = lambda x, lv0=lv0: (lv0["a_vals"] * x[lv0["a_cols"]]).sum(axis=1)
        M = lambda r, dev=dev: dev.apply(lambda x: x, r)
        res = jax.jit(
            lambda b: cg(op, b, M=M, rtol=args.rtol, maxiter=400,
                         nullspace=nullv)
        )(b)
        sizes = "/".join(str(l.n) for l in hier.levels)
        print(f"{v['label']:22s}: iters {int(res.iters):4d} "
              f"converged={bool(res.converged)} levels {sizes} "
              f"(setup {time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
