#!/usr/bin/env python3
"""AMG quality sweep on the FLAGSHIP (astrocyte tissue) EMI operator.

The round-3 bench exposed EMI CG at 57 iterations on the 840k-dof tissue
scenario vs 8 on the idealized boxes at the same scale.  This script
assembles the flagship operator at a host-tractable size and measures CG
iteration counts for hierarchy/deflation variants:

    python tools/tune_flagship_mg.py --n 32 [--rtol 1e-6] [--dtype float32]

Variants: the current default; per-subdomain multi-candidate B; theta
sweep; W-cycle; MG + ICS-indicator deflation (the combination the
non-MG fallback path already uses, solvers/api.py:111-146).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "astrocyte")
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="per-axis cells")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=400)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    import scipy.sparse as sp
    from knpemi_tpu.mesh.tissue import astrocyte_tissue_mesh
    from knpemi_tpu.ops.geometry import build_geometry
    from knpemi_tpu.systems.types import Ion, PhysicalParams
    from knpemi_tpu.systems.emi import EMISystem
    from knpemi_tpu.systems.coupling import set_initial_conditions
    from knpemi_tpu.solvers import direct as D
    from knpemi_tpu.solvers.mg import build_hierarchy
    from knpemi_tpu.solvers.cg import cg
    from run_stim_duration import (
        D_K, D_CL, D_NA, K_E_INIT, K_N_INIT, K_G_INIT, NA_E_INIT,
        NA_N_INIT, NA_G_INIT, CL_E_INIT, CL_N_INIT, CL_G_INIT,
    )

    dt_ = jnp.float32 if args.dtype == "float32" else jnp.float64
    mesh = astrocyte_tissue_mesh(n=args.n)
    geom = build_geometry(mesh)
    params = PhysicalParams(
        dt=0.1, F=96500e3, R=8.315e3, temperature=307e3, C_M=1.0,
        rho_z=-1.0,
        rho={
            0: NA_E_INIT + K_E_INIT - CL_E_INIT,
            1: NA_N_INIT + K_N_INIT - CL_N_INIT,
            2: NA_G_INIT + K_G_INIT - CL_G_INIT,
        },
    )
    le2, li2 = 1.2**2, 2.55**2
    Ds = lambda Dv: {0: Dv / le2, 1: Dv / li2, 2: Dv / li2}
    ions = [
        Ion("K", 1.0, Ds(D_K), {0: K_E_INIT, 1: K_N_INIT, 2: K_G_INIT}),
        Ion("Cl", -1.0, Ds(D_CL), {0: CL_E_INIT, 1: CL_N_INIT, 2: CL_G_INIT}),
        Ion("Na", 1.0, Ds(D_NA), {0: NA_E_INIT, 1: NA_N_INIT, 2: NA_G_INIT}),
    ]
    esys = EMISystem(geom, ions, params, dtype=jnp.float64)
    c0 = set_initial_conditions(geom, ions, dtype=jnp.float64)
    kappa = {t: np.asarray(v) for t, v in esys.kappa(c0).items()}
    A0 = D.assemble_emi_csr(esys, kappa)
    n = A0.shape[0]
    print(f"flagship n={args.n}: emi dofs = {n}")
    d = A0.diagonal()
    d = np.where(d != 0, d, 1.0)
    s = 1.0 / np.sqrt(np.abs(d))
    A_hat = (sp.diags(s) @ A0 @ sp.diags(s)).tocsr().astype(np.float64)

    rng = np.random.default_rng(0)
    b = (A_hat @ rng.standard_normal(n)).astype(np.float64)
    b = jnp.asarray(b, dt_)

    # per-subdomain indicator columns (equilibrated space: x = s*y maps
    # physical indicator 1_t to 1_t / s)
    cols = []
    for t in esys.tags:
        e = np.zeros(n)
        off = int(esys.offsets[t])
        nd = int(esys.sub[t]["n_dofs"])
        e[off : off + nd] = 1.0
        cols.append(e / s)
    W_np = np.stack(cols, axis=1)

    nullv = None
    if esys.nullvec is not None:
        nv = np.asarray(esys.nullvec) / s
        nullv = jnp.asarray(nv / np.linalg.norm(nv), dt_)

    variants = [
        dict(label="default th.08",
             hk=dict(theta=0.08)),
        dict(label="th.04",
             hk=dict(theta=0.04)),
        dict(label="th.02",
             hk=dict(theta=0.02)),
        dict(label="W-cycle th.08",
             hk=dict(theta=0.08, gamma=2)),
        dict(label="W-cycle th.04",
             hk=dict(theta=0.04, gamma=2)),
        dict(label="th.04 cmax3k",
             hk=dict(theta=0.04, coarse_max=3000)),
    ]
    for v in variants:
        t0 = time.perf_counter()
        B = W_np if v.get("B3") else 1.0 / s
        hk = dict(coarse_max=800)
        hk.update(v["hk"])
        hier = build_hierarchy(
            A_hat, B=B, smoother="jacobi", degree=1, banded=False, **hk,
        )
        dev = hier.device(dt_)
        lv0 = dev.levels[0]
        op = lambda x, lv0=lv0: (lv0["a_vals"] * x[lv0["a_cols"]]).sum(axis=1)
        mgM = lambda r, dev=dev: dev.apply(lambda x: x, r)
        if v.get("deflate"):
            W = jnp.asarray(W_np, dt_)
            AW = jnp.stack(
                [jnp.asarray(A_hat @ W_np[:, j], dt_)
                 for j in range(W_np.shape[1])], axis=1)
            G = W.T @ AW

            def M(r, W=W, G=G, mgM=mgM):
                return mgM(r) + W @ jnp.linalg.solve(G, W.T @ r)
        else:
            M = mgM
        res = jax.jit(
            lambda b, M=M, rtol=v.get("rtol", args.rtol): cg(
                op, b, M=M, rtol=rtol, maxiter=args.maxiter,
                nullspace=nullv,
            )
        )(b)
        sizes = "/".join(str(l.n) for l in hier.levels)
        print(f"{v['label']:24s}: iters {int(res.iters):4d} "
              f"converged={bool(res.converged)} levels {sizes} "
              f"({time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
