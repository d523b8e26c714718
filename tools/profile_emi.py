#!/usr/bin/env python3
"""EMI-solve anatomy at the flagship: per-phase costs (kappa, prepare,
rhs, diag source) and the CG cost/accuracy tradeoff vs rtol.

Mirrors tools/profile_knp.py --bisect-tag0: for each rtol variant the
solve reports iterations AND the TRUE relative residual of the returned
iterate — on the f32 path the attainable floor, not the recurrence
test, decides when extra iterations stop buying accuracy.

Usage:
    python tools/profile_emi.py [--case flagship] [--mesh-n 64] [--reps 10]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(
    0, str(Path(__file__).resolve().parent.parent / "examples" / "idealized")
)

from profile_step import timeit, loop_timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="flagship")
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--mesh-n", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.case == "flagship":
        sys.path.insert(
            0,
            str(Path(__file__).resolve().parent.parent
                / "examples" / "astrocyte"),
        )
        from run_stim_duration import build_simulation as build_astro
        from knpemi_tpu.sim.config import load_config, DEFAULTS

        cfg = dict(DEFAULTS)
        cfg.update(load_config(
            Path(__file__).resolve().parent.parent
            / "examples/astrocyte/config_files/baseline.yml"
        ))
        cfg["mesh_n"] = args.mesh_n
        sim = build_astro(cfg)
    else:
        from run_3d import build_simulation

        sim = build_simulation(resolution=args.res, g_syn_bar=10.0)

    state = sim.init_state()
    chunk1 = sim._chunk(1)
    state, _ = chunk1(state)
    jax.block_until_ready(state.t)

    R = args.reps
    es = sim.emi_sys
    solver = sim.emi_solver
    mg = solver.mg

    I_ch = {
        m: jnp.stack([
            mm.currents(state.ode_states[m], state.ode_params[m], state.t)[
                i.name
            ]
            for i in sim.ions
        ])
        for m, mm in sim.mem_models.items()
    }

    def _payload():
        return (es.blocked, es.mem_blocked)

    def _with_payload(payload, fn):
        old = _payload()
        es.blocked, es.mem_blocked = payload
        try:
            return fn()
        finally:
            es.blocked, es.mem_blocked = old

    print(f"n={es.n}  use_pallas={es.use_pallas}  rtol={solver.rtol}")

    # --- phases -----------------------------------------------------------
    kappa_j = jax.jit(lambda c: es.kappa(c))
    t_kap = timeit(kappa_j, state.c, reps=R)
    kappa = kappa_j(state.c)
    print(f"  kappa                : {t_kap:8.2f} ms")

    prep_j = jax.jit(lambda k, payload: _with_payload(
        payload, lambda: es.prepare(k)))
    t_prep = timeit(prep_j, kappa, _payload(), reps=R)
    ctx = prep_j(kappa, _payload())
    print(f"  prepare (wv)         : {t_prep:8.2f} ms")

    rhs_j = jax.jit(lambda c, pm, I, payload: _with_payload(
        payload, lambda: es.rhs(c, pm, I)))
    t_rhs = timeit(rhs_j, state.c, state.phi_M, I_ch, _payload(), reps=R)
    b = rhs_j(state.c, state.phi_M, I_ch, _payload())
    print(f"  rhs                  : {t_rhs:8.2f} ms")

    t_mv = loop_timeit(
        lambda v, ctx, payload: _with_payload(
            payload, lambda: es.matvec(v, ctx)),
        b, ctx, _payload(), K=20)
    print(f"  matvec (exact A0)    : {t_mv:8.3f} ms/op")

    # --- full solve vs rtol, with the true residual ------------------------
    from knpemi_tpu.solvers.cg import cg
    from knpemi_tpu.solvers.api import _equilibrate

    x0_flat = es.flatten(state.phi)

    def solve(c, pm, I, x0f, mg, payload, *, rtol):
        def inner():
            kap = es.kappa(c)
            ctx = es.prepare(kap)
            b = es.rhs(c, pm, I)
            d = mg.fine_diag
            A_hat, b_hat, x0_hat, s = _equilibrate(
                lambda v: es.matvec(v, ctx), b, d, x0f
            )
            nv = es.nullvec / s
            nv = nv / jnp.sqrt(solver.dot(nv, nv))
            M = lambda v: mg.apply(A_hat, v)
            res = cg(
                A_hat, b_hat, x0=x0_hat, M=M,
                rtol=rtol, atol=solver.atol, maxiter=solver.maxiter,
                nullspace=nv, dot=solver.dot,
            )
            r_true = b_hat - A_hat(res.x)
            # deflate the null component (pure-Neumann system)
            r_true = r_true - nv * solver.dot(nv, r_true)
            rel = jnp.sqrt(solver.dot(r_true, r_true)) / jnp.sqrt(
                solver.dot(b_hat, b_hat))
            return res.x * s, res.iters, rel

        return _with_payload(payload, inner)

    for rtol in (solver.rtol, 3e-6, 1e-5, 3e-5):
        f = jax.jit(lambda c, pm, I, x0f, mg, payload, rtol=rtol:
                    solve(c, pm, I, x0f, mg, payload, rtol=rtol))
        tms = timeit(f, state.c, state.phi_M, I_ch, x0_flat, mg,
                     _payload(), reps=R)
        _, it, rel = f(state.c, state.phi_M, I_ch, x0_flat, mg, _payload())
        print(f"  solve rtol={rtol:7.0e}    : {tms:8.2f} ms  "
              f"({int(it)} iters, true rel res {float(rel):.3e})")


if __name__ == "__main__":
    main()
