#!/usr/bin/env python3
"""Phase-level bisection of the KNP solve (the flagship step's long pole).

Splits KNPSolver.solve into: prep (rhs, blocked drift context,
equilibration), per-tag batched-GMRES totals, the per-iteration cost
slope (forced iteration counts at small restart), and the per-iteration
components (batched matvec, batched V-cycle).  The slope minus the
components is the Arnoldi/orchestration overhead; the full-solve total
minus the per-tag totals and prep is dispatch/fusion slack.

Usage:
    python tools/profile_knp.py [--case flagship] [--mesh-n 64] [--reps 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(
    0, str(Path(__file__).resolve().parent.parent / "examples" / "idealized")
)

from profile_step import timeit, loop_timeit  # noqa: E402


def _bisect_tag0(sim, state, phi, I_ch, gate, R):
    """Tag-0 GMRES cost anatomy: same solve under (rtol, maxiter,
    forced-trip) variants plus the chained per-iteration body, to
    attribute the production-vs-forced per-iteration gap."""
    import jax
    import jax.numpy as jnp

    from knpemi_tpu.solvers.gmres import gmres_batched

    ks = sim.knp_sys
    solver = sim.knp_solver
    mg_t = (solver.mg or {}).get(0)
    t = 0

    def _payload():
        return (ks.blocked, ks.mem_blocked)

    def _with_payload(payload, fn):
        old = _payload()
        ks.blocked, ks.mem_blocked = payload
        try:
            return fn()
        finally:
            ks.blocked, ks.mem_blocked = old

    rhs = jax.jit(lambda c, ph, pm, I, payload: _with_payload(
        payload, lambda: ks.rhs(c, ph, pm, I, gate)))(
        state.c, phi, state.phi_M, I_ch, _payload())
    gradphi = jax.jit(lambda ph, payload: _with_payload(
        payload, lambda: ks.gradphi_cells(ph)))(phi, _payload())

    diag = jnp.broadcast_to(
        mg_t.fine_diag, (ks.n_solved,) + mg_t.fine_diag.shape)
    s_eq = 1.0 / jnp.sqrt(jnp.abs(diag))
    b_t = rhs[t]
    x0_t = state.c[t][: ks.n_solved]

    def tag_solve(b, x0, s_eq, gp, mg_t, payload, *,
                  restart, maxiter, rtol, min_iter=None):
        min_iter = solver.min_iter if min_iter is None else min_iter

        def inner():
            A_hat = lambda V: s_eq * ks.matvec_batch(t, s_eq * V, gp)
            M = lambda V: mg_t.apply_batch(lambda W: W, V)
            res = gmres_batched(
                A_hat, s_eq * b, x0=x0 / s_eq, M=M,
                rtol=rtol, atol=solver.atol, maxiter=maxiter,
                restart=restart, min_iter=min_iter,
                bdot=solver.bdot,
            )
            # TRUE relative residual of the returned iterate (per ion
            # row), independent of the GMRES recurrence
            r_true = s_eq * b - A_hat(res.x)
            rel = jnp.sqrt(solver.bdot(r_true, r_true)) / jnp.sqrt(
                solver.bdot(s_eq * b, s_eq * b))
            return s_eq * res.x, res.iters, rel

        return _with_payload(payload, inner)

    from knpemi_tpu.solvers.mg import DeviceMG

    mg10 = DeviceMG(mg_t.levels, mg_t.coarse_V, mg_t.coarse_ilam, mg_t.nu,
                    mg_t.fine_diag, mg_t.gamma, mg_t.perm, mg_t.iperm,
                    post_smooth=False)
    variants = [
        ("prod rtol, min_it=5 (default) ", mg_t,
         dict(restart=8, maxiter=1000, rtol=solver.rtol)),
        ("prod rtol, min_it=0           ", mg_t,
         dict(restart=8, maxiter=1000, rtol=solver.rtol, min_iter=0)),
        ("prod rtol, min_it=0, m=30     ", mg_t,
         dict(restart=30, maxiter=1000, rtol=solver.rtol, min_iter=0)),
        ("V(1,0)   , min_it=0, m=30     ", mg10,
         dict(restart=30, maxiter=1000, rtol=solver.rtol, min_iter=0)),
        ("V(1,0)   , min_it=2, m=30     ", mg10,
         dict(restart=30, maxiter=1000, rtol=solver.rtol, min_iter=2)),
    ]
    for name, mgv, kw in variants:
        f = jax.jit(lambda b, x0, s_eq, gp, mg_t, payload, kw=kw:
                    tag_solve(b, x0, s_eq, gp, mg_t, payload, **kw))
        tms = timeit(f, b_t, x0_t, s_eq, gradphi[t], mgv, _payload(), reps=R)
        _, it, rel = f(b_t, x0_t, s_eq, gradphi[t], mgv, _payload())
        import numpy as _np
        print(f"  {name}: {tms:8.2f} ms  ({int(it)} iters, "
              f"true rel res {_np.asarray(rel)})")

    # chained per-iteration body: z = M(v); w = A(z) — the true floor
    V0 = b_t * s_eq

    def body(V, gp, mgv, payload):
        def inner():
            Z = mgv.apply_batch(lambda W: W, V)
            return s_eq * ks.matvec_batch(t, s_eq * Z, gp)
        return _with_payload(payload, inner)

    t_body = loop_timeit(body, V0, gradphi[t], mg_t, _payload(), K=20)
    print(f"  chained body (M + A)          : {t_body:8.3f} ms/iter")
    t_body10 = loop_timeit(body, V0, gradphi[t], mg10, _payload(), K=20)
    print(f"  chained body, V(1,0)          : {t_body10:8.3f} ms/iter")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="flagship")
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--mesh-n", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--restart", type=int, default=None,
                    help="override solver.restart (production-rtol sweep)")
    ap.add_argument("--bisect-tag0", action="store_true",
                    help="tag-0 only: separate rtol / maxiter / trip-count "
                         "effects on the per-iteration cost")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    ks = sim.knp_sys
    if args.restart is not None:
        sim.knp_solver.restart = args.restart
        print(f"restart overridden to {args.restart}")
    mg = sim.knp_solver.mg or {}
    solver = sim.knp_solver

    I_ch = {
        m: jnp.stack([
            mm.currents(state.ode_states[m], state.ode_params[m], state.t)[i.name]
            for i in sim.ions
        ])
        for m, mm in sim.mem_models.items()
    }
    phi = state.phi
    gate = sim.source_gate(state.t)

    # blocking lane arrays travel as jit ARGUMENTS (HLO-constant payloads
    # exceed the remote-compile request bound — same as profile_step.py)
    def _payload():
        return (ks.blocked, ks.mem_blocked)

    def _with_payload(payload, fn):
        old = _payload()
        ks.blocked, ks.mem_blocked = payload
        try:
            return fn()
        finally:
            ks.blocked, ks.mem_blocked = old

    print(f"tags: {ks.tags}  n/tag: {[ks.sub[t]['n_dofs'] for t in ks.tags]}"
          f"  ions solved: {ks.n_solved}  use_pallas: {ks.use_pallas}")

    if args.bisect_tag0:
        _bisect_tag0(sim, state, phi, I_ch, gate, R)
        return

    # --- full solve -----------------------------------------------------
    def full(state, phi, I_ch, mg, payload):
        def inner():
            old = solver.mg
            solver.mg = mg
            try:
                c, info = solver.solve(
                    state.c, phi, state.phi_M, I_ch,
                    source_gate=gate, x0=state.c,
                )
            finally:
                solver.mg = old
            return c, info.iters

        return _with_payload(payload, inner)

    full_j = jax.jit(full)
    t_full = timeit(full_j, state, phi, I_ch, mg, _payload(), reps=R)
    _, its = full_j(state, phi, I_ch, mg, _payload())
    print(f"KNP solve (full)       : {t_full:8.2f} ms  ({int(its)} iters)")

    # --- prep phases ------------------------------------------------------
    rhs_j = jax.jit(lambda c, ph, pm, I, payload: _with_payload(
        payload, lambda: ks.rhs(c, ph, pm, I, gate)))
    t_rhs = timeit(rhs_j, state.c, phi, state.phi_M, I_ch, _payload(), reps=R)
    print(f"  rhs                  : {t_rhs:8.2f} ms")

    # production drift context: only the "blocked" branch survives DCE in
    # the jitted solve; time it alone
    from knpemi_tpu.ops import pallas_assembly as PA

    def gp_blocked(phi, payload):
        def inner():
            return {
                t: PA.prepare_knp_drift(
                    phi[t], ks.blocked[t]["bk"], ks.blocked[t]["grads"])
                for t in ks.tags
            }
        return _with_payload(payload, inner)

    if ks.use_pallas:
        gpb_j = jax.jit(gp_blocked)
        t_gpb = timeit(gpb_j, phi, _payload(), reps=R)
        print(f"  drift ctx (blocked)  : {t_gpb:8.2f} ms")

    gradphi = jax.jit(lambda ph, payload: _with_payload(
        payload, lambda: ks.gradphi_cells(ph)))(phi, _payload())
    rhs = rhs_j(state.c, phi, state.phi_M, I_ch, _payload())

    # --- per-tag solve totals + iteration scaling -------------------------
    from knpemi_tpu.solvers.gmres import gmres_batched

    for t in ks.tags:
        mg_t = mg.get(t)
        if mg_t is not None and getattr(mg_t, "fine_diag", None) is not None:
            diag = jnp.broadcast_to(
                mg_t.fine_diag, (ks.n_solved,) + mg_t.fine_diag.shape)
        else:
            diag = jax.jit(lambda g, t=t: ks.diag(t, g))(gradphi[t])
        s_eq = 1.0 / jnp.sqrt(jnp.abs(diag))

        def tag_solve(b, x0, s_eq, gp, mg_t, payload, t=t,
                      restart=None, maxiter=None, rtol=None):
            restart = solver.restart if restart is None else restart
            maxiter = solver.maxiter if maxiter is None else maxiter
            rtol = solver.rtol if rtol is None else rtol

            def inner():
                A_hat = lambda V: s_eq * ks.matvec_batch(t, s_eq * V, gp)
                M = None
                if mg_t is not None:
                    M = lambda V: mg_t.apply_batch(lambda W: W, V)
                res = gmres_batched(
                    A_hat, s_eq * b, x0=x0 / s_eq, M=M,
                    rtol=rtol, atol=solver.atol, maxiter=maxiter,
                    restart=restart, min_iter=solver.min_iter,
                    bdot=solver.bdot,
                )
                return s_eq * res.x, res.iters

            return _with_payload(payload, inner)

        x0_t = state.c[t][: ks.n_solved]
        tag_j = jax.jit(tag_solve)
        t_tag = timeit(tag_j, rhs[t], x0_t, s_eq, gradphi[t], mg_t,
                       _payload(), reps=R)
        _, it_t = tag_j(rhs[t], x0_t, s_eq, gradphi[t], mg_t, _payload())
        n_t = ks.sub[t]["n_dofs"]
        print(f"  tag {t} solve (n={n_t:>7}): {t_tag:8.2f} ms  ({int(it_t)} iters)")

        # forced-iteration scaling: restart=k, maxiter=k, rtol->floor gives
        # exactly k inner iterations in one cycle
        ts = {}
        for k in (2, 8):
            fk = jax.jit(lambda b, x0, s_eq, gp, mg_t, payload, k=k, t=t:
                         tag_solve(b, x0, s_eq, gp, mg_t, payload,
                                   restart=k, maxiter=k, rtol=0.0))
            ts[k] = timeit(fk, rhs[t], x0_t, s_eq, gradphi[t], mg_t,
                           _payload(), reps=R)
        slope = (ts[8] - ts[2]) / 6.0
        setup = ts[2] - 2 * slope
        print(f"    forced k=2/8       : {ts[2]:8.2f} / {ts[8]:8.2f} ms"
              f"  -> {slope:6.2f} ms/iter + {setup:6.2f} ms setup")

        # per-iteration components, loop-amortized
        V0 = rhs[t] * s_eq
        t_mv = loop_timeit(
            lambda V, gp, payload, t=t: _with_payload(
                payload, lambda: ks.matvec_batch(t, V, gp)),
            V0, gradphi[t], _payload(), K=20)
        print(f"    matvec_batch       : {t_mv:8.3f} ms/op")
        if mg_t is not None:
            t_vc = loop_timeit(
                lambda V, mgv, payload: _with_payload(
                    payload, lambda: mgv.apply_batch(lambda W: W, V)),
                V0, mg_t, _payload(), K=20)
            print(f"    V-cycle batch      : {t_vc:8.3f} ms/op")
            print(f"    -> Arnoldi/overhead: {slope - t_mv - t_vc:8.3f} ms/iter")


if __name__ == "__main__":
    main()
