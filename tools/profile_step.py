#!/usr/bin/env python3
"""Component-level timing of one coupled step on the current backend.

Times each phase of Simulation.step (ODE, EMI solve, KNP solve, coupling
refresh) and the inner EMI/KNP pieces (rhs, diag, matvec, V-cycle) as
separately jitted functions, to locate the hot spots the step-level
bench can't separate.  Usage:

    python tools/profile_step.py [--case 3d] [--res 1] [--reps 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(
    0, str(Path(__file__).resolve().parent.parent / "examples" / "idealized")
)


def timeit(fn, *args, reps=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def loop_timeit(op, x, *extra, K=50, reps=3):
    """Amortized per-op cost with the op chained K times INSIDE one jit —
    strips the per-dispatch overhead of the remote-TPU tunnel that
    inflates `timeit` numbers by several ms.  ``op(x, *extra)`` must
    return an array of x's shape."""
    import jax
    import jax.numpy as jnp

    def run(x, *extra):
        def body(i, x):
            y = op(x, *extra)
            # data dependency on i defeats loop-invariant hoisting
            return y + 0.0 * jnp.asarray(i, y.dtype)

        return jax.lax.fori_loop(0, K, body, x)

    j = jax.jit(run)
    out = j(x, *extra)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = j(x, *extra)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * K) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="3d")
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--mesh-n", type=int, default=64,
                    help="flagship tissue cells per axis")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.case == "2d":
        from run_2d import build_simulation

        sim = build_simulation(resolution=args.res)
    elif args.case == "flagship":
        # astrocyte-class tissue scenario (bench.py's flagship case)
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

    from knpemi_tpu.models.engine import update_ode_variables
    from knpemi_tpu.systems.coupling import update_pde_variables

    state = sim.init_state()
    # run one full step so fields are physical (chunk(1) passes the MG
    # hierarchies as jit ARGUMENTS — jit(sim.step) would embed the banded
    # slabs as HLO constants and blow the remote-compile payload limit)
    chunk1 = sim._chunk(1)
    state, _ = chunk1(state)
    jax.block_until_ready(state.t)

    p = sim.params
    R = args.reps

    # --- phase 1: ODE sweep -------------------------------------------
    def phase_ode(state):
        out = {}
        for m, mm in sim.mem_models.items():
            prms, sts = update_ode_variables(
                mm, state.ode_params[m], state.ode_states[m],
                state.c, state.phi_M[m], sim.ions, False,
            )
            sts = mm.step(sts, prms, state.t, p.dt)
            out[m] = (sts, mm.get_membrane_potential(sts))
        return out

    print(f"ODE sweep          : {timeit(jax.jit(phase_ode), state, reps=R):8.2f} ms")

    # --- phase 2: EMI solve -------------------------------------------
    I_ch = {
        m: jnp.stack([
            mm.currents(state.ode_states[m], state.ode_params[m], state.t)[i.name]
            for i in sim.ions
        ])
        for m, mm in sim.mem_models.items()
    }

    # blocking lane arrays travel as jit ARGUMENTS (closure-captured
    # device arrays become HLO constants; the flagship KNP system's
    # lane payload exceeds the remote-compile request bound, HTTP 413 —
    # same pattern as Simulation._chunk)
    def _payload():
        return (sim.emi_sys.blocked, sim.emi_sys.mem_blocked,
                sim.knp_sys.blocked, sim.knp_sys.mem_blocked)

    def _with_payload(payload, fn):
        old = _payload()
        (sim.emi_sys.blocked, sim.emi_sys.mem_blocked,
         sim.knp_sys.blocked, sim.knp_sys.mem_blocked) = payload
        try:
            return fn()
        finally:
            (sim.emi_sys.blocked, sim.emi_sys.mem_blocked,
             sim.knp_sys.blocked, sim.knp_sys.mem_blocked) = old

    def phase_emi(state, I_ch, mg, payload):
        def inner():
            old = sim.emi_solver.mg
            sim.emi_solver.mg = mg
            try:
                phi, info = sim.emi_solver.solve(
                    state.c, state.phi_M, I_ch, x0=state.phi
                )
            finally:
                sim.emi_solver.mg = old
            return phi, info.iters

        return _with_payload(payload, inner)

    emi_j = jax.jit(phase_emi)
    t_emi = timeit(emi_j, state, I_ch, sim.emi_solver.mg, _payload(), reps=R)
    phi, emi_it = emi_j(state, I_ch, sim.emi_solver.mg, _payload())
    print(f"EMI solve          : {t_emi:8.2f} ms   ({int(emi_it)} iters)")

    # EMI internals (loop-amortized: true per-op device cost)
    es = sim.emi_sys
    kappa = jax.jit(es.kappa)(state.c)
    ctx = jax.jit(es.prepare)(kappa)
    x = jnp.concatenate([state.phi[t] for t in es.tags])
    print(f"  EMI matvec       : {loop_timeit(lambda v: es.matvec(v, ctx), x):8.3f} ms/op")
    rhs_j = jax.jit(lambda c, pm, I: es.rhs(c, pm, I))
    print(f"  EMI rhs          : {timeit(rhs_j, state.c, state.phi_M, I_ch, reps=R):8.2f} ms (dispatch incl.)")
    diag_j = jax.jit(es.diag)
    print(f"  EMI diag         : {timeit(diag_j, kappa, reps=R):8.2f} ms (dispatch incl.)")
    if sim.emi_solver.mg is not None:
        d = diag_j(kappa)
        s = 1.0 / jnp.sqrt(jnp.abs(d))
        Ah = lambda v: s * es.matvec(s * v, ctx)
        mg0 = sim.emi_solver.mg
        print(f"  EMI V-cycle      : {loop_timeit(lambda r, mg: mg.apply(Ah, r), x, mg0):8.3f} ms/op")
        # (lagged banded/ELL fine-operator timings live in
        # tools/profile_matvec.py, which passes the slabs as jit args)

    # --- phase 3: KNP solve -------------------------------------------
    def phase_knp(state, phi, I_ch, mg, payload):
        def inner():
            old = sim.knp_solver.mg
            sim.knp_solver.mg = mg
            try:
                c, info = sim.knp_solver.solve(
                    state.c, phi, state.phi_M, I_ch,
                    source_gate=sim.source_gate(state.t), x0=state.c,
                )
            finally:
                sim.knp_solver.mg = old
            return c, info.iters

        return _with_payload(payload, inner)

    knp_j = jax.jit(phase_knp)
    t_knp = timeit(
        knp_j, state, phi, I_ch, sim.knp_solver.mg, _payload(), reps=R
    )
    c_new, knp_it = knp_j(state, phi, I_ch, sim.knp_solver.mg, _payload())
    print(f"KNP solve          : {t_knp:8.2f} ms   ({int(knp_it)} iters)")

    ks = sim.knp_sys
    # payload travels as a jit argument here too (flagship lane arrays
    # exceed the remote-compile body limit as HLO constants)
    rhs_k = jax.jit(
        lambda c, ph, pm, I, payload: _with_payload(
            payload, lambda: ks.rhs(c, ph, pm, I, 1.0)
        )
    )
    print(f"  KNP rhs          : {timeit(rhs_k, state.c, phi, state.phi_M, I_ch, _payload(), reps=R):8.2f} ms (dispatch incl.)")
    gp = jax.jit(ks.gradphi_cells)(phi)
    for t in ks.tags:
        v = state.c[t][0]
        t_mv = loop_timeit(
            lambda w, payload, t=t: _with_payload(
                payload,
                lambda: ks.matvec_one(
                    t, w, gp[t], float(sim.ions[0].D[t]),
                    float(sim.ions[0].z)
                ),
            ),
            v, _payload(),
        )
        print(f"  KNP matvec tag{t} : {t_mv:8.3f} ms/op")
        mg_t = sim.knp_solver.mg.get(t) if sim.knp_solver.mg else None
        if mg_t is not None:
            dk = jax.jit(lambda g, t=t: ks.diag(t, g))(gp[t])[0]
            sk = 1.0 / jnp.sqrt(jnp.abs(dk))
            Ahk = lambda w, t=t: sk * ks.matvec_one(
                t, sk * w, gp[t], float(sim.ions[0].D[t]), float(sim.ions[0].z)
            )
            t_vc = loop_timeit(
                lambda r, mg, payload: _with_payload(
                    payload, lambda: mg.apply(Ahk, r)
                ),
                v, mg_t, _payload(),
            )
            print(f"  KNP V-cycle tag{t}: {t_vc:8.3f} ms/op")

    # --- phase 4: coupling refresh --------------------------------------
    upd = jax.jit(
        lambda c, ph: update_pde_variables(sim.geom, sim.ions, p, c, ph)
    )
    print(f"coupling refresh   : {timeit(upd, c_new, phi, reps=R):8.2f} ms")

    # --- full step ------------------------------------------------------
    def full(s):
        s2, _ = chunk1(s)
        return s2

    print(f"FULL STEP          : {timeit(full, state, reps=max(3, R // 2)):8.2f} ms")


if __name__ == "__main__":
    main()
