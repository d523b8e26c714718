#!/usr/bin/env python3
"""Bisect the sharded step's overhead (round-4 TPU: 2.24x vs the
single-device step at res 1 — 86 vs 38.5 ms, dominated by per-step
fixed machinery; tools/bench_sharded_overhead.py).

Times the 1-device shard_map step under solver-tolerance ablations so
the stage costs separate without internal surgery:

    full                 : EMI CG + KNP GMRES + ODE/refresh
    emi_off  (rtol 1e30) : KNP + ODE/refresh (+ ~1 EMI it)
    both_off (rtol 1e30) : ODE/refresh + per-step fixed machinery
    gathered_mg          : full, replicated-hierarchy fallback
                           (_GatheredMG) instead of the distributed
                           V-cycle — isolates ShardedMG itself

Usage (CPU is the cheap venue; run on TPU to see the Mosaic picture):

    python tools/profile_sharded.py [--res 1] [--steps 3] [--cpu]
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "idealized"))


def _time(fn, state, n):
    state = fn(state)  # compile
    state.t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    state.t.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rhs-only", action="store_true",
                    help="run only the rhs-isolation variants")
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filter of variant labels")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from run_3d import build_simulation
    from knpemi_tpu.parallel.sharded import ShardedSimulation

    sim = build_simulation(resolution=args.res, g_syn_bar=10.0)
    base_opts = sim.opts

    chunk = sim._chunk(1)
    ms, st = _time(lambda s: chunk(s)[0], sim.init_state(), args.steps)
    print(f"single full         : {ms:8.1f} ms  "
          f"(emi {int(st.emi_iters)}, knp {int(st.knp_iters)})")
    single_ms = ms

    def shard_variant(label, dmg=True, **opt_kw):
        if args.only and not any(
            s.strip() in label for s in args.only.split(",")
        ):
            return
        sim.opts = dataclasses.replace(base_opts, **opt_kw)
        try:
            sh = ShardedSimulation(sim, devices=jax.devices()[:1],
                                   distributed_mg=dmg)
            shc = sh._chunk(1)
            ms, st = _time(lambda s: shc(s)[0], sh.init_state(), args.steps)
            print(f"{label:20s}: {ms:8.1f} ms  ({ms / single_ms:5.1f}x, "
                  f"emi {int(st.emi_iters)}, knp {int(st.knp_iters)})")
        finally:
            sim.opts = base_opts

    if not args.rhs_only:
        shard_variant("sharded full")
        shard_variant("sharded emi_off", rtol_emi=1e30, atol_emi=1e30)
        shard_variant("sharded both_off", rtol_emi=1e30, atol_emi=1e30,
                      rtol_knp=1e30, atol_knp=1e30)
        shard_variant("sharded gathered_mg", dmg=False)

    # ---- deep ablations: stub out whole stages at trace time ----------
    import jax.numpy as jnp
    from knpemi_tpu.solvers import api as sapi

    def _info():
        return sapi.SolveInfo(
            iters=jnp.asarray(0, jnp.int32),
            resnorm=jnp.asarray(0.0, sim.dtype),
            converged=jnp.asarray(True),
        )

    class StubEMI:
        def __init__(self, sys_, **kw):
            pass

        def solve(self, c, phi_M, I_ch=None, x0=None):
            return x0, _info()

    class StubKNP:
        def __init__(self, sys_, **kw):
            self.ns = sys_.base.n_solved if hasattr(sys_, "base") else None

        def solve(self, c, phi, phi_M, I_ch, source_gate=None, x0=None):
            return {t: v[: self.ns] for t, v in c.items()}, _info()

    real_emi, real_knp = sapi.EMISolver, sapi.KNPSolver

    def with_stubs(label, stub_emi, stub_knp, no_ode=False):
        sapi.EMISolver = StubEMI if stub_emi else real_emi
        sapi.KNPSolver = StubKNP if stub_knp else real_knp
        saved = {}
        if no_ode:
            for m, mm in sim.mem_models.items():
                saved[m] = mm.step
                mm.step = lambda s, p, t, dt: s
        try:
            shard_variant(label)
        finally:
            sapi.EMISolver, sapi.KNPSolver = real_emi, real_knp
            for m, fn in saved.items():
                sim.mem_models[m].step = fn

    if not args.rhs_only:
        # no EMI work at all (incl. kappa/prepare/rhs)
        with_stubs("stub emi", True, False)
        # no linear-solver work at all: ODE stage + refresh + plumbing
        with_stubs("stub emi+knp", True, True)
        # plumbing + refresh only
        with_stubs("stub emi+knp+ode", True, True, no_ode=True)

    # keep the system math (rhs/gradphi), skip solver machinery: splits
    # "weak-form setup" from "equilibrate/Krylov/MG plumbing"
    class StubEMIKeepRHS:
        def __init__(self, sys_, **kw):
            self.sys = sys_

        def solve(self, c, phi_M, I_ch=None, x0=None):
            kappa = self.sys.kappa(c)
            self.sys.prepare(kappa)
            b = self.sys.rhs(c, phi_M, I_ch)
            xs = self.sys.split(b)
            x0 = {t: x0[t] + 0.0 * xs[t] for t in x0}
            return x0, _info()

    class StubKNPKeepRHS:
        def __init__(self, sys_, **kw):
            self.sys = sys_
            self.ns = sys_.base.n_solved

        def solve(self, c, phi, phi_M, I_ch, source_gate=None, x0=None):
            rhs = self.sys.rhs(c, phi, phi_M, I_ch, source_gate)
            gp = self.sys.gradphi_cells(phi)
            out = {}
            for t, v in c.items():
                z = 0.0 * rhs[t] + 0.0 * gp[t]["cell"].sum()
                out[t] = v[: self.ns] + z
            return out, _info()

    sapi.EMISolver = StubEMIKeepRHS
    sapi.KNPSolver = StubKNP
    try:
        shard_variant("emi rhs only")
    finally:
        sapi.EMISolver, sapi.KNPSolver = real_emi, real_knp
    sapi.EMISolver = StubEMI
    sapi.KNPSolver = StubKNPKeepRHS
    try:
        shard_variant("knp rhs only")
    finally:
        sapi.EMISolver, sapi.KNPSolver = real_emi, real_knp


if __name__ == "__main__":
    main()
