#!/usr/bin/env python3
"""Field-level equivalence check for tuned KNP solver options.

The reference forces ``ksp_min_it: 5`` on the KNP GMRES
(pdeSolver.py:101) — a guard against trusting the preconditioned
recurrence residual too early.  On the f32 TPU path the guard is dead
weight: the TRUE relative residual saturates at its attainable floor
(~2.6e-6 at the 840k-dof flagship) by iteration 2, while each forced
iteration costs ~52 ms (tools/profile_knp.py --bisect-tag0).  But the
single-solve evidence does not by itself certify a whole simulation —
the operator and RHS drift with the fields, and the in-cycle
convergence test IS the recurrence residual (solvers/gmres.py).

This tool runs the flagship scenario twice from the same initial state
— reference-parity options vs tuned (min_iter_knp=2, restart=8) — and
reports the worst relative field differences over the run, plus both
iteration traces.  The acceptance criterion is enforced: the tool
exits nonzero unless the fields agree to ``--tol`` (default 1e-5, the
f32 attainable level); the tuned run's min_iter clip fraction is
reported so a full-clip + large-diff combination (solves cut off while
still descending) is visible.  MG refresh is pinned off so both runs
see identical preconditioner state, and each variant is compiled in a
warm-up chunk before its timed window.

Usage (TPU, ~10 min at mesh_n 64):
  python tools/compare_solver_opts.py --mesh-n 64 --steps 100
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "astrocyte")
)

import os

if os.environ.get("KNPEMI_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["KNPEMI_PLATFORM"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--min-iter", type=int, default=2,
                    help="tuned min_iter_knp value under test")
    ap.add_argument("--restart", type=int, default=8,
                    help="tuned GMRES restart under test (arithmetic-"
                         "neutral unless a solve exceeds it)")
    ap.add_argument("--tol", type=float, default=1e-5,
                    help="acceptance gate: exit nonzero if the worst "
                         "relative field difference exceeds this")
    ap.add_argument("--rtol-knp", type=float, default=None,
                    help="tuned KNP GMRES rtol (default: keep the "
                         "reference-parity 1e-7; the f32 attainable "
                         "floor is ~2.6e-6, so a looser in-cycle rtol "
                         "can cut dead iterations if the fields agree)")
    ap.add_argument("--rtol-emi", type=float, default=None,
                    help="tuned EMI CG rtol (default: keep the "
                         "reference-parity 1e-6; profile_emi shows the "
                         "true residual floors at ~3e-3 equilibrated "
                         "regardless, so trailing iterations can be "
                         "dead weight)")
    ap.add_argument("--knp-post-smooth", choices=["on", "off"],
                    default="on",
                    help="tuned KNP V-cycle post-smoothing: 'off' = the "
                         "asymmetric V(1,0) cycle (legal under flexible "
                         "GMRES; drops the V-cycle's largest single op)")
    args = ap.parse_args()

    from run_stim_duration import build_simulation
    from knpemi_tpu.sim.config import load_config, DEFAULTS

    cfg = dict(DEFAULTS)
    cfg.update(load_config(
        Path(__file__).resolve().parents[1]
        / "examples/astrocyte/config_files/baseline.yml"))
    cfg["mesh_n"] = args.mesh_n
    # Both runs share one Simulation: an async MG refresh fired mid-run
    # (driver default mg_refresh_every=100) would leak refreshed
    # hierarchies from the parity run into the tuned run and confound
    # the comparison — pin it off for this tool.
    cfg["solver"] = {**(cfg.get("solver") or {}), "mg_refresh_every": 0}

    t0 = time.perf_counter()
    sim = build_simulation(cfg)
    print(f"# built: {sim.geom.emi_size} EMI dofs, "
          f"setup {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    # the PARITY leg restores whatever the Simulation was BUILT with
    # (if the config ever sets non-default rtols, hardcoded 1e-7/1e-6
    # would silently diverge from the configured baseline)
    rtol_knp0 = float(sim.knp_solver.rtol)
    rtol_emi0 = float(sim.emi_solver.rtol)

    def one_run(min_iter: int, restart: int, rtol=None, post_smooth=True,
                rtol_emi=None):
        sim.knp_solver.min_iter = min_iter
        sim.knp_solver.restart = restart
        sim.knp_solver.rtol = rtol if rtol is not None else rtol_knp0
        sim.emi_solver.rtol = rtol_emi if rtol_emi is not None else rtol_emi0
        for mg_t in (sim.knp_solver.mg or {}).values():
            # static pytree aux: flipping retraces the chunk (caches are
            # cleared below anyway)
            mg_t.post_smooth = post_smooth
        # min_iter/restart are read at trace time: force a retrace
        sim._chunk_jit = {}
        sim._step_jit = None
        # warm-up: compile this variant's chunk outside the timed
        # window (restart=8 vs 30 compile different Krylov buffer
        # shapes, so compile cost is not equal across variants)
        sim.run(sim.init_state(), args.chunk, save_every=args.chunk)
        state = sim.init_state()
        t1 = time.perf_counter()
        state, it_e, it_k = sim.run(state, args.steps,
                                    save_every=args.chunk)
        wall = time.perf_counter() - t1
        return state, np.asarray(it_e), np.asarray(it_k), wall

    ref, ite_a, itk_a, wall_a = one_run(5, 30)
    tun, ite_b, itk_b, wall_b = one_run(
        args.min_iter, args.restart, rtol=args.rtol_knp,
        post_smooth=args.knp_post_smooth == "on",
        rtol_emi=args.rtol_emi,
    )

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        den = np.max(np.abs(a))
        return float(np.max(np.abs(a - b)) / den) if den else 0.0

    diffs = {}
    for t in ref.c:
        diffs[f"c[{t}]"] = rel(ref.c[t], tun.c[t])
    for t in ref.phi:
        diffs[f"phi[{t}]"] = rel(ref.phi[t], tun.phi[t])
    for m in ref.phi_M:
        diffs[f"phi_M[{m}]"] = rel(ref.phi_M[m], tun.phi_M[m])

    print(f"{'field':>12} {'max rel diff':>14}")
    for k, v in diffs.items():
        print(f"{k:>12} {v:>14.3e}")
    print(f"\nKNP iters  parity: {itk_a.mean():.2f} mean "
          f"(min {itk_a.min()}, max {itk_a.max()})")
    print(f"KNP iters  tuned : {itk_b.mean():.2f} mean "
          f"(min {itk_b.min()}, max {itk_b.max()})")
    print(f"EMI iters  parity/tuned: {ite_a.mean():.2f} / {ite_b.mean():.2f}")
    print(f"wall: parity {wall_a:.1f}s  tuned {wall_b:.1f}s "
          f"({wall_a / args.steps * 1e3:.1f} -> "
          f"{wall_b / args.steps * 1e3:.1f} ms/step)")

    # fraction of tuned solves stopped exactly at min_iter (informative:
    # the clip is the tuned mode's point, but a 100% clip with a large
    # field diff suggests solves cut off while still descending)
    clip_frac = float(np.mean(itk_b <= args.min_iter))
    max_diff = max(diffs.values())
    passed = max_diff <= args.tol
    out = {
        "steps": args.steps,
        "mesh_n": args.mesh_n,
        "max_rel_diff": max_diff,
        "tol": args.tol,
        "passed": passed,
        "tuned_min_iter_clip_frac": clip_frac,
        "diffs": diffs,
        "knp_iters_parity": float(itk_a.mean()),
        "knp_iters_tuned": float(itk_b.mean()),
        "ms_per_step_parity": wall_a / args.steps * 1e3,
        "ms_per_step_tuned": wall_b / args.steps * 1e3,
    }
    print(json.dumps(out))
    if not passed:
        print(f"# FAIL: max_rel_diff {max_diff:.3e} > tol {args.tol:.0e}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
