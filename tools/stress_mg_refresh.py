#!/usr/bin/env python3
"""AMG staleness under stimulation at flagship scale.

The lagged EMI hierarchy is built from the t=0 operator; sustained
stimulation drives a local [K]e excursion (reference flagship: 3.1 ->
9.3 mM inside the source box) which moves kappa = (F^2/RT) sum z^2 D c
by tens of percent exactly where the source sits.  This script measures
what that does to the preconditioner at the gate-relevant size, and
whether ``mg_refresh_every`` recovers the counts:

  run A (stale):   mg_refresh_every = 0  — t=0 hierarchy throughout
  run B (refresh): mg_refresh_every = E  — recompile-free value refresh

Both runs share ONE compiled chunk (DeviceMG is a jit argument), start
from the same initial state, and print per-chunk EMI iteration counts
next to the ECS [K] excursion.  Reference analog: hypre BoomerAMG is
re-setup on every reassembly (src/knpemi/pdeSolver.py:32) — the
reference pays a full AMG setup per step; we pay a value refresh every
E steps and this script shows that is enough.

Usage (TPU, ~minutes):
  python tools/stress_mg_refresh.py --mesh-n 64 --steps 120 \
      --refresh-every 40 --f-scale 4
"""

from __future__ import annotations

import argparse
import dataclasses
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
    # e.g. KNPEMI_PLATFORM=cpu for a smoke run while the TPU is busy
    # (the env var alone is ignored once the axon plugin registers)
    import jax

    jax.config.update("jax_platforms", os.environ["KNPEMI_PLATFORM"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-n", type=int, default=64,
                    help="cells per axis of the tissue mesh (64 -> 840k dofs)")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--refresh-every", type=int, default=40)
    ap.add_argument("--f-scale", type=float, default=4.0,
                    help="multiplier on the baseline source strength, to "
                         "reach the full reference excursion in --steps")
    ap.add_argument("--duty", type=float, default=None,
                    help="override the source duty cycle (1.0 = always on; "
                         "the baseline's 1ms/10ms pulsing lets [K]e decay "
                         "back between pulses, which defeats a SHORT stress "
                         "run — the reference reaches 9.3 mM only after "
                         "300 ms of pulsing)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from run_stim_duration import build_simulation
    from knpemi_tpu.sim.config import load_config, DEFAULTS

    cfg = dict(DEFAULTS)
    cfg.update(load_config(
        Path(__file__).resolve().parents[1]
        / "examples/astrocyte/config_files/baseline.yml"))
    cfg["mesh_n"] = args.mesh_n
    cfg["f_value"] = float(cfg["f_value"]) * args.f_scale
    if args.duty is not None:
        cfg["pulse_width"] = float(cfg["period"]) * args.duty
        cfg["delay"] = 0.0
    cfg["solver"] = {"mg_refresh_every": 0}

    t0 = time.perf_counter()
    sim = build_simulation(cfg)
    n_dofs = sim.geom.emi_size
    print(f"# built: {n_dofs} EMI dofs, setup {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    kmax_trace: list[float] = []

    def observer(host_state):
        kmax_trace.append(float(np.max(host_state.c[0][0])))

    def one_run(refresh_every: int):
        kmax_trace.clear()
        sim.opts = dataclasses.replace(
            sim.opts, mg_refresh_every=refresh_every)
        state = sim.init_state()
        t1 = time.perf_counter()
        state, it_e, _ = sim.run(state, args.steps,
                                 save_every=args.chunk, observer=observer,
                                 verbose=args.verbose)
        wall = time.perf_counter() - t1
        return np.asarray(it_e), list(kmax_trace), wall

    it_stale, kmax, wall_a = one_run(0)
    it_fresh, kmax_b, wall_b = one_run(args.refresh_every)

    nchunks = len(it_stale) // args.chunk
    print(f"{'steps':>12} {'K_e max':>8} {'stale it':>9} {'fresh it':>9}")
    for i in range(nchunks):
        s = slice(i * args.chunk, (i + 1) * args.chunk)
        print(f"{i*args.chunk+1:>5}..{(i+1)*args.chunk:<5} "
              f"{kmax[i] if i < len(kmax) else float('nan'):>8.2f} "
              f"{it_stale[s].mean():>9.1f} {it_fresh[s].mean():>9.1f}")

    tail = slice(-3 * args.chunk, None)  # last 3 chunks: excursion peak
    out = {
        "metric": "mg_refresh_stress",
        "dofs": int(n_dofs),
        "steps": args.steps,
        "f_value": cfg["f_value"],
        "k_e_max_final": round(kmax[-1], 3) if kmax else None,
        "stale_it_first10": round(float(it_stale[:10].mean()), 2),
        "stale_it_tail": round(float(it_stale[tail].mean()), 2),
        "fresh_it_tail": round(float(it_fresh[tail].mean()), 2),
        "refresh_every": args.refresh_every,
        "wall_s": [round(wall_a, 1), round(wall_b, 1)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
