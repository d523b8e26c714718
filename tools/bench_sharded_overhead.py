#!/usr/bin/env python3
"""Measure the sharded-mode overhead on the real TPU (1-device shard_map).

VERDICT round-2 item 3 asks for "a measured sharded-vs-single-chip
overhead number on the real TPU (1-device shard_map)": the dof-sharded
SPMD step (parallel/sharded.py — halo ppermutes, psum dots, distributed
V-cycle) run over a 1-device mesh against the plain single-device
`Simulation` step on the same chip.  With one device the collectives
are self-permutes, so the delta isolates the sharded mode's extra work
(halo windows, padded blockings, layout scatter/gathers) from real
communication.

    python tools/bench_sharded_overhead.py [--res 1] [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "idealized"))


def _time(fn, state, n):
    state = fn(state)  # compile/warm-up
    state.t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    state.t.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    from run_3d import build_simulation
    from knpemi_tpu.parallel.sharded import ShardedSimulation

    sim = build_simulation(resolution=args.res, g_syn_bar=10.0)
    dofs = sim.geom.emi_size + sum(
        sim.knp_sys.n_solved * s.n_dofs for s in sim.geom.subdomains.values()
    )

    chunk = sim._chunk(1)
    ms_single, _ = _time(lambda s: chunk(s)[0], sim.init_state(), args.steps)

    sh = ShardedSimulation(sim, devices=jax.devices()[:1])
    shc = sh._chunk(1)
    ms_shard, st = _time(lambda s: shc(s)[0], sh.init_state(), args.steps)

    print(
        f"device={jax.devices()[0].platform} res={args.res} dofs/step={dofs}\n"
        f"single-device step : {ms_single:8.1f} ms\n"
        f"1-dev shard_map step: {ms_shard:8.1f} ms "
        f"(overhead {ms_shard / ms_single:.2f}x, emi_iters={int(st.emi_iters)})"
    )


if __name__ == "__main__":
    main()
