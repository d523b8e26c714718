#!/usr/bin/env python3
"""Loop-amortized per-APPLICATION costs of the sharded EMI matvec and
the distributed V-cycle vs their single-device counterparts, on a
1-device mesh — the denominator of tools/bench_sharded_overhead.py's
17.6x/83x, pinned to individual operator applications instead of
stage subtraction (tools/profile_sharded.py).

    python tools/profile_smg.py [--res 1] [--k 30] [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "idealized"))


def timed(label, fn, *args, reps=3):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best * 1e3:9.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from run_3d import build_simulation
    from knpemi_tpu.parallel.sharded import (
        ShardedSimulation, ShardedEMI, AXIS, pdot,
    )
    from knpemi_tpu.parallel.sharded_mg import ShardedMG, squeeze_smg, smg_specs

    K = args.k
    sim = build_simulation(resolution=args.res, g_syn_bar=10.0)
    s0s = sim.init_state()

    # ---- single-device per-application baselines -----------------------
    # lane arrays and hierarchies travel as jit ARGUMENTS (closure
    # constants exceed the remote-compile payload bound, HTTP 413 —
    # same pattern as Simulation._chunk)
    n1 = sim.geom.emi_size
    x1 = jnp.ones((n1,), sim.dtype)
    payload1 = (sim.emi_sys.blocked, sim.emi_sys.mem_blocked)

    @jax.jit
    def single_mv(x, c, payload):
        old = (sim.emi_sys.blocked, sim.emi_sys.mem_blocked)
        sim.emi_sys.blocked, sim.emi_sys.mem_blocked = payload
        try:
            ctx = sim.emi_sys.prepare(sim.emi_sys.kappa(c))

            def body(i, x):
                y = sim.emi_sys.matvec(x, ctx)
                return y / (jnp.sqrt(jnp.vdot(y, y)) + 1.0)

            return jax.lax.fori_loop(0, K, body, x)
        finally:
            sim.emi_sys.blocked, sim.emi_sys.mem_blocked = old

    t = timed(f"single matvec x{K}", single_mv, x1, s0s.c, payload1)
    print(f"  -> {t / K * 1e3:9.3f} ms/apply")

    mg1 = sim.emi_solver.mg
    if mg1 is not None:

        @jax.jit
        def single_mg(x, mg):
            def body(i, x):
                y = mg.apply(lambda v: v, x)
                return y / (jnp.sqrt(jnp.vdot(y, y)) + 1.0)

            return jax.lax.fori_loop(0, K, body, x)

        t = timed(f"single V-cycle x{K}", single_mg, x1, mg1)
        print(f"  -> {t / K * 1e3:9.3f} ms/apply")

    # ---- sharded (1-device mesh) per-application ------------------------
    sh = ShardedSimulation(sim, devices=jax.devices()[:1])
    s0 = sh.init_state()
    nloc = sum(p.B for p in sh.parts.values())
    x = jnp.ones((nloc,), sim.dtype)

    local_specs = jax.tree.map(
        lambda a: P(AXIS, *([None] * (a.ndim - 1))), sh.local_arrays
    )
    mem_specs = jax.tree.map(lambda a: P(), sh.mem_arrays)
    c_spec = {t: P(None, AXIS) for t in s0.c}

    def make_esys(la, ma):
        local_sq = jax.tree.map(lambda a: a[0], la)
        blk = None
        if sh.blk_static is not None:
            from knpemi_tpu.parallel.sharded import local_blocking

            blk = {
                t: local_blocking(
                    dict(
                        lidx=local_sq[t]["blk_lidx"],
                        grads=local_sq[t]["blk_grads"],
                        vols=local_sq[t]["blk_vols"],
                        cells_chunk=local_sq[t]["blk_cells"],
                    ),
                    sh.blk_static[t],
                )
                for t in sh.tags
            }
        return ShardedEMI(
            sim.emi_sys, sh.parts, local_sq, sh._mem_with_static(ma),
            sh.n_dev, blk=blk, interpret=sh._spmd_interpret,
        )

    def mv_body(c, la, ma, x):
        esys = make_esys(la, ma)
        ctx = esys.prepare(esys.kappa(c))

        def body(i, x):
            y = esys.matvec(x, ctx)
            return y / (jnp.sqrt(pdot(y, y)) + 1.0)

        return jax.lax.fori_loop(0, K, body, x)

    sh_mv = jax.jit(
        shard_map(
            mv_body, mesh=sh.mesh,
            in_specs=(c_spec, local_specs, mem_specs, P(AXIS)),
            out_specs=P(AXIS), check_vma=False,
        )
    )
    t = timed(f"sharded matvec x{K}", sh_mv, s0.c, sh.local_arrays,
              sh.mem_arrays, x)
    print(f"  -> {t / K * 1e3:9.3f} ms/apply")

    if sh.emi_smg is not None:
        smg_spec = smg_specs(sh.emi_smg)

        def smg_body(smg_data, x):
            smg = ShardedMG(
                squeeze_smg(smg_data), sh.emi_smg_meta, sh.n_dev,
                solver_len=sh._emi_L, use_pallas=sh._smg_pallas,
            )

            def body(i, x):
                y = smg.apply(None, x)
                return y / (jnp.sqrt(pdot(y, y)) + 1.0)

            return jax.lax.fori_loop(0, K, body, x)

        sh_mg = jax.jit(
            shard_map(
                smg_body, mesh=sh.mesh,
                in_specs=(smg_spec, P(AXIS)),
                out_specs=P(AXIS), check_vma=False,
            )
        )
        t = timed(f"sharded V-cycle x{K}", sh_mg, sh.emi_smg, x)
        print(f"  -> {t / K * 1e3:9.3f} ms/apply")
    else:
        print("sharded V-cycle: distributed MG unavailable")


if __name__ == "__main__":
    main()
