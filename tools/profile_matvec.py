#!/usr/bin/env python3
"""Deep-dive timing of the EMI/KNP fine matvec alternatives on TPU:
exact pallas one-hot vs lagged banded slabs vs ELL, plus the membrane
coupling term in isolation — the data for choosing the round-2 matvec
strategy.  All per-op numbers are loop-amortized inside one jit."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
)

import numpy as np


def loop_timeit(op, x, *extra, K=50, reps=3):
    import jax
    import jax.numpy as jnp

    def run(x, *extra):
        def body(i, x):
            y = op(x, *extra)
            return y + 0.0 * jnp.asarray(i, y.dtype)

        return jax.lax.fori_loop(0, K, body, x)

    j = jax.jit(run)
    out = j(x, *extra)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = j(x, *extra)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * K) * 1e3


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from run_3d import build_simulation

    sim = build_simulation(resolution=args.res, g_syn_bar=10.0)
    es = sim.emi_sys
    ks = sim.knp_sys

    # blocking stats
    for t, blk in es.blocked.items():
        bk = blk["bk"]
        print(
            f"EMI tag{t}: n={bk.n_dofs} cells~{bk.n_blocks * bk.n_chunks * bk.C}"
            f" S={bk.S} W={bk.W} NB={bk.n_blocks} NCH={bk.n_chunks} C={bk.C}"
            f" rest={len(bk.rest_cells)}"
        )
    for m, sp in es.mem.items():
        print(f"membrane {m}: nf={sp['facet_dofs'].shape[0]}")

    state = sim.init_state()
    kappa = jax.jit(es.kappa)(state.c)
    ctx = jax.jit(es.prepare)(kappa)
    x = jnp.concatenate([state.phi[t] for t in es.tags])

    print(f"EMI exact matvec (pallas+mem): "
          f"{loop_timeit(lambda v: es.matvec(v, ctx), x):7.3f} ms")

    # subdomain stiffness only (no membrane term)
    def stiff_only(v):
        from knpemi_tpu.ops import pallas_assembly as PA

        xs = es.split(v)
        ys = {}
        for t in es.tags:
            blk = es.blocked[t]
            ys[t] = PA.emi_stiffness_blocked(
                xs[t], ctx["wv"][t], blk["bk"], blk["grads"],
                interpret=es.pallas_interpret,
            )
        return es.flatten(ys)

    print(f"  stiffness only   : {loop_timeit(stiff_only, x):7.3f} ms")

    # membrane coupling only (the .at[].add scatters)
    def mem_only(v):
        from knpemi_tpu.ops import kernels as K

        xs = es.split(v)
        ys = {t: jnp.zeros_like(xs[t]) for t in es.tags}
        C_phi = es.params.C_phi
        for m, sp in es.mem.items():
            ct = sp["cell_tag"]
            u_i = xs[ct][sp["facet_idofs"]]
            u_e = xs[0][sp["facet_edofs"]]
            vals = K.facet_mass_values(u_i - u_e, sp["areas"], C_phi)
            ys[ct] = ys[ct].at[sp["facet_idofs"].reshape(-1)].add(vals.reshape(-1))
            ys[0] = ys[0].at[sp["facet_edofs"].reshape(-1)].add(-vals.reshape(-1))
        return es.flatten(ys)

    print(f"  membrane only    : {loop_timeit(mem_only, x):7.3f} ms")

    # lagged banded / ELL fine operator from the MG hierarchy
    mg0 = sim.emi_solver.mg
    lv0 = mg0.levels[0]
    from knpemi_tpu.solvers.mg import _banded_mv, _ell_mv

    def band_split(band):
        """(array pytree, rebuild fn): statics stay closure constants so
        the slabs travel as jit arguments, not HLO constants."""
        arrs = (
            [(w["slabT"], w["w0"], w["w0_rows"]) for w in band["windows"]],
            band["far_rows"], band["far_cols"], band["far_vals"],
        )

        def rebuild(a):
            wins, fr, fc, fv = a
            return {
                **band,
                "windows": [
                    dict(wd, slabT=s, w0=w0, w0_rows=wr)
                    for wd, (s, w0, wr) in zip(band["windows"], wins)
                ],
                "far_rows": fr, "far_cols": fc, "far_vals": fv,
            }

        return arrs, rebuild

    if lv0.get("a_band") is not None:
        arrs, rebuild = band_split(lv0["a_band"])
        print(f"  lagged banded    : "
              f"{loop_timeit(lambda v, a: _banded_mv(rebuild(a), v), x, arrs):7.3f} ms")
        for w in lv0["a_band"]["windows"]:
            NBw = w["slabT"].shape[0] // w["W"]
            print(f"    window W={w['W']} NB={NBw} "
                  f"slab={w['slabT'].nbytes / 1e6:.0f} MB")
        print(f"    far entries: {lv0['a_band']['far_rows'].shape[0]}")
    if lv0.get("a_cols") is not None:
        print(f"  lagged ELL       : "
              f"{loop_timeit(lambda v, c_, v_: _ell_mv(c_, v_, v), x, lv0['a_cols'], lv0['a_vals']):7.3f} ms"
              f"  (K={lv0['a_cols'].shape[1]})")

    # KNP per-tag matvec
    phi = state.phi
    gp = jax.jit(ks.gradphi_cells)(phi)
    for t in ks.tags:
        v = state.c[t][0]
        tm = loop_timeit(
            lambda w, t=t: ks.matvec_one(
                t, w, gp[t], float(sim.ions[0].D[t]), float(sim.ions[0].z)
            ),
            v,
        )
        print(f"KNP matvec tag{t}   : {tm:7.3f} ms  (n={v.shape[0]})")
        mg_t = sim.knp_solver.mg.get(t)
        if mg_t is not None:
            lvk = mg_t.levels[0]
            if lvk.get("a_band") is not None:
                arrs_k, rebuild_k = band_split(lvk["a_band"])
                print(f"  lagged banded    : "
                      f"{loop_timeit(lambda w, a, rb=rebuild_k: _banded_mv(rb(a), w), v, arrs_k):7.3f} ms")


if __name__ == "__main__":
    main()
