#!/usr/bin/env python3
"""Per-component timing of the (EMI) V-cycle at a given resolution.

Times, loop-amortized on the current backend: each level's lagged
operator apply (banded or ELL), the P/Pt transfers, the coarse dense
solve, and the whole `DeviceMG.apply` — to locate where the V-cycle's
cost sits relative to its HBM floor.  Usage:

    python tools/profile_vcycle.py [--case 3d] [--res 2] [--system emi]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(
    0, str(Path(__file__).resolve().parent.parent / "examples" / "idealized")
)


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
    return (time.perf_counter() - t0) / (reps * K) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="3d")
    ap.add_argument("--res", type=int, default=2)
    ap.add_argument("--system", default="emi")
    ap.add_argument("--bw", type=float, default=None,
                    help="HBM bandwidth GB/s for the roofline (default: "
                         "819 for TPU v5e, 60 for CPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.case == "2d":
        from run_2d import build_simulation

        sim = build_simulation(resolution=args.res)
    elif args.case == "flagship":
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
        cfg["mesh_n"] = 64
        sim = build_astro(cfg)
    else:
        from run_3d import build_simulation

        sim = build_simulation(resolution=args.res, g_syn_bar=10.0)

    if args.system == "emi":
        mg = sim.emi_solver.mg
        n = sim.geom.emi_size
    else:
        mg = sim.knp_solver.mg.get(0)
        n = sim.geom.subdomains[0].n_dofs

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal(n), sim.dtype)

    # fine exact operator (matvec ctx with current kappa)
    es = sim.emi_sys
    state = sim.init_state()
    kappa = jax.jit(es.kappa)(state.c)
    ctx = jax.jit(es.prepare)(kappa)
    d = mg.fine_diag
    s = 1.0 / jnp.sqrt(jnp.abs(d))
    A0 = lambda v: s * es.matvec(s * v, ctx)

    print(f"n={n}  levels={len(mg.levels)}  coarse={mg.coarse_V.shape}",
          flush=True)
    # NOTE the hierarchy is passed as a jit ARGUMENT (DeviceMG is a
    # registered pytree whose scaffolding stays static): closing over
    # the fine banded slab would ship ~4 GB of HLO constants through
    # the remote-compile tunnel.
    print(f"perm={'yes' if mg.perm is not None else 'no'}  "
          f"fine-solver-layout="
          f"{'yes' if mg.levels and mg.levels[0].get('dinv_solver') is not None else 'no'}  "
          f"nu={mg.nu}")
    for i, lv in enumerate(mg.levels):
        print(f"  level {i}: steps={len(lv['steps'])} "
              f"ap={'band' if lv.get('ap_band') is not None else ('ellw' if lv.get('ap_ellw') is not None else 'none')} "
              f"fused_post={mg._fused_post(i, lv, len(lv['steps']))}")

    # ---- HBM roofline model (VERDICT r4 item 2): every apply is a
    # streaming op, so its floor is bytes-touched / HBM bandwidth.
    # Bytes are taken from the ACTUAL device arrays (so bf16 slabs,
    # window widths, far caps are all reflected), plus the in/out
    # vectors.  Measured/floor >> 1 = scheduling or layout waste, not
    # physics.
    bw = args.bw or (819.0 if jax.devices()[0].platform in ("tpu", "axon")
                     else 60.0)
    dsz = jnp.dtype(sim.dtype).itemsize

    def mat_bytes(lv, which):
        """device bytes of the operator arrays read by one apply."""
        b = 0
        band = lv.get(f"{which}_band")
        if band is not None:
            for w in band["windows"]:
                b += w["slabT"].nbytes + w["w0"].nbytes
            far = band.get("far_vals")
            if far is not None and far.size:
                b += 3 * far.nbytes
        ellw = lv.get(f"{which}_ellw")
        if ellw is not None:
            # shape-derived (ELLW.nbytes would np.asarray = download
            # the slabs over the tunnel)
            b += sum(
                int(np.prod(a.shape)) * a.dtype.itemsize
                for a in (getattr(ellw, f) for f in type(ellw)._ARRAYS)
            )
        if band is None and ellw is None and lv.get(f"{which}_vals") is not None:
            b += lv[f"{which}_vals"].nbytes + lv[f"{which}_cols"].nbytes
        return b

    def floor_ms(nbytes):
        return nbytes / (bw * 1e9) * 1e3

    print(f"roofline bandwidth: {bw:.0f} GB/s "
          f"(--bw to override); floors = array-bytes/BW", flush=True)

    x = r0
    cycle_floor = 0.0
    for i, lv in enumerate(mg.levels):
        if lv.get("a_band") is not None:
            kind = "band"
        elif lv.get("a_ellw") is not None:
            kind = "ellw"
        elif i == 0 and lv.get("a_cols") is None:
            kind = "EXACT-A0"
        else:
            kind = "ell"
        n_i = len(x)
        t_op = loop_timeit(
            lambda v, m, i=i: m._op(i, A0)(v), x, mg, K=20
        )
        extra = ""
        if kind == "ell":
            extra = f" Kell={lv['a_vals'].shape[1]}"
        elif kind == "ellw":
            e = lv["a_ellw"]
            extra = (f" K={e.K} Wr={e.Wr} NCH={e.NCH} C={e.C}"
                     f" far={e.far_cap}")
        elif kind == "band":
            b = lv["a_band"]
            ws = [(w["slabT"].shape, str(w["slabT"].dtype))
                  for w in b["windows"]]
            nnz_far = len(b.get("far_vals", []))
            extra = f" slabs={ws} far={nnz_far}"
        fl_a = floor_ms(mat_bytes(lv, "a") + 2 * n_i * dsz)
        print(f"level {i}: n={n_i:8d} A({kind}) : {t_op:8.3f} ms"
              f"  [floor {fl_a:6.3f} ms, {t_op / max(fl_a, 1e-9):5.1f}x]"
              f"{extra}",
              flush=True)
        # transfers (shape-changing: time with fixed input, dispatch incl.)
        rc = mg._transfer(lv, "pt", x)

        def tm(fn, v, K=20, reps=3):
            j = jax.jit(fn)
            out = j(v, mg)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps * K):
                out = j(v, mg)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / (reps * K) * 1e3

        t_pt = tm(lambda v, m, i=i: m._transfer(m.levels[i], "pt", v), x)
        t_p = tm(lambda v, m, i=i: m._transfer(m.levels[i], "p", v), rc)
        pk = "band" if lv.get("pt_band") is not None else "ell"
        vec_b = (len(x) + len(rc)) * dsz
        fl_pt = floor_ms(mat_bytes(lv, "pt") + vec_b)
        fl_p = floor_ms(mat_bytes(lv, "p") + vec_b)
        print(f"         pt({pk}): {t_pt:8.3f} ms (dispatch incl.) "
              f"[floor {fl_pt:6.3f}]   "
              f"p({pk}): {t_p:8.3f} ms [floor {fl_p:6.3f}]", flush=True)
        # structural V-cycle floor contribution of this level: nu
        # pre-smooth A applies + 1 residual apply + nu post-smooth
        # applies (AP bytes when the fused-AP post is installed) + both
        # transfers + 3 n-vector dinv/axpy sweeps
        ap_b = mat_bytes(lv, "ap") or mat_bytes(lv, "a")
        cycle_floor += floor_ms(
            mg.nu * (mat_bytes(lv, "a") + 2 * n_i * dsz)
            + (mat_bytes(lv, "a") + 2 * n_i * dsz)
            + mg.nu * (ap_b + 2 * n_i * dsz)
            + mat_bytes(lv, "pt") + mat_bytes(lv, "p") + 2 * vec_b
            + 3 * n_i * dsz
        )
        x = rc
    t_coarse = loop_timeit(
        lambda v, V, il: V @ (il * (V.T @ v)), x, mg.coarse_V,
        mg.coarse_ilam, K=20,
    )
    fl_c = floor_ms(2 * mg.coarse_V.nbytes + 2 * len(x) * dsz)
    cycle_floor += fl_c
    print(f"coarse dense     : {t_coarse:8.3f} ms  (n={len(x)}) "
          f"[floor {fl_c:6.3f}]", flush=True)

    # ---- attribution: sub-cycle costs + perm gathers (single + B=2) ----
    if mg.perm is not None:
        t_g = loop_timeit(lambda v, m: v[m.perm], r0, mg, K=50)
        R2 = jnp.stack([r0, r0 * 0.5])
        t_gb = loop_timeit(lambda V, m: V[:, m.perm], R2, mg, K=50)
        print(f"perm gather      : {t_g:8.3f} ms single, {t_gb:8.3f} ms B=2",
              flush=True)
    A0c = A0 if mg.perm is None else (
        lambda v: A0(v[mg.iperm])[mg.perm]
    )
    rc_i = r0 if mg.perm is None else r0[mg.perm]
    for i in range(len(mg.levels)):
        t_sub = loop_timeit(
            lambda v, m, i=i: m._cycle(i, A0c, v), rc_i, mg, K=10
        )
        R2i = jnp.stack([rc_i, rc_i * 0.5])
        t_subb = loop_timeit(
            lambda V, m, i=i: m._cycle_batch(
                i, lambda X: jnp.stack([A0c(X[0]), A0c(X[1])]), V
            ),
            R2i, mg, K=10,
        )
        print(f"cycle from level {i} (n={len(rc_i)}): {t_sub:8.3f} ms single, "
              f"{t_subb:8.3f} ms B=2", flush=True)
        rc_i = mg._transfer(mg.levels[i], "pt", rc_i)
    t_all = loop_timeit(lambda v, m: m.apply(A0, v), r0, mg, K=10)
    print(f"FULL V-cycle     : {t_all:8.3f} ms/op   "
          f"[structural HBM floor {cycle_floor:6.3f} ms, "
          f"{t_all / max(cycle_floor, 1e-9):4.1f}x off roofline]", flush=True)
    t_b = loop_timeit(
        lambda V, m: m.apply_batch(lambda Y: Y, V),
        jnp.stack([r0, r0 * 0.5]), mg, K=10,
    )
    print(f"BATCH-2 V-cycle  : {t_b:8.3f} ms/op", flush=True)
    if args.system == "emi":  # A0 is the EMI operator; size-mismatched
        t_a0 = loop_timeit(A0, r0, K=20)  # against the KNP tag-0 vector
        print(f"exact fine A0    : {t_a0:8.3f} ms/op", flush=True)


if __name__ == "__main__":
    main()
