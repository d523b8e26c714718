#!/usr/bin/env python3
"""f32 attainable-accuracy curve on the flagship scenario.

The TPU production path runs f32 with equilibrated operators and
compensated (double-single) Krylov dots; the reference runs f64 PETSc.
BASELINE.md's 1e-6 field-parity gate cannot be checked against FEniCSx
in this environment, so this is the closest achievable substitute: the
SAME discretization and solvers, f32(TPU) vs f64(CPU), divergence
measured over simulated time on the astrocyte flagship scenario
(reference examples/local_astrocyte_depolarization/run_stim_duration.py).

  python tools/accuracy_flagship.py --tstop 300        # both runs + table
  python tools/accuracy_flagship.py run --dtype f64 --out X.npz ...

Subprocesses are used because the f64 leg must force the CPU platform
and global x64 BEFORE jax/knpemi_tpu import (under the axon TPU plugin
the JAX_PLATFORMS env var alone is ignored, and x64 breaks Mosaic
Pallas lowering on TPU).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _run_leg(dtype: str, tstop: float, out: Path, res_n: int | None):
    """Run one leg (this process — called as a subprocess)."""
    import jax

    if dtype == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, str(REPO / "examples" / "astrocyte"))
    from run_stim_duration import build_simulation
    from knpemi_tpu.sim.config import load_config, DEFAULTS

    import jax.numpy as jnp

    cfg = dict(DEFAULTS)
    cfg.update(load_config(
        REPO / "examples/astrocyte/config_files/baseline.yml"))
    cfg["Tstop"] = tstop
    if res_n:
        cfg["mesh_n"] = res_n
    sim = build_simulation(
        cfg, dtype=jnp.float64 if dtype == "f64" else jnp.float32)
    n_steps = int(round(tstop / sim.params.dt))
    save_every = int(cfg.get("save_frequency", 5))

    traces = {"t": [], "phi_M_neuron": [], "phi_M_glial": [],
              "K_e_max": [], "phi_e_norm": []}
    it_prev = (np.zeros(0, int), np.zeros(0, int))

    # crash-resumable legs (the round-4 100-step TPU campaign died twice
    # to worker crashes): checkpoint every 100 steps (10 ms) and pick up
    # from <out>.ckpt.npz automatically on rerun
    from knpemi_tpu.io import save_checkpoint, load_checkpoint

    ckpt = out.with_name(out.name + ".ckpt.npz")
    if ckpt.exists():
        state, meta = load_checkpoint(ckpt)
        for k in traces:
            traces[k] = [float(v) for v in np.atleast_1d(meta[f"trace_{k}"])]
        it_prev = (np.atleast_1d(meta["it_emi"]).astype(int),
                   np.atleast_1d(meta["it_knp"]).astype(int))
        if getattr(sim.opts, "mg_refresh_every", 0) and not sim.opts.direct:
            sim.refresh_mg(state)
        print(f"# {dtype}: resumed at step {int(state.step)}",
              file=sys.stderr)
    else:
        state = sim.init_state()

    def observer(s):
        traces["t"].append(float(s.t))
        traces["phi_M_neuron"].append(float(np.mean(s.phi_M[1])))
        traces["phi_M_glial"].append(float(np.mean(s.phi_M[2])))
        traces["K_e_max"].append(float(np.max(s.c[0][0])))
        traces["phi_e_norm"].append(float(np.linalg.norm(s.phi[0])))

    def write_ckpt(host_state, it_e=None, it_k=None):
        tmp = ckpt.with_name(ckpt.name + ".tmp.npz")
        save_checkpoint(
            tmp, host_state,
            it_emi=np.concatenate([it_prev[0]] + ([it_e] if it_e is not None else [])),
            it_knp=np.concatenate([it_prev[1]] + ([it_k] if it_k is not None else [])),
            **{f"trace_{k}": np.asarray(v) for k, v in traces.items()},
        )
        os.replace(tmp, ckpt)

    n_rem = n_steps - int(state.step)
    t0 = time.perf_counter()
    if n_rem > 0:
        state, it_e, it_k = sim.run(state, n_rem,
                                    save_every=save_every, observer=observer,
                                    checkpoint_every=100,
                                    checkpoint_cb=write_ckpt)
    else:
        it_e = it_k = np.zeros(0, int)
    wall = time.perf_counter() - t0
    it_e = np.concatenate([it_prev[0], np.asarray(it_e, int)])
    it_k = np.concatenate([it_prev[1], np.asarray(it_k, int)])
    import jax as _jax

    final = _jax.device_get(
        {"phi_M_1": state.phi_M[1], "phi_M_2": state.phi_M[2],
         "phi_0": state.phi[0], "c_K_0": state.c[0][0],
         "c_Na_0": state.c[0][2], "c_K_1": state.c[1][0]})
    np.savez(out, wall=wall, it_emi=it_e, it_knp=it_k,
             **{k: np.asarray(v) for k, v in traces.items()},
             **{f"final_{k}": v for k, v in final.items()})
    print(f"# {dtype}: {n_steps} steps, {wall:.0f}s "
          f"({wall / n_steps * 1e3:.1f} ms/step), "
          f"avg emi_it {it_e.mean():.1f}", file=sys.stderr)


def _compare(a: Path, b: Path):
    """a = f32 leg, b = f64 reference leg."""
    A, B = np.load(a), np.load(b)
    n = min(len(A["t"]), len(B["t"]))
    rows = []
    for i in range(n):
        rows.append((
            float(A["t"][i]),
            abs(A["phi_M_neuron"][i] - B["phi_M_neuron"][i]),
            abs(A["phi_M_glial"][i] - B["phi_M_glial"][i]),
            abs(A["K_e_max"][i] - B["K_e_max"][i])
            / max(abs(B["K_e_max"][i]), 1e-30),
        ))
    print(f"{'t (ms)':>8} {'|dphi_M n| mV':>14} {'|dphi_M g| mV':>14} "
          f"{'rel dK_e':>10}")
    # print ~12 evenly spaced rows of the curve
    for i in range(0, n, max(1, n // 12)):
        t, dn, dg, dk = rows[i]
        print(f"{t:>8.1f} {dn:>14.3e} {dg:>14.3e} {dk:>10.2e}")
    fin = {}
    for k in ("phi_M_1", "phi_M_2", "phi_0", "c_K_0", "c_Na_0", "c_K_1"):
        x, y = A[f"final_{k}"], B[f"final_{k}"]
        fin[k] = float(np.linalg.norm(x - y) / max(np.linalg.norm(y), 1e-30))
    out = {
        "metric": "f32_vs_f64_flagship",
        "t_final_ms": float(A["t"][n - 1]),
        "max_dphi_M_neuron_mV": float(max(r[1] for r in rows)),
        "max_dphi_M_glial_mV": float(max(r[2] for r in rows)),
        "max_rel_dK_e": float(max(r[3] for r in rows)),
        "final_rel_l2": fin,
        "avg_emi_iters": [float(A["it_emi"].mean()),
                          float(B["it_emi"].mean())],
    }
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    r = sub.add_parser("run")
    r.add_argument("--dtype", choices=["f32", "f64"], required=True)
    r.add_argument("--tstop", type=float, default=300.0)
    r.add_argument("--out", required=True)
    r.add_argument("--mesh-n", type=int, default=None)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    ap.add_argument("--tstop", type=float, default=300.0)
    ap.add_argument("--mesh-n", type=int, default=None)
    ap.add_argument("--outdir", default=str(REPO / "results" / "accuracy"))
    args = ap.parse_args()

    if args.cmd == "run":
        _run_leg(args.dtype, args.tstop, Path(args.out), args.mesh_n)
        return
    if args.cmd == "compare":
        _compare(Path(args.a), Path(args.b))
        return

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    legs = {}
    for dtype in ("f32", "f64"):
        legs[dtype] = outdir / f"flagship_{dtype}.npz"
        cmd = [sys.executable, __file__, "run", "--dtype", dtype,
               "--tstop", str(args.tstop), "--out", str(legs[dtype])]
        if args.mesh_n:
            cmd += ["--mesh-n", str(args.mesh_n)]
        env = dict(os.environ)
        if dtype == "f64":
            env["KNPEMI_X64"] = "1"
        print(f"# running {dtype} leg...", file=sys.stderr)
        subprocess.run(cmd, check=True, env=env, cwd=REPO)
    _compare(legs["f32"], legs["f64"])


if __name__ == "__main__":
    main()
