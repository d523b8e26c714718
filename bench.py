#!/usr/bin/env python3
"""Benchmark harness: DoF throughput of the coupled KNP-EMI step.

Prints ONE JSON line:
  {"metric": "knpemi_mdof_per_s_per_chip", "value": <MDoF/s>,
   "unit": "MDoF/s", "vs_baseline": <ratio vs host-CPU run>}

Metric definition (BASELINE.md "MDoF/s per chip"): one time step solves
the EMI system (n_emi dofs) and the KNP block system (N_solved ions x
subdomain dofs); throughput = (n_emi + n_knp) * steps / wall_seconds.
The full splitting step is timed — vmapped membrane ODE sweep, both
Krylov solves, and the algebraic refresh — i.e. "assembly + solve per
timestep" (everything is matrix-free, so assembly is inside the solves).

The baseline ratio is measured against the same step executed on the
host CPU backend in this process (the reference stack is CPU
PETSc+MPI; BASELINE.json publishes no absolute numbers, so the
self-measured CPU run is the available stand-in).

Environment knobs:
  KNPEMI_BENCH_CASE  = 3d|2d   (default 3d)
  KNPEMI_BENCH_RES   = int     (default 1 for 3d, 4 for 2d)
  KNPEMI_BENCH_STEPS = int     (default 10 timed steps)
  KNPEMI_BENCH_CPU   = 0|1     (default 1: measure the CPU baseline)
  KNPEMI_BENCH_CPU_STEPS = int (default 5)
"""

import json
import os
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "examples" / "idealized"))


def _with_alarm(seconds, fn):
    """Bound one bench case by a wall-clock alarm: the remote-TPU tunnel
    sporadically hangs on compile/transfer (TODO_NEXT.md environment
    quirks), and the big/flagship cases must not stop the core metric's
    JSON line from printing."""

    def _raise(signum, frame):
        from knpemi_tpu.utils.critical import in_critical_section

        if in_critical_section():
            # mid-persist of a multi-minute artifact (e.g. the MG disk
            # cache): let it finish, re-check shortly
            signal.alarm(30)
            return
        raise TimeoutError(f"case timed out after {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _dofs_per_step(sim):
    n_emi = sim.geom.emi_size
    n_knp = sum(
        sim.knp_sys.n_solved * s.n_dofs for s in sim.geom.subdomains.values()
    )
    return n_emi + n_knp


def _time_steps(sim, n_steps):
    """Compile one single-step chunk, then time it n_steps times (one
    compilation unit; remote-TPU compiles are expensive)."""
    state = sim.init_state()
    chunk = sim._chunk(1)
    state, _ = chunk(state)  # warm-up/compile
    state.t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, (ce, ck, _ok) = chunk(state)
    state.t.block_until_ready()
    wall = time.perf_counter() - t0
    return wall, state, ce, ck


def main():
    case = os.environ.get("KNPEMI_BENCH_CASE", "3d")
    steps = int(os.environ.get("KNPEMI_BENCH_STEPS", "10"))
    cpu_steps = int(os.environ.get("KNPEMI_BENCH_CPU_STEPS", "5"))
    do_cpu = os.environ.get("KNPEMI_BENCH_CPU", "1") == "1"

    if case == "2d":
        from run_2d import build_simulation

        res = int(os.environ.get("KNPEMI_BENCH_RES", "4"))
        make = lambda: build_simulation(resolution=res)
    else:
        from run_3d import build_simulation

        res = int(os.environ.get("KNPEMI_BENCH_RES", "1"))
        make = lambda: build_simulation(resolution=res, g_syn_bar=10.0)

    import jax

    sim = make()
    dofs = _dofs_per_step(sim)
    wall, state, it_e, it_k = _time_steps(sim, steps)
    ms_per_step = wall / steps * 1e3
    mdofs = dofs * steps / wall / 1e6
    print(
        f"# device={jax.devices()[0].platform} case={case} res={res} "
        f"dofs/step={dofs} steps={steps} wall={wall:.2f}s "
        f"({ms_per_step:.1f} ms/step) last_it emi={int(it_e[-1])} "
        f"knp={int(it_k[-1])}",
        file=sys.stderr,
    )

    vs_baseline = 1.0
    if do_cpu:
        cpu = jax.devices("cpu")[0]
        # CPU-appropriate kernel choices: jax.devices()[0] still reports
        # the TPU under default_device(cpu), so the autos must be forced
        os.environ["KNPEMI_PALLAS"] = "0"   # XLA kernels on CPU
        os.environ["KNPEMI_BANDED"] = "0"   # ELL V-cycle on CPU
        try:
            with jax.default_device(cpu):
                sim_cpu = make()
                wall_cpu, *_ = _time_steps(sim_cpu, cpu_steps)
        finally:
            os.environ.pop("KNPEMI_PALLAS", None)
            os.environ.pop("KNPEMI_BANDED", None)
        cpu_mdofs = dofs * cpu_steps / wall_cpu / 1e6
        vs_baseline = mdofs / cpu_mdofs
        print(
            f"# cpu: {wall_cpu / cpu_steps * 1e3:.1f} ms/step "
            f"({cpu_mdofs:.3f} MDoF/s) -> speedup {vs_baseline:.2f}x",
            file=sys.stderr,
        )

    out = {
        "metric": "knpemi_mdof_per_s_per_chip",
        "value": round(mdofs, 4),
        "unit": "MDoF/s",
        "vs_baseline": round(vs_baseline, 3),
    }

    # reference-arithmetic CPU proxy: the BASELINE.md gate is "vs CPU
    # PETSc reference", and the reference stack is f64-only (PETSc KSP
    # at rtol 1e-7, serial LSODA sweeps).  The primary vs_baseline above
    # deliberately uses this repo's OWN optimized f32 CPU build — a much
    # stronger baseline than the gate demands — so also report the same
    # step at f64 on CPU (x64 needs a fresh process: the flag must be
    # set before the first backend use, and the TPU plugin pins f32).
    if case == "3d" and do_cpu and os.environ.get(
        "KNPEMI_BENCH_CPU_F64", "1"
    ) == "1":
        import subprocess

        code = f"""
import json, sys, time
sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})
sys.path.insert(0, {str(Path(__file__).resolve().parent / 'examples' / 'idealized')!r})
import os
os.environ["KNPEMI_X64"] = "1"
os.environ["KNPEMI_PALLAS"] = "0"
os.environ["KNPEMI_BANDED"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from run_3d import build_simulation
sim = build_simulation(resolution={res}, g_syn_bar=10.0, dtype=jnp.float64)
state = sim.init_state()
chunk = sim._chunk(1)
state, _ = chunk(state)
state.t.block_until_ready()
t0 = time.perf_counter()
for _ in range({cpu_steps}):
    state, _ = chunk(state)
state.t.block_until_ready()
wall = time.perf_counter() - t0
print(json.dumps({{"ms_per_step": wall / {cpu_steps} * 1e3}}))
"""
        try:
            def _run_f64():
                r = subprocess.run(
                    [sys.executable, "-c", code],
                    capture_output=True, text=True, timeout=900,
                )
                line = r.stdout.strip().splitlines()[-1]
                return json.loads(line)

            f64 = _with_alarm(960, _run_f64)
            cpu64_mdofs = dofs / (f64["ms_per_step"] / 1e3) / 1e6
            out["cpu_f64_ms_per_step"] = round(f64["ms_per_step"], 1)
            out["vs_baseline_f64"] = round(mdofs / cpu64_mdofs, 3)
            print(
                f"# cpu f64 (reference-arithmetic proxy): "
                f"{f64['ms_per_step']:.1f} ms/step -> "
                f"{out['vs_baseline_f64']:.2f}x",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — bench must still report
            out["vs_baseline_f64"] = None
            print(f"# cpu f64 leg failed: {e}", file=sys.stderr)

    # large-problem case (>=500k dofs): TPU-only timing at 3-D res 2,
    # where the chip is bandwidth- rather than latency-bound
    if case == "3d" and res == 1 and os.environ.get(
        "KNPEMI_BENCH_BIG", "1"
    ) == "1":
        def _run_big():
            sim_big = build_simulation(resolution=2, g_syn_bar=10.0)
            dofs_big = _dofs_per_step(sim_big)
            wall_big, _, ie, ik = _time_steps(sim_big, 3)
            return {
                "dofs": dofs_big,
                "ms_per_step": round(wall_big / 3 * 1e3, 1),
                "mdof_per_s": round(dofs_big * 3 / wall_big / 1e6, 4),
                "emi_iters": int(ie[-1]),
            }

        try:
            out["big_case"] = _with_alarm(
                int(os.environ.get("KNPEMI_BENCH_CASE_TIMEOUT", "1200")),
                _run_big,
            )
        except Exception as e:  # noqa: BLE001 — bench must still report
            out["big_case"] = {"error": str(e)[:200]}

    # flagship case: the astrocyte-class tissue scenario (3 subdomains,
    # 2 membranes — HH neuron + Kir glial — pulsed ECS source) at 840k
    # dofs/step, the workload class BASELINE.md's 10x gate is defined on
    if case == "3d" and os.environ.get("KNPEMI_BENCH_FLAGSHIP", "1") == "1":
        def _run_flagship():
            sys.path.insert(
                0,
                str(Path(__file__).resolve().parent / "examples" / "astrocyte"),
            )
            from run_stim_duration import build_simulation as build_astro
            from knpemi_tpu.sim.config import load_config, DEFAULTS

            cfg = dict(DEFAULTS)
            cfg.update(
                load_config(
                    Path(__file__).resolve().parent
                    / "examples/astrocyte/config_files/baseline.yml"
                )
            )
            cfg["mesh_n"] = int(os.environ.get("KNPEMI_BENCH_FLAGSHIP_N", "64"))
            sim_fl = build_astro(cfg)
            dofs_fl = _dofs_per_step(sim_fl)
            n_fl = int(os.environ.get("KNPEMI_BENCH_FLAGSHIP_STEPS", "3"))
            wall_fl, _, ie, ik = _time_steps(sim_fl, n_fl)
            ms_step = wall_fl / n_fl * 1e3
            return {
                "dofs": dofs_fl,
                "ms_per_step": round(ms_step, 1),
                "mdof_per_s": round(dofs_fl * n_fl / wall_fl / 1e6, 4),
                # wall seconds of compute per simulated millisecond
                "s_per_sim_ms": round(ms_step / 1e3 / float(cfg["dt"]), 3),
                "emi_iters": int(ie[-1]),
                "knp_iters": int(ik[-1]),
            }

        try:
            out["flagship"] = _with_alarm(
                int(os.environ.get("KNPEMI_BENCH_CASE_TIMEOUT", "1200")),
                _run_flagship,
            )
        except Exception as e:  # noqa: BLE001 — bench must still report
            out["flagship"] = {"error": str(e)[:200]}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
