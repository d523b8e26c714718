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
host CPU backend (the reference stack is CPU PETSc+MPI; BASELINE.json
publishes no absolute numbers, so the self-measured CPU run is the
available stand-in).  A secondary `vs_baseline_f64` leg runs the same
step at f64 on CPU — the reference stack's arithmetic (PETSc KSP at
rtol 1e-7, serial LSODA sweeps is f64-only), so that ratio is the
closest proxy for the literal BASELINE.md gate.

Process model: the parent NEVER initializes a backend.  Every case runs
in its own subprocess (`bench.py --child <case>`), sequentially — one
TPU process at a time (two concurrent processes on the tunnel fault
each other), and each case starts with a clean HBM arena (running the
565k-dof res-2 case and the 840k-dof flagship in one process leaves the
earlier cases' executables+constants resident and the flagship dies
with RESOURCE_EXHAUSTED — observed).  Subprocess wall-clock timeouts
replace in-process SIGALRM (which JAX runtime threads can swallow, see
TODO_NEXT.md).

Environment knobs:
  KNPEMI_BENCH_CASE  = 3d|2d   (default 3d)
  KNPEMI_BENCH_RES   = int     (default 1 for 3d, 4 for 2d)
  KNPEMI_BENCH_STEPS = int     (default 10 timed steps)
  KNPEMI_BENCH_CPU   = 0|1     (default 1: measure the CPU baseline)
  KNPEMI_BENCH_CPU_STEPS = int (default 5)
  KNPEMI_BENCH_BIG / KNPEMI_BENCH_FLAGSHIP / KNPEMI_BENCH_CPU_F64
    / KNPEMI_BENCH_FLAGSHIP_CPU = 0|1
  KNPEMI_BENCH_CASE_TIMEOUT = seconds for the big child
  KNPEMI_BENCH_BUDGET = total wall-clock budget in seconds (default
    2550; children are clamped/skipped to fit, and the merged JSON is
    re-printed after every completed stage so a driver-side kill can
    never erase already-measured results)
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE / "examples" / "idealized"))


def _dofs_per_step(sim):
    n_emi = sim.geom.emi_size
    n_knp = sum(
        sim.knp_sys.n_solved * s.n_dofs for s in sim.geom.subdomains.values()
    )
    return n_emi + n_knp


def _time_steps(sim, n_steps, warmup_steps: int = 1):
    """Compile one single-step chunk, then time it n_steps times (one
    compilation unit; remote-TPU compiles are expensive).  Extra
    warmup_steps advance the state before the timed window so the
    sample is representative (e.g. past a stimulus onset) rather than
    the resting first steps where the Krylov solves exit early."""
    state = sim.init_state()
    chunk = sim._chunk(1)
    for _ in range(max(1, warmup_steps)):  # first call compiles
        state, _ = chunk(state)
    state.t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, (ce, ck, _ok) = chunk(state)
    state.t.block_until_ready()
    wall = time.perf_counter() - t0
    return wall, state, ce, ck


def _time_step_windows(sim, n_windows, steps_per_window, warmup_steps=1):
    """Like _time_steps but timed in n_windows independently-synced
    windows, so the headline mean carries a spread estimate (round-4
    lesson: a single 3-5 step window showed 385-420 ms/step scatter
    across repeats; the robust number needs >= ~20 timed steps).  The
    per-window device sync costs one tunnel roundtrip each — keep
    steps_per_window >= 5 so it stays <3% of the window."""
    state = sim.init_state()
    chunk = sim._chunk(1)
    for _ in range(max(1, warmup_steps)):  # first call compiles
        state, _ = chunk(state)
    state.t.block_until_ready()
    walls = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(steps_per_window):
            state, (ce, ck, _ok) = chunk(state)
        state.t.block_until_ready()
        walls.append(time.perf_counter() - t0)
    return walls, state, ce, ck


def _make_idealized():
    case = os.environ.get("KNPEMI_BENCH_CASE", "3d")
    if case == "2d":
        from run_2d import build_simulation

        res = int(os.environ.get("KNPEMI_BENCH_RES", "4"))
        return case, res, lambda: build_simulation(resolution=res)
    from run_3d import build_simulation

    res = int(os.environ.get("KNPEMI_BENCH_RES", "1"))
    return case, res, lambda: build_simulation(resolution=res, g_syn_bar=10.0)


# ----------------------------------------------------------------- children


def _child_core():
    """Primary metric on the accelerator + own-build CPU baseline."""
    import jax

    case, res, make = _make_idealized()
    steps = int(os.environ.get("KNPEMI_BENCH_STEPS", "10"))
    cpu_steps = int(os.environ.get("KNPEMI_BENCH_CPU_STEPS", "5"))
    do_cpu = os.environ.get("KNPEMI_BENCH_CPU", "1") == "1"

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

    return {
        "metric": "knpemi_mdof_per_s_per_chip",
        "value": round(mdofs, 4),
        "unit": "MDoF/s",
        "vs_baseline": round(vs_baseline, 3),
        "_case": case,
        "_res": res,
        "_dofs": dofs,
    }


def _child_cpu_f64():
    """Reference-arithmetic proxy: same step, f64, CPU, XLA kernels."""
    os.environ["KNPEMI_X64"] = "1"
    os.environ["KNPEMI_PALLAS"] = "0"
    os.environ["KNPEMI_BANDED"] = "0"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from run_3d import build_simulation

    res = int(os.environ.get("KNPEMI_BENCH_RES", "1"))
    cpu_steps = int(os.environ.get("KNPEMI_BENCH_CPU_STEPS", "5"))
    sim = build_simulation(resolution=res, g_syn_bar=10.0, dtype=jnp.float64)
    dofs = _dofs_per_step(sim)
    wall, *_ = _time_steps(sim, cpu_steps)
    return {"ms_per_step": wall / cpu_steps * 1e3, "_dofs": dofs}


def _child_big():
    """Large-problem case (>=500k dofs): accelerator-only timing at 3-D
    res 2, where the chip is bandwidth- rather than latency-bound."""
    from run_3d import build_simulation

    sim_big = build_simulation(resolution=2, g_syn_bar=10.0)
    dofs_big = _dofs_per_step(sim_big)
    wall_big, _, ie, ik = _time_steps(sim_big, 3)
    return {
        "dofs": dofs_big,
        "ms_per_step": round(wall_big / 3 * 1e3, 1),
        "mdof_per_s": round(dofs_big * 3 / wall_big / 1e6, 4),
        "emi_iters": int(ie[-1]),
    }


def _build_flagship(dtype=None):
    sys.path.insert(0, str(_HERE / "examples" / "astrocyte"))
    from run_stim_duration import build_simulation as build_astro
    from knpemi_tpu.sim.config import load_config, DEFAULTS

    cfg = dict(DEFAULTS)
    cfg.update(
        load_config(_HERE / "examples/astrocyte/config_files/baseline.yml")
    )
    cfg["mesh_n"] = int(os.environ.get("KNPEMI_BENCH_FLAGSHIP_N", "64"))
    if os.environ.get("KNPEMI_BENCH_TUNED", "1") == "1" and dtype is None:
        # Accepted tuned KNP options (tools/compare_solver_opts.py
        # campaign, RESULTS.md round 4): min_iter 5->2 drops the
        # reference's forced-iteration guard, restart 30->8 shrinks the
        # Krylov buffers, rtol 1e-7->3e-6 stops at the f32-attainable
        # level; EMI rtol 1e-6->1e-5 (the true residual floors at
        # ~3e-3 equilibrated by iteration 4 — tools/profile_emi.py).
        # Fields agree with the parity options to 8.8e-6 over 100
        # flagship steps; KNP iterations 5.97->3.99, EMI 8.34->6.59
        # mean.  The CPU f64 baseline leg (dtype set) keeps parity
        # options.
        cfg["solver"] = {
            **(cfg.get("solver") or {}),
            "min_iter_knp": 2, "restart": 8, "rtol_knp": 3e-6,
            "rtol_emi": 1e-5,
        }
    return build_astro(cfg, dtype=dtype), cfg


def _child_flagship():
    """The astrocyte-class tissue scenario (3 subdomains, 2 membranes —
    HH neuron + Kir glial — pulsed ECS source) at 840k dofs/step: the
    workload class BASELINE.md's 10x gate is defined on."""
    sim_fl, cfg = _build_flagship()
    dofs_fl = _dofs_per_step(sim_fl)
    n_fl = int(os.environ.get("KNPEMI_BENCH_FLAGSHIP_STEPS", "20"))
    win = max(1, min(5, n_fl))
    n_win = max(1, n_fl // win)
    n_fl = n_win * win
    # warm past the pulsed-source onset (delay 1 ms = 10 steps at dt
    # 0.1) so the timed window samples stimulated-regime solves, not
    # the resting first steps where KNP exits at 2 iterations
    walls, _, ie, ik = _time_step_windows(
        sim_fl, n_win, win, warmup_steps=12
    )
    wall_fl = sum(walls)
    ms_step = wall_fl / n_fl * 1e3
    per_win = [w / win * 1e3 for w in walls]
    return {
        "dofs": dofs_fl,
        "ms_per_step": round(ms_step, 1),
        "n_timed": n_fl,
        # spread across the independently-timed windows (min/max of the
        # per-window ms/step): the robustness the headline mean carries
        "ms_per_step_window_range": [round(min(per_win), 1),
                                     round(max(per_win), 1)],
        "mdof_per_s": round(dofs_fl * n_fl / wall_fl / 1e6, 4),
        # wall seconds of compute per simulated millisecond
        "s_per_sim_ms": round(ms_step / 1e3 / float(cfg["dt"]), 3),
        "emi_iters": int(ie[-1]),
        "knp_iters": int(ik[-1]),
        # solver options of THIS leg (the CPU-f64 leg runs parity
        # options; disclose rather than imply identical tolerances)
        "solver_opts": ("tuned" if os.environ.get(
            "KNPEMI_BENCH_TUNED", "1") == "1" else "parity"),
    }


def _child_flagship_cpu_f64():
    """Reference-arithmetic baseline on the gate's own workload: the
    flagship step at f64 on the host CPU (BASELINE.md defines the 10x
    gate on the 3-D astrocyte case; the real CPU-PETSc stack is not
    installable here, so the own-build CPU-f64 step is the stand-in —
    same splitting scheme, f64 like PETSc, at the PARITY solver options
    (rtol_knp 1e-7 / rtol_emi 1e-6, min_iter 5, restart 30).  The TPU
    flagship leg defaults to the certified tuned options — the two legs'
    solver settings are disclosed in the emitted JSON (`solver_opts`),
    so the vs_cpu_f64 ratio is hardware + certified tuning, not
    tolerance-for-tolerance; set KNPEMI_BENCH_TUNED=0 for a
    same-options ratio).  Reuses the content-keyed MG disk cache
    populated by the TPU flagship child."""
    os.environ["KNPEMI_X64"] = "1"
    os.environ["KNPEMI_PALLAS"] = "0"
    os.environ["KNPEMI_BANDED"] = "0"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sim_fl, _ = _build_flagship(dtype=jnp.float64)
    dofs_fl = _dofs_per_step(sim_fl)
    n_fl = int(os.environ.get("KNPEMI_BENCH_FLAGSHIP_CPU_STEPS", "2"))
    # same stimulated-regime sampling window as the TPU flagship child
    wall_fl, _, ie, ik = _time_steps(sim_fl, n_fl, warmup_steps=12)
    return {
        "dofs": dofs_fl,
        "ms_per_step": round(wall_fl / n_fl * 1e3, 1),
        "emi_iters": int(ie[-1]),
        "knp_iters": int(ik[-1]),
        "solver_opts": "parity",
    }


_CHILDREN = {
    "core": _child_core,
    "cpu_f64": _child_cpu_f64,
    "big": _child_big,
    "flagship": _child_flagship,
    "flagship_cpu_f64": _child_flagship_cpu_f64,
}


# ------------------------------------------------------------------- parent


def _run_child(name: str, timeout: int, attempts: int = 2, remaining=None):
    """Run one case in a fresh process; return its parsed JSON tail line.

    stderr passes through (human-readable progress); stdout is captured
    so only the parent's single merged JSON line reaches the driver.

    The axon tunnel intermittently wedges a remote compile forever (the
    same child then succeeds on a clean retry — observed round 4); a
    timed-out or crashed child is retried once.  When a ``remaining``
    callable (seconds of budget left) is given, every attempt's timeout
    is re-clamped to it and a retry is skipped outright if too little
    budget is left — one stage can no longer consume 2x its clamp.
    """
    last = None
    for a in range(attempts):
        eff = timeout
        if remaining is not None:
            if remaining() < 90:
                break
            # split what's left over the attempts still available, so a
            # WEDGED first attempt (the tunnel failure mode: a child
            # blocked in remote compile forever) cannot starve its own
            # retry — observed round 5: the wedge hits first attempts
            # reliably and the clean retry then finishes in ~400 s
            share = (remaining() - 30) / (attempts - a)
            eff = max(60, min(timeout, share))
        try:
            r = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 "--child", name],
                stdout=subprocess.PIPE,
                text=True,
                timeout=eff,
            )
            if r.returncode != 0:
                raise RuntimeError(f"child {name} exited {r.returncode}")
            return json.loads(r.stdout.strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001 — retry once, then surface
            last = e
            print(f"# child {name} attempt {a + 1} failed: {e}",
                  file=sys.stderr)
    raise last if last is not None else TimeoutError(
        f"child {name}: no budget left for an attempt"
    )


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        # persistent XLA compilation cache: a kernel edit invalidates
        # every executable, and the fresh Mosaic compile of the res-2 /
        # flagship chunks can exceed a child's 900 s clamp (observed:
        # first attempt times out, the retry rides the partial cache).
        # Harmless where the backend ignores it.
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR", str(_HERE / ".jax_cache")
        )
        import jax

        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ["JAX_COMPILATION_CACHE_DIR"],
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
        except Exception:  # noqa: BLE001 — cache is best-effort
            pass
        if os.environ.get("KNPEMI_PLATFORM"):
            # e.g. KNPEMI_PLATFORM=cpu for a smoke run while the TPU is
            # busy (the JAX_PLATFORMS env var alone is ignored once the
            # axon plugin registers)
            jax.config.update("jax_platforms", os.environ["KNPEMI_PLATFORM"])
        print(json.dumps(_CHILDREN[sys.argv[2]]()))
        return

    case = os.environ.get("KNPEMI_BENCH_CASE", "3d")
    res = int(os.environ.get("KNPEMI_BENCH_RES", "1" if case == "3d" else "4"))
    big_timeout = int(os.environ.get("KNPEMI_BENCH_CASE_TIMEOUT", "900"))

    # Wall-clock budget for the WHOLE bench (round 3 lesson: the driver
    # kills the process with `timeout` and a late-child overrun then
    # destroys every result — BENCH_r03.json rc=124, parsed null).  Two
    # defenses: (a) the merged JSON line is re-printed + flushed after
    # every completed stage, so a kill still leaves the latest valid
    # line on stdout; (b) each child's subprocess timeout is clamped to
    # the remaining budget and children are skipped outright when too
    # little remains, so normally we finish and exit 0 well inside the
    # driver's cap.
    budget = float(os.environ.get("KNPEMI_BENCH_BUDGET", "2550"))
    deadline = time.monotonic() + budget

    def remaining():
        return deadline - time.monotonic()

    out = {
        "metric": "knpemi_mdof_per_s_per_chip",
        "value": None,
        "unit": "MDoF/s",
        "vs_baseline": None,
    }

    def emit():
        print(json.dumps(out), flush=True)

    def stage(key, child, *, min_budget, timeout, run_if=True):
        """Run one child under the budget; update out[key]; re-emit."""
        if not run_if:
            return None
        if remaining() < min_budget:
            out[key] = {"skipped": f"budget ({remaining():.0f}s left)"}
            emit()
            return None
        try:
            result = _run_child(child, timeout=timeout, remaining=remaining)
            out[key] = result
        except Exception as e:  # noqa: BLE001 — bench must still report
            out[key] = {"error": str(e)[:200]}
            result = None
        emit()
        return result

    dofs = None
    try:
        core = _run_child("core", timeout=900, remaining=remaining)
        dofs = core.pop("_dofs")
        core.pop("_case", None)
        core.pop("_res", None)
        out.update(core)
        out["_dofs"] = dofs
    except Exception as e:  # noqa: BLE001 — bench must still report
        out["error"] = str(e)[:200]
    emit()
    if dofs is None:
        return

    if case == "3d" and os.environ.get("KNPEMI_BENCH_CPU_F64", "1") == "1":
        f64 = stage("cpu_f64", "cpu_f64", min_budget=240, timeout=960)
        if f64 and "ms_per_step" in f64:
            cpu64_mdofs = dofs / (f64["ms_per_step"] / 1e3) / 1e6
            out["cpu_f64_ms_per_step"] = round(f64["ms_per_step"], 1)
            out["vs_baseline_f64"] = round(out["value"] / cpu64_mdofs, 3)
            del out["cpu_f64"]
            print(
                f"# cpu f64 (reference-arithmetic proxy): "
                f"{f64['ms_per_step']:.1f} ms/step -> "
                f"{out['vs_baseline_f64']:.2f}x",
                file=sys.stderr,
            )
            emit()

    # flagship BEFORE the big case: the flagship is the headline leg
    # (BASELINE.md's 10x gate is defined on it) — when fresh compiles
    # after a kernel edit eat the budget, the secondary res-2 case is
    # the one that gets skipped (round-5 lesson: a timed-out big
    # attempt starved the flagship of budget)
    fl = stage(
        "flagship",
        "flagship",
        min_budget=420,
        timeout=int(os.environ.get("KNPEMI_BENCH_FLAGSHIP_TIMEOUT", "1500")),
        run_if=(
            case == "3d"
            and os.environ.get("KNPEMI_BENCH_FLAGSHIP", "1") == "1"
        ),
    )

    if fl and "ms_per_step" in fl and os.environ.get(
        "KNPEMI_BENCH_FLAGSHIP_CPU", "1"
    ) == "1":
        # The BASELINE.md 10x gate is defined on this workload: measure
        # the CPU-f64 leg on it, not only on the res-1 core case.
        flc = stage(
            "flagship_cpu_f64", "flagship_cpu_f64",
            min_budget=300, timeout=1200,
        )
        if flc and "ms_per_step" in flc:
            out["flagship"]["vs_cpu_f64"] = round(
                flc["ms_per_step"] / fl["ms_per_step"], 2
            )
            out["flagship"]["cpu_f64_ms_per_step"] = flc["ms_per_step"]
            del out["flagship_cpu_f64"]
            print(
                f"# flagship cpu f64: {flc['ms_per_step']:.1f} ms/step -> "
                f"{out['flagship']['vs_cpu_f64']:.2f}x",
                file=sys.stderr,
            )
            emit()

    stage(
        "big_case",
        "big",
        # realistic cost of the res-2 child is ~420 s clean and up to
        # ~900 with one wedged attempt: skip CLEANLY below that rather
        # than burn the tail of the budget on a doomed attempt pair
        min_budget=900,
        timeout=big_timeout,
        run_if=(
            case == "3d"
            and res == 1
            and os.environ.get("KNPEMI_BENCH_BIG", "1") == "1"
        ),
    )

    out.pop("_dofs", None)
    emit()


if __name__ == "__main__":
    main()
