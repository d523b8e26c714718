#!/usr/bin/env python3
"""Local astrocyte depolarization — the flagship 3-subdomain scenario.

TPU-native equivalent of the reference driver
examples/local_astrocyte_depolarization/run_stim_duration.py:
ECS(0) + neuron(1, HH) + glial(2, Kir) on tissue geometry, pulsed ECS
K+/Na- source in a box, YAML-configured (same keys as the reference's
config_files/*.yml).  Units: mV / ms / cm / mM (run_stim_duration.py:216-228).

The reference runs on emimesh reconstructions (not shipped with the
repo); by default this driver uses the synthetic astrocyte tissue mesh
(knpemi_tpu.mesh.tissue) with the same tag structure; pass
``mesh_file`` in the config to load a remarked emimesh XDMF instead.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from knpemi_tpu.mesh.tissue import astrocyte_tissue_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.types import Ion, PhysicalParams
from knpemi_tpu.models import setup_membrane_model, get_model
from knpemi_tpu.sim import Simulation, SolverOptions
from knpemi_tpu.sim.config import (
    load_config, source_box_indicator_q, pulsed_source_gate, DEFAULTS,
)
from knpemi_tpu.io import save_checkpoint, load_checkpoint, TimeSeriesWriter

# Calibrated initial concentrations (run_stim_duration.py:232-242)
K_E_INIT = 3.092970607490389
K_N_INIT = 124.13988964240784
K_G_INIT = 99.3100014897692
NA_E_INIT = 144.60625137617149
NA_N_INIT = 12.850454639128186
NA_G_INIT = 15.775818906083778
CL_E_INIT = 133.62525154406637
CL_N_INIT = 5.0
CL_G_INIT = 5.203660274163705

# Free diffusion coefficients in cm^2/ms (run_stim_duration.py:225-227)
D_NA, D_K, D_CL = 1.33e-8, 1.96e-8, 2.03e-8


def build_simulation(config: dict, dtype=None):
    if config.get("mesh_file"):
        from knpemi_tpu.io import read_mesh

        mesh = read_mesh(config["mesh_file"])
        if config.get("remark"):
            # raw emimesh file: convert conventions first (reference
            # local_astrocyte_depolarization/remark_mesh.py:91-150, e.g.
            # remark: {ecs_tag_in: 1, scale: 1e-7, tag_map: {100: 2}})
            from knpemi_tpu.mesh.tissue import remark_emimesh

            opts = dict(config["remark"])
            if "tag_map" in opts:
                opts["tag_map"] = {
                    int(k): int(v) for k, v in opts["tag_map"].items()
                }
            mesh = remark_emimesh(mesh, **opts)
    else:
        mesh = astrocyte_tissue_mesh(
            int(config.get("resolution", 0)),
            n=config.get("mesh_n"),  # direct per-axis cell count override
        )
    geom = build_geometry(mesh)

    dt = float(config.get("dt", 0.1))
    params = PhysicalParams(
        dt=dt, F=96500e3, R=8.315e3, temperature=307e3, C_M=1.0,
        n_steps_ODE=25, rho_z=-1.0,
        # immobile background charge balancing the initial state
        # (run_stim_duration.py:249-258)
        rho={
            0: NA_E_INIT + K_E_INIT - CL_E_INIT,
            1: NA_N_INIT + K_N_INIT - CL_N_INIT,
            2: NA_G_INIT + K_G_INIT - CL_G_INIT,
        },
    )

    le2 = float(config["lambda_e"]) ** 2
    li2 = float(config["lambda_i"]) ** 2

    def D_sub(D):
        return {0: D / le2, 1: D / li2, 2: D / li2}

    # pulsed ECS source: +f for K, -f for Na, inside the config box
    lo = (config["x_L"], config["y_L"], config["z_L"])
    hi = (config["x_U"], config["y_U"], config["z_U"])
    f = float(config["f_value"])
    box_q = source_box_indicator_q(geom, 0, lo, hi)

    ions = [
        Ion("K", 1.0, D_sub(D_K),
            {0: K_E_INIT, 1: K_N_INIT, 2: K_G_INIT},
            f_source_q={0: f * box_q}),
        Ion("Cl", -1.0, D_sub(D_CL),
            {0: CL_E_INIT, 1: CL_N_INIT, 2: CL_G_INIT}),
        Ion("Na", 1.0, D_sub(D_NA),
            {0: NA_E_INIT, 1: NA_N_INIT, 2: NA_G_INIT},
            f_source_q={0: -f * box_q}),
    ]

    stim_params = {
        "stimulus": {"stim_amplitude": float(config.get("g_syn_bar", 0.0))},
        "stimulus_locator": lambda x: x[0] < 20e-4,  # run_stim_duration.py:374
    }
    mem_models = setup_membrane_model(
        stim_params, params,
        {1: get_model("hh_mv"), 2: get_model("glial")},
        geom, ions,
    )
    # resting membrane states consistent with the calibrated concentrations
    for mm in mem_models:
        for name, v in [("K_e", K_E_INIT), ("Na_e", NA_E_INIT),
                        ("Cl_e", CL_E_INIT)]:
            mm.params0[:, mm.param_index(name)] = v
        if mm.tag == 1:
            for name, v in [("K_i", K_N_INIT), ("Na_i", NA_N_INIT),
                            ("Cl_i", CL_N_INIT)]:
                mm.params0[:, mm.param_index(name)] = v
        else:
            for name, v in [("K_i", K_G_INIT), ("Na_i", NA_G_INIT),
                            ("Cl_i", CL_G_INIT)]:
                mm.params0[:, mm.param_index(name)] = v

    # refresh the lagged EMI hierarchy every 100 steps (10 ms): the
    # stimulated [K]e drift moves kappa by several percent over the
    # pulse train, and the refresh is recompile-free (refresh_mg)
    sopts = dict(direct=False, rtol_emi=1e-6, atol_emi=1e-40,
                 rtol_knp=1e-7, atol_knp=2e-40, mg_refresh_every=100)
    sopts.update(config.get("solver") or {})
    sim = Simulation(
        geom, ions, params, mem_models, SolverOptions(**sopts),
        source_gate=pulsed_source_gate(config),
        dtype=dtype or (jnp.float32 if jax.devices()[0].platform == "tpu"
                        else jnp.float64),
    )
    return sim


_TRACE_KEYS = ("t", "phi_M_neuron", "phi_M_glial", "K_e_max", "K_e_min")


def solve_system(config: dict, verbose: bool = True, outdir: str | None = None,
                 resume: bool = False):
    """Run (or ``resume=True``: continue) the scenario to ``Tstop``.

    Crash recovery for multi-hour campaigns (no analog in the reference,
    which writes per-step .bp output but cannot restart,
    run_stim_duration.py:462-494 / SURVEY.md §5): every
    ``checkpoint_every`` steps (config key; 0 disables) the COMPLETE
    SimState plus the observer traces is written atomically to
    ``<outdir>/<fname>/ckpt.npz``; ``--resume`` reloads it, refreshes the
    kappa-lagged EMI hierarchy from the restored concentrations, reopens
    the XDMF series truncated to the checkpointed snapshot count, and
    continues to Tstop.
    """
    sim = build_simulation(config)
    dt = sim.params.dt
    n_steps_total = int(round(float(config["Tstop"]) / dt))
    save_every = int(config.get("save_frequency", 5))
    # full-field XDMF frames every `save_frequency_fields` observer calls
    # (traces stay at save_frequency resolution; at flagship scale a frame
    # is ~14 MB, so campaigns thin the frame rate, not the traces)
    field_stride = max(1, int(config.get("save_frequency_fields", 1)))
    ckpt_every = int(config.get("checkpoint_every", 0))

    out = (Path(outdir) / str(config.get("fname", "astrocyte"))
           if outdir else None)
    ckpt_path = out / "ckpt.npz" if out else None

    traces = {k: [] for k in _TRACE_KEYS}
    n_saves = 0
    if resume:
        if ckpt_path is None or not ckpt_path.exists():
            raise SystemExit(f"--resume: no checkpoint at {ckpt_path}")
        state, meta = load_checkpoint(ckpt_path)
        n_saves = int(meta["n_saves"])
        for k in _TRACE_KEYS:
            traces[k] = [float(v) for v in np.atleast_1d(meta[f"trace_{k}"])]
        if not sim.opts.direct and getattr(sim.opts, "mg_refresh_every", 0):
            # rebuild the kappa-lagged hierarchy values from the restored
            # concentrations (same cadence semantics as mg_refresh_every;
            # a run with refreshes disabled keeps the setup hierarchy so
            # resumed and uninterrupted runs stay bit-identical)
            sim.refresh_mg(state)
        if verbose:
            print(f"resumed from {ckpt_path}: step {int(state.step)}, "
                  f"t = {float(state.t):.3f} ms, {n_saves} saves")
    else:
        state = sim.init_state()

    n_steps = n_steps_total - int(state.step)
    if n_steps <= 0:
        print(f"nothing to do: checkpoint already at step {int(state.step)}"
              f" >= {n_steps_total}")
        return state, traces, np.array([]), np.array([])

    writers = {}
    if outdir:
        n_frames = (n_saves + field_stride - 1) // field_stride
        for tag, sub in sim.geom.subdomains.items():
            writers[tag] = TimeSeriesWriter(
                out / f"results_sub_{tag}.xdmf",
                sub.coords, sub.cells,
                resume_at=n_frames if resume else None,
            )

    def observer(s):
        # ONE device->host transfer for everything the observer needs:
        # per-field np.asarray costs a synchronous tunnel roundtrip each
        # (measured: 21 fields x 600 calls turned a 29 ms/step run into
        # 240 ms/step end-to-end)
        nonlocal n_saves
        t_h, phi_h, c_h, phi_M_h = jax.device_get(
            (s.t, s.phi, s.c, s.phi_M)
        )
        traces["t"].append(float(t_h))
        traces["phi_M_neuron"].append(float(phi_M_h[1].mean()))
        traces["phi_M_glial"].append(float(phi_M_h[2].mean()))
        traces["K_e_max"].append(float(c_h[0][0].max()))
        traces["K_e_min"].append(float(c_h[0][0].min()))
        if n_saves % field_stride == 0:
            for tag, w in writers.items():
                fields = {f"phi_{tag}": phi_h[tag]}
                for k, ion in enumerate(sim.ions):
                    fields[f"c_{ion.name}_{tag}"] = c_h[tag][k]
                w.write(float(t_h), fields)
        n_saves += 1

    def write_ckpt(host_state):
        if ckpt_path is None:
            return
        for w in writers.values():
            w._flush()  # the h5 must contain every snapshot the meta claims
        tmp = ckpt_path.with_name("ckpt_tmp.npz")
        save_checkpoint(
            tmp, host_state, n_saves=n_saves,
            **{f"trace_{k}": np.asarray(v) for k, v in traces.items()},
        )
        import os as _os
        if ckpt_path.exists():  # keep one rotation against corruption
            _os.replace(ckpt_path, ckpt_path.with_name("ckpt_prev.npz"))
        _os.replace(tmp, ckpt_path)
        if verbose:
            print(f"  checkpoint @ step {int(host_state.step)} "
                  f"(t = {float(host_state.t):.1f} ms) -> {ckpt_path}")

    t0 = time.perf_counter()
    state, it_emi, it_knp = sim.run(
        state, n_steps, save_every=save_every, observer=observer,
        verbose=verbose,
        checkpoint_every=ckpt_every, checkpoint_cb=write_ckpt,
    )
    wall = time.perf_counter() - t0
    if verbose:
        print(
            f"{n_steps} steps in {wall:.1f}s ({wall / n_steps * 1e3:.1f} "
            f"ms/step); avg it emi {it_emi.mean():.1f} knp {it_knp.mean():.1f}"
        )
    if outdir:
        host_state = jax.device_get(state)
        write_ckpt(host_state)  # a completed run's ckpt resumes to a no-op
    for w in writers.values():
        w.close()
    if outdir:
        save_checkpoint(out / "final_state.npz", host_state)
        np.savez(out / "traces.npz", **{k: np.asarray(v) for k, v in traces.items()})
    return state, traces, it_emi, it_knp


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", metavar="config", default="baseline",
                        help="config name under config_files/ or a path")
    parser.add_argument("--outdir", default="results")
    parser.add_argument("--Tstop", type=float, default=None,
                        help="override the config's Tstop (ms)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from <outdir>/<fname>/ckpt.npz")
    args = parser.parse_args()
    cfg_path = Path(args.c)
    if not cfg_path.exists():
        cfg_path = Path(__file__).parent / "config_files" / f"{args.c}.yml"
    config = load_config(cfg_path)
    if args.Tstop is not None:
        config["Tstop"] = args.Tstop
    solve_system(config, outdir=args.outdir, resume=args.resume)
