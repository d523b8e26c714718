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
from knpemi_tpu.io import save_checkpoint, TimeSeriesWriter

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


def solve_system(config: dict, verbose: bool = True, outdir: str | None = None):
    sim = build_simulation(config)
    state = sim.init_state()
    dt = sim.params.dt
    n_steps = int(round(float(config["Tstop"]) / dt))
    save_every = int(config.get("save_frequency", 5))

    traces = {"t": [], "phi_M_neuron": [], "phi_M_glial": [],
              "K_e_max": [], "K_e_min": []}
    writers = {}
    if outdir:
        out = Path(outdir) / str(config.get("fname", "astrocyte"))
        for tag, sub in sim.geom.subdomains.items():
            writers[tag] = TimeSeriesWriter(
                out / f"results_sub_{tag}.xdmf",
                sub.coords, sub.cells,
            )

    def observer(s):
        # ONE device->host transfer for everything the observer needs:
        # per-field np.asarray costs a synchronous tunnel roundtrip each
        # (measured: 21 fields x 600 calls turned a 29 ms/step run into
        # 240 ms/step end-to-end)
        t_h, phi_h, c_h, phi_M_h = jax.device_get(
            (s.t, s.phi, s.c, s.phi_M)
        )
        traces["t"].append(float(t_h))
        traces["phi_M_neuron"].append(float(phi_M_h[1].mean()))
        traces["phi_M_glial"].append(float(phi_M_h[2].mean()))
        traces["K_e_max"].append(float(c_h[0][0].max()))
        traces["K_e_min"].append(float(c_h[0][0].min()))
        for tag, w in writers.items():
            fields = {f"phi_{tag}": phi_h[tag]}
            for k, ion in enumerate(sim.ions):
                fields[f"c_{ion.name}_{tag}"] = c_h[tag][k]
            w.write(float(t_h), fields)

    t0 = time.perf_counter()
    state, it_emi, it_knp = sim.run(
        state, n_steps, save_every=save_every, observer=observer,
        verbose=verbose,
    )
    wall = time.perf_counter() - t0
    if verbose:
        print(
            f"{n_steps} steps in {wall:.1f}s ({wall / n_steps * 1e3:.1f} "
            f"ms/step); avg it emi {it_emi.mean():.1f} knp {it_knp.mean():.1f}"
        )
    for w in writers.values():
        w.close()
    if outdir:
        out = Path(outdir) / str(config.get("fname", "astrocyte"))
        save_checkpoint(out / "final_state.npz", state)
        np.savez(out / "traces.npz", **{k: np.asarray(v) for k, v in traces.items()})
    return state, traces, it_emi, it_knp


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", metavar="config", default="baseline",
                        help="config name under config_files/ or a path")
    parser.add_argument("--outdir", default="results")
    parser.add_argument("--Tstop", type=float, default=None,
                        help="override the config's Tstop (ms)")
    args = parser.parse_args()
    cfg_path = Path(args.c)
    if not cfg_path.exists():
        cfg_path = Path(__file__).parent / "config_files" / f"{args.c}.yml"
    config = load_config(cfg_path)
    if args.Tstop is not None:
        config["Tstop"] = args.Tstop
    solve_system(config, outdir=args.outdir)
