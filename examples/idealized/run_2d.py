#!/usr/bin/env python3
"""Idealized 2-D geometry: ECS box with an embedded neuron strip (HH).

TPU-native equivalent of the reference driver
examples/idealized_geometries/run_2D.py: same physical parameters
(run_2D.py:173-254), same 3-ion list [K, Cl, Na] with Na eliminated,
same HH membrane model stimulated on x < 20 um, same solver tolerances
(rtol EMI 1e-5, KNP 1e-7; run_2D.py:296-303).
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

from knpemi_tpu.mesh import idealized_2d_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.types import Ion, PhysicalParams
from knpemi_tpu.models import setup_membrane_model, get_model
from knpemi_tpu.sim import Simulation, SolverOptions

# Calibrated initial concentrations (run_2D.py:190-195, produced by the
# calibration driver, SURVEY.md C14)
NA_I_INIT = 12.838513108648856
NA_E_INIT = 100.71925900027354
K_I_INIT = 124.15397583491901
K_E_INIT = 3.3236967382705265
CL_E_INIT = NA_E_INIT + K_E_INIT
CL_I_INIT = NA_I_INIT + K_I_INIT

# Diffusion coefficients (run_2D.py:183-185)
D_NA, D_K, D_CL = 1.33e-9, 1.96e-9, 2.03e-9


def default_dtype():
    """f64 where available (CPU with x64 on), f32 on TPU (no native f64
    hardware; the f32 path matches f64 to ~1e-4 mV over a full action
    potential, see tests/test_precision.py)."""
    if jax.devices()[0].platform == "tpu" or not jax.config.jax_enable_x64:
        return jnp.float32
    return jnp.float64


def build_simulation(
    resolution: int = 1,
    direct: bool = False,
    g_syn_bar: float = 10.0,
    dt: float = 1.0e-4,
    dtype=None,
    solver_options: SolverOptions | None = None,
):
    if dtype is None:
        dtype = default_dtype()
    mesh = idealized_2d_mesh(resolution)
    geom = build_geometry(mesh)

    params = PhysicalParams(
        dt=dt, F=96485.0, R=8.314, temperature=300.0, C_M=0.02,
        n_steps_ODE=25, rho_z=-1.0, rho={0: 0.0, 1: 0.0},
    )

    # NB: the last ion in the list is eliminated (run_2D.py:253-254)
    ions = [
        Ion("K", 1.0, {0: D_K, 1: D_K}, {0: K_E_INIT, 1: K_I_INIT}),
        Ion("Cl", -1.0, {0: D_CL, 1: D_CL}, {0: CL_E_INIT, 1: CL_I_INIT}),
        Ion("Na", 1.0, {0: D_NA, 1: D_NA}, {0: NA_E_INIT, 1: NA_I_INIT}),
    ]

    stim_params = {
        "stimulus": {"stim_amplitude": g_syn_bar},
        "stimulus_locator": lambda x: x[0] < 20e-6,  # run_2D.py:266
    }
    mem_models = setup_membrane_model(
        stim_params, params, {1: get_model("hh")}, geom, ions
    )

    sim = Simulation(
        geom, ions, params, mem_models,
        solver_options
        or SolverOptions(direct=direct, rtol_emi=1e-5, rtol_knp=1e-7),
        dtype=dtype,
    )
    return sim


def solve_system(resolution: int, Tstop: float = 1.0e-2, direct: bool = False,
                 save_every: int = 10, outdir: str | None = None,
                 verbose: bool = True):
    sim = build_simulation(resolution, direct=direct)
    state = sim.init_state()
    n_steps = int(round(Tstop / sim.params.dt))

    mem = sim.geom.membranes[1]
    probe = int(np.argmin(np.abs(mem.coords[:, 0] - 31e-6)))  # mid-axon
    traces = {"t": [], "phi_M_probe": [], "phi_M_min": [], "phi_M_max": []}
    snapshots = []

    def observer(s):
        # one device->host transfer (per-field np.asarray costs a
        # synchronous tunnel roundtrip each)
        s = jax.device_get(s)
        pm = np.asarray(s.phi_M[1])
        traces["t"].append(float(s.t))
        traces["phi_M_probe"].append(float(pm[probe]))
        traces["phi_M_min"].append(float(pm.min()))
        traces["phi_M_max"].append(float(pm.max()))
        if outdir:
            snapshots.append(
                {
                    "t": float(s.t),
                    "phi_M": pm,
                    "phi_e": np.asarray(s.phi[0]),
                    "phi_i": np.asarray(s.phi[1]),
                    **{
                        f"c_{ion.name}_{tag}": np.asarray(s.c[tag][k])
                        for tag in s.c
                        for k, ion in enumerate(sim.ions)
                    },
                }
            )

    t0 = time.perf_counter()
    state, it_emi, it_knp = sim.run(
        state, n_steps, save_every=save_every, observer=observer,
        verbose=verbose,
    )
    wall = time.perf_counter() - t0
    if verbose:
        print(
            f"res {resolution}: {n_steps} steps in {wall:.1f}s "
            f"({wall / n_steps * 1e3:.1f} ms/step); "
            f"avg emi it {it_emi.mean():.1f}, avg knp it {it_knp.mean():.1f}"
        )
    if outdir:
        out = Path(outdir)
        out.mkdir(parents=True, exist_ok=True)
        np.savez(out / f"run2d_res{resolution}.npz",
                 **{k: np.asarray(v) for k, v in traces.items()})
        np.savez(out / f"run2d_res{resolution}_snapshots.npz",
                 **{f"{i}_{k}": v for i, snap in enumerate(snapshots)
                    for k, v in snap.items()})
    return state, it_emi, it_knp, traces


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolutions", type=int, nargs="+", default=[1])
    ap.add_argument("--Tstop", type=float, default=1.0e-2)
    ap.add_argument("--direct", action="store_true")
    ap.add_argument("--outdir", default="results/2D")
    args = ap.parse_args()

    avg_emi, avg_knp = [], []
    for res in args.resolutions:
        _, it_emi, it_knp, traces = solve_system(
            res, Tstop=args.Tstop, direct=args.direct, outdir=args.outdir
        )
        avg_emi.append(it_emi.mean())
        avg_knp.append(it_knp.mean())
        print("phi_M probe trace (V):",
              np.array2string(np.asarray(traces["phi_M_probe"]), precision=4))
    print("average iterations emi:", avg_emi)
    print("average iterations knp:", avg_knp)
