#!/usr/bin/env python3
"""Idealized 3-D geometry: 4 axons in an ECS box (HH membranes).

TPU-native equivalent of the reference driver
examples/idealized_geometries/run_3D.py: same physics and parameters as
the 2-D case (run_3D.py:176-256) with Tstop = 2 ms and an unstimulated
membrane by default (g_syn_bar = 0, run_3D.py:265); the mesh is the
4-axon box as face-consistent tets (see mesh/generators.py).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from knpemi_tpu.mesh import idealized_3d_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.types import Ion, PhysicalParams
from knpemi_tpu.models import setup_membrane_model, get_model
from knpemi_tpu.sim import Simulation, SolverOptions

from run_2d import (  # shared calibrated constants (run_3D.py:190-197)
    NA_I_INIT, NA_E_INIT, K_I_INIT, K_E_INIT, CL_E_INIT, CL_I_INIT,
    D_NA, D_K, D_CL, default_dtype,
)


def build_simulation(
    resolution: int = 0,
    direct: bool = False,
    g_syn_bar: float = 0.0,
    dt: float = 1.0e-4,
    l: int = 2,
    dtype=None,
    solver_options: SolverOptions | None = None,
):
    if dtype is None:
        dtype = default_dtype()
    mesh = idealized_3d_mesh(resolution, l=l)
    geom = build_geometry(mesh)

    params = PhysicalParams(
        dt=dt, F=96485.0, R=8.314, temperature=300.0, C_M=0.02,
        n_steps_ODE=25, rho_z=-1.0, rho={0: 0.0, 1: 0.0},
    )
    ions = [
        Ion("K", 1.0, {0: D_K, 1: D_K}, {0: K_E_INIT, 1: K_I_INIT}),
        Ion("Cl", -1.0, {0: D_CL, 1: D_CL}, {0: CL_E_INIT, 1: CL_I_INIT}),
        Ion("Na", 1.0, {0: D_NA, 1: D_NA}, {0: NA_E_INIT, 1: NA_I_INIT}),
    ]
    stim_params = {
        "stimulus": {"stim_amplitude": g_syn_bar},
        "stimulus_locator": lambda x: x[0] < 20e-6,  # run_3D.py:267
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


def solve_system(resolution: int, Tstop: float = 2.0e-3, direct: bool = False,
                 g_syn_bar: float = 0.0, save_every: int = 5,
                 verbose: bool = True):
    sim = build_simulation(resolution, direct=direct, g_syn_bar=g_syn_bar)
    state = sim.init_state()
    n_steps = int(round(Tstop / sim.params.dt))
    t0 = time.perf_counter()
    state, it_emi, it_knp = sim.run(state, n_steps, save_every=save_every,
                                    verbose=verbose)
    wall = time.perf_counter() - t0
    if verbose:
        print(
            f"res {resolution}: {n_steps} steps in {wall:.1f}s; "
            f"avg emi it {it_emi.mean():.1f}, avg knp it {it_knp.mean():.1f}"
        )
    return state, it_emi, it_knp


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolutions", type=int, nargs="+", default=[0])
    ap.add_argument("--Tstop", type=float, default=2.0e-3)
    ap.add_argument("--g-syn-bar", type=float, default=0.0)
    ap.add_argument("--direct", action="store_true")
    args = ap.parse_args()

    avg_emi, avg_knp = [], []
    for res in args.resolutions:
        _, it_emi, it_knp = solve_system(
            res, Tstop=args.Tstop, g_syn_bar=args.g_syn_bar,
            direct=args.direct,
        )
        avg_emi.append(it_emi.mean())
        avg_knp.append(it_knp.mean())
    print("average number of iterations emi iterative solver:", avg_emi)
    print("average number of iterations knp iterative solver:", avg_knp)
