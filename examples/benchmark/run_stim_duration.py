#!/usr/bin/env python3
"""Benchmark scenario: ECS + one glial cell, membrane split into three
tagged regions (5/6/7) each carrying its own Kir membrane model.

TPU-native equivalent of the reference driver
examples/benchmark/run_stim_duration.py: same unit system (mV/ms/cm),
parameters (run_stim_duration.py:190-250), a box source injecting K+ and
removing Na- at t > 0.2 ms (f_value 500, run_stim_duration.py:253-281),
dt 0.1 ms, Tstop 5 ms.  The reference runs on an emimesh two-cell
reconstruction; by default this uses the synthetic two-cell tissue mesh
with the same tag structure (pass --mesh for a remarked emimesh XDMF).
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

from knpemi_tpu.mesh.tissue import two_cell_tissue_mesh
from knpemi_tpu.ops.geometry import build_geometry
from knpemi_tpu.systems.types import Ion, PhysicalParams
from knpemi_tpu.models import setup_membrane_model, get_model
from knpemi_tpu.sim import Simulation, SolverOptions
from knpemi_tpu.sim.config import source_box_indicator_q

# Initial concentrations (run_stim_duration.py:205-217; note the driver
# overrides Cl to enforce zero net background charge, lines 215-217)
K_E_INIT = 3.092970607490389
K_G_INIT = 99.3100014897692
NA_E_INIT = 144.60625137617149
NA_G_INIT = 15.775818906083778
CL_E_INIT = NA_E_INIT + K_E_INIT
CL_G_INIT = NA_G_INIT + K_G_INIT

D_NA, D_K, D_CL = 1.33e-8, 1.96e-8, 2.03e-8
LAMBDA_E, LAMBDA_I = 0.5, 3.4  # run_stim_duration.py:219-220


def build_simulation(resolution=0, direct=False, f_value=500.0, dtype=None,
                     mesh=None):
    if mesh is None:
        mesh = two_cell_tissue_mesh(resolution)
    geom = build_geometry(mesh)
    assert sorted(geom.membranes) == [5, 6, 7]

    dt = 0.1
    params = PhysicalParams(
        dt=dt, F=96500e3, R=8.315e3, temperature=307e3, C_M=1.0,
        n_steps_ODE=25, rho_z=-1.0, rho={0: 0.0, 1: 0.0},
    )

    def D_sub(D):
        return {0: D / LAMBDA_E**2, 1: D / LAMBDA_I**2}

    # box source (t > 0.2 ms gate; run_stim_duration.py:263-281)
    lo = (2100e-7, 2100e-7, 2100e-7)
    hi = (2900e-7, 2900e-7, 2500e-7)
    box_q = source_box_indicator_q(geom, 0, lo, hi)

    ions = [
        Ion("K", 1.0, D_sub(D_K), {0: K_E_INIT, 1: K_G_INIT},
            f_source_q={0: f_value * box_q}),
        Ion("Cl", -1.0, D_sub(D_CL), {0: CL_E_INIT, 1: CL_G_INIT}),
        Ion("Na", 1.0, D_sub(D_NA), {0: NA_E_INIT, 1: NA_G_INIT},
            f_source_q={0: -f_value * box_q}),
    ]

    stim_params = {"stimulus": {"stim_amplitude": 0.0},
                   "stimulus_locator": None}
    glial = get_model("glial")
    # three membrane models of the same ODE, one per facet tag
    # (run_stim_duration.py:163-166)
    mem_models = setup_membrane_model(
        stim_params, params, {5: glial, 6: glial, 7: glial}, geom, ions
    )
    for mm in mem_models:
        for name, v in [("K_e", K_E_INIT), ("Na_e", NA_E_INIT),
                        ("Cl_e", CL_E_INIT), ("K_i", K_G_INIT),
                        ("Na_i", NA_G_INIT), ("Cl_i", CL_G_INIT)]:
            mm.params0[:, mm.param_index(name)] = v

    sim = Simulation(
        geom, ions, params, mem_models,
        SolverOptions(direct=direct, rtol_emi=1e-5, rtol_knp=1e-7),
        source_gate=lambda t: jnp.where(t > 0.2, 1.0, 0.0),
        dtype=dtype or (jnp.float32 if jax.devices()[0].platform == "tpu"
                        else jnp.float64),
    )
    return sim


def _probe_points(sim):
    """Evaluation points mirroring the reference's hand-picked ECS / ICS /
    membrane coordinates (reference make_figures.py:126-143): the ECS dof
    nearest the source-box center, the ICS dof nearest the glial
    centroid, and the membrane-5 dof nearest that ICS point."""
    ecs = sim.geom.subdomains[0]
    ics = sim.geom.subdomains[1]
    mem = sim.geom.membranes[5]
    box_c = np.array([2500e-7, 2500e-7, 2300e-7])[: ecs.coords.shape[1]]
    p_e = int(np.argmin(((ecs.coords - box_c) ** 2).sum(axis=1)))
    cen = ics.coords.mean(axis=0)
    p_i = int(np.argmin(((ics.coords - cen) ** 2).sum(axis=1)))
    p_m = int(np.argmin(((mem.coords - ics.coords[p_i]) ** 2).sum(axis=1)))
    return p_e, p_i, p_m


def solve_system(resolution=0, Tstop=5.0, direct=False, verbose=True,
                 outdir=None, save_every=1):
    sim = build_simulation(resolution, direct=direct)
    state = sim.init_state()
    n_steps = int(round(Tstop / sim.params.dt))
    ion_idx = {ion.name: k for k, ion in enumerate(sim.ions)}
    p_e, p_i, p_m = _probe_points(sim)
    mem = sim.geom.membranes[5]
    traces = {k: [] for k in (
        "t", "Na_e", "K_e", "Cl_e", "phi_e", "Na_i", "K_i", "Cl_i",
        "phi_i", "phi_M", "tr_K_e", "tr_K_i", "tr_Na_e", "tr_Na_i",
    )}

    def observer(s):
        s = jax.device_get(s)  # one host transfer for all probes
        traces["t"].append(float(s.t))
        for name in ("Na", "K", "Cl"):
            traces[f"{name}_e"].append(float(s.c[0][ion_idx[name], p_e]))
            traces[f"{name}_i"].append(float(s.c[1][ion_idx[name], p_i]))
        traces["phi_e"].append(float(s.phi[0][p_e]))
        traces["phi_i"].append(float(s.phi[1][p_i]))
        traces["phi_M"].append(float(s.phi_M[5][p_m]))
        # two-sided membrane traces for the Nernst-potential panels
        for name in ("K", "Na"):
            k = ion_idx[name]
            traces[f"tr_{name}_e"].append(
                float(s.c[0][k, mem.mem_to_ecs[p_m]])
            )
            traces[f"tr_{name}_i"].append(
                float(s.c[1][k, mem.mem_to_ics[p_m]])
            )

    t0 = time.perf_counter()
    state, it_emi, it_knp = sim.run(state, n_steps, save_every=save_every,
                                    observer=observer, verbose=verbose)
    wall = time.perf_counter() - t0
    if verbose:
        print(
            f"{n_steps} steps in {wall:.1f}s; avg it emi {it_emi.mean():.1f} "
            f"knp {it_knp.mean():.1f}"
        )
        for m in sorted(sim.geom.membranes):
            pm = np.asarray(state.phi_M[m])
            print(f"  membrane {m}: phi_M in [{pm.min():.2f}, {pm.max():.2f}] mV")
        print(f"  K_e in [{float(state.c[0][0].min()):.2f}, "
              f"{float(state.c[0][0].max()):.2f}] mM")
    if outdir:
        out = Path(outdir)
        out.mkdir(parents=True, exist_ok=True)
        np.savez(out / "traces.npz",
                 **{k: np.asarray(v) for k, v in traces.items()})
        # txt exports for external comparison, as the reference writes
        # (make_figures.py:227-252: phi_M.txt, K_ECS.txt, ...)
        for fname, key in [("phi_M", "phi_M"), ("K_ECS", "K_e"),
                           ("K_ICS", "K_i"), ("Na_ECS", "Na_e"),
                           ("Na_ICS", "Na_i")]:
            np.savetxt(out / f"{fname}.txt", np.asarray(traces[key]),
                       fmt="%.10f")
        print(f"wrote {out}/traces.npz (+txt exports)")
    return state, it_emi, it_knp


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=0)
    ap.add_argument("--Tstop", type=float, default=5.0)
    ap.add_argument("--direct", action="store_true")
    ap.add_argument("--mesh", default=None,
                    help="remarked emimesh XDMF instead of synthetic tissue")
    ap.add_argument("--outdir", default="results/benchmark",
                    help="directory for traces.npz / txt exports")
    args = ap.parse_args()
    mesh = None
    if args.mesh:
        from knpemi_tpu.io import read_mesh

        mesh = read_mesh(args.mesh)
    solve_system(args.resolution, Tstop=args.Tstop, direct=args.direct,
                 outdir=args.outdir)
