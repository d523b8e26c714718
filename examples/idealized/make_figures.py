#!/usr/bin/env python3
"""Figures for the idealized runs: membrane-potential and concentration
traces (analog of examples/idealized_geometries/make_figures.py in the
reference, which point-evaluates adios4dolfinx checkpoints; here the
traces come from run_2d.py's saved npz).

``--panel`` reproduces the reference's 3x3 publication panel
(make_figures.py:120-204 ``plot_concentration``): ECS and ICS Na/K/Cl
concentration traces at probe points, plus phi_M and the Nernst
potentials E_K, E_Na at a membrane point.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def panel_figure(res: Path, resolution: int, out: str,
                 point_e=None, point_i=None, point_m=None):
    """3x3 trace panel at probe points, from the saved snapshots npz.

    Default probes mirror the reference's mid-axon choices: ECS just
    outside the strip, ICS inside it, membrane at mid-axon.  Points are
    snapped to the nearest dof of the matching space (the analog of
    scifem.evaluate_function on the checkpoint fields)."""
    from knpemi_tpu.mesh.generators import idealized_2d_mesh
    from knpemi_tpu.ops.geometry import build_geometry

    s = np.load(res / f"run2d_res{resolution}_snapshots.npz")
    steps = sorted({int(k.split("_")[0]) for k in s.files})
    geom = build_geometry(idealized_2d_mesh(resolution))

    point_e = np.asarray(point_e if point_e is not None else [31e-6, 3.5e-6])
    point_i = np.asarray(point_i if point_i is not None else [31e-6, 2.0e-6])
    point_m = np.asarray(point_m if point_m is not None else [31e-6, 3.0e-6])

    de = int(np.argmin(((geom.subdomains[0].coords - point_e) ** 2).sum(1)))
    di = int(np.argmin(((geom.subdomains[1].coords - point_i) ** 2).sum(1)))
    mem = geom.membranes[1]
    dm = int(np.argmin(((mem.coords - point_m) ** 2).sum(1)))
    # membrane-side volume dofs for the Nernst traces
    me = int(np.argmin(((geom.subdomains[0].coords - point_m) ** 2).sum(1)))
    mi = int(np.argmin(((geom.subdomains[1].coords - point_m) ** 2).sum(1)))

    t = np.array([s[f"{k}_t"][()] if f"{k}_t" in s.files else np.nan
                  for k in steps]) * 1e3

    def series(name, dof):
        return np.array([s[f"{k}_{name}"][dof] for k in steps])

    RT_F = 8.314 * 300.0 / 96485.0  # V
    K_e, K_i = series("c_K_0", me), series("c_K_1", mi)
    Na_e, Na_i = series("c_Na_0", me), series("c_Na_1", mi)

    rows = [
        [("$[Na^+]_e$ (mM)", series("c_Na_0", de), "b"),
         ("$[K^+]_e$ (mM)", series("c_K_0", de), "b"),
         ("$[Cl^-]_e$ (mM)", series("c_Cl_0", de), "b")],
        [("$[Na^+]_i$ (mM)", series("c_Na_1", di), "r"),
         ("$[K^+]_i$ (mM)", series("c_K_1", di), "r"),
         ("$[Cl^-]_i$ (mM)", series("c_Cl_1", di), "r")],
        [(r"$\phi_M$ (mV)", series("phi_M", dm) * 1e3, "k"),
         ("$E_K$ (mV)", RT_F * np.log(K_e / K_i) * 1e3, "k"),
         ("$E_{Na}$ (mV)", RT_F * np.log(Na_e / Na_i) * 1e3, "k")],
    ]
    fig, axes = plt.subplots(3, 3, figsize=(13, 10))
    for r, row in enumerate(rows):
        for c, (lab, y, color) in enumerate(row):
            axes[r][c].plot(t, y, linewidth=2.5, color=color)
            axes[r][c].set_title(lab)
            if r == 2:
                axes[r][c].set_xlabel("t (ms)")
    fig.suptitle(
        f"res {resolution}: ECS probe {point_e * 1e6} um, "
        f"ICS {point_i * 1e6} um, membrane {point_m * 1e6} um"
    )
    fig.tight_layout()
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results/2D")
    ap.add_argument("--resolution", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--panel", action="store_true",
                    help="3x3 concentration/potential panel at probe "
                         "points (reference plot_concentration parity)")
    args = ap.parse_args()

    res = Path(args.results)
    if args.panel:
        panel_figure(
            res, args.resolution,
            args.out or str(res / f"panel_res{args.resolution}.png"),
        )
        return
    d = np.load(res / f"run2d_res{args.resolution}.npz")
    out = args.out or str(res / f"figures_res{args.resolution}.png")

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    t_ms = np.asarray(d["t"]) * 1e3
    axes[0].plot(t_ms, np.asarray(d["phi_M_probe"]) * 1e3, "-o", ms=3,
                 label="probe (mid-axon)")
    axes[0].plot(t_ms, np.asarray(d["phi_M_max"]) * 1e3, "--", lw=1,
                 label="max")
    axes[0].plot(t_ms, np.asarray(d["phi_M_min"]) * 1e3, "--", lw=1,
                 label="min")
    axes[0].set_xlabel("t (ms)")
    axes[0].set_ylabel(r"$\phi_M$ (mV)")
    axes[0].set_title("membrane potential")
    axes[0].legend()

    snaps = res / f"run2d_res{args.resolution}_snapshots.npz"
    if snaps.exists():
        s = np.load(snaps)
        last = max(int(k.split("_")[0]) for k in s.files)
        for name, style in [("c_K_0", "-"), ("c_Na_0", "--"), ("c_Cl_0", ":")]:
            key = f"{last}_{name}"
            if key in s.files:
                axes[1].plot(np.sort(s[key]), style, label=name)
        axes[1].set_title("final ECS concentrations (sorted dofs)")
        axes[1].set_ylabel("mM")
        axes[1].legend()
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
