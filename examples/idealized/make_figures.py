#!/usr/bin/env python3
"""Figures for the idealized runs: membrane-potential and concentration
traces (analog of examples/idealized_geometries/make_figures.py in the
reference, which point-evaluates adios4dolfinx checkpoints; here the
traces come from run_2d.py's saved npz)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results/2D")
    ap.add_argument("--resolution", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    res = Path(args.results)
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
