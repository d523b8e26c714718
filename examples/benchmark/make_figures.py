#!/usr/bin/env python3
"""Figures for the benchmark (glial Kir) run — counterpart of the
reference's examples/benchmark/make_figures.py:26-263: a 3x3 summary of
bulk concentrations (ECS row, ICS row), the membrane potential and the
K+/Na+ Nernst potentials at fixed probe points, read from the driver's
traces.npz (run_stim_duration.py --outdir).  Where the reference
point-evaluates adios4dolfinx .bp checkpoints through scifem, this
framework records the point traces during the run (cheap host observer
between jitted chunks) and renders from the array file.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# mV/ms/cm unit system of the benchmark driver
# (reference make_figures.py:119-122)
TEMPERATURE = 307e3
F = 96500e3
R = 8.315e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results/benchmark")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    res = Path(args.results)
    d = np.load(res / "traces.npz")
    out = args.out or str(res / "summary.png")
    t = np.asarray(d["t"])

    # Nernst potentials from the two-sided membrane traces
    # (reference make_figures.py:160-162)
    E_K = R * TEMPERATURE / F * np.log(d["tr_K_e"] / d["tr_K_i"])
    E_Na = R * TEMPERATURE / F * np.log(d["tr_Na_e"] / d["tr_Na_i"])

    panels = [
        ("Na$^+$ concentration (ECS)", "[Na]$_e$ (mM)", d["Na_e"], "b"),
        ("K$^+$ concentration (ECS)", "[K]$_e$ (mM)", d["K_e"], "b"),
        ("Cl$^-$ concentration (ECS)", "[Cl]$_e$ (mM)", d["Cl_e"], "b"),
        ("Na$^+$ concentration (ICS)", "[Na]$_i$ (mM)", d["Na_i"], "r"),
        ("K$^+$ concentration (ICS)", "[K]$_i$ (mM)", d["K_i"], "r"),
        ("Cl$^-$ concentration (ICS)", "[Cl]$_i$ (mM)", d["Cl_i"], "r"),
        ("Membrane potential", r"$\phi_M$ (mV)", d["phi_M"], "C0"),
        ("Nernst potential K$^+$", r"$E_{K^+}$ (mV)", E_K, "C0"),
        ("Nernst potential Na$^+$", r"$E_{Na^+}$ (mV)", E_Na, "C0"),
    ]
    fig, axes = plt.subplots(3, 3, figsize=(11, 11))
    for ax, (title, ylabel, y, color) in zip(axes.ravel(), panels):
        ax.plot(t, y, linewidth=3, color=color)
        ax.set_title(title)
        ax.set_ylabel(ylabel)
    for ax in axes[-1]:
        ax.set_xlabel("time (ms)")
    fig.tight_layout()
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
