#!/usr/bin/env python3
"""Figures for the astrocyte-depolarization runs (analog of the
reference's examples/local_astrocyte_depolarization/make_figures.py):
membrane-potential and ECS-potassium time series from the driver's
traces.npz."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results/baseline")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    res = Path(args.results)
    d = np.load(res / "traces.npz")
    out = args.out or str(res / "figures.png")

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    t = np.asarray(d["t"])
    axes[0].plot(t, d["phi_M_neuron"], label="neuron")
    axes[0].plot(t, d["phi_M_glial"], label="glial")
    axes[0].set_xlabel("t (ms)")
    axes[0].set_ylabel(r"$\phi_M$ (mV)")
    axes[0].set_title("mean membrane potential")
    axes[0].legend()
    axes[1].plot(t, d["K_e_max"], label=r"$[K^+]_e$ max")
    axes[1].plot(t, d["K_e_min"], label=r"$[K^+]_e$ min")
    axes[1].set_xlabel("t (ms)")
    axes[1].set_ylabel("mM")
    axes[1].set_title("ECS potassium")
    axes[1].legend()
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
