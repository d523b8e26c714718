#!/usr/bin/env python3
"""Compare simulation traces against external reference traces (the
analog of the reference's results/compare_1D_3D.py and compare_tort.py,
which overlay 3-D results on a 1-D model's txt time series)."""

import argparse
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def normalize(x):
    """Shift/scale a trace to [0, 1] (compare_tort.py:114-126 analog)."""
    x = np.asarray(x, dtype=float)
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo) if hi > lo else x * 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("traces", help="traces.npz from run_stim_duration.py")
    ap.add_argument("--external", default=None,
                    help="two-column txt file: t value (e.g. a 1-D model)")
    ap.add_argument("--field", default="phi_M_glial")
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument("--out", default="compare.png")
    args = ap.parse_args()

    d = np.load(args.traces)
    t, y = np.asarray(d["t"]), np.asarray(d[args.field])
    if args.normalize:
        y = normalize(y)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t, y, label=f"3-D KNP-EMI ({args.field})")
    if args.external:
        ext = np.loadtxt(args.external)
        ye = normalize(ext[:, 1]) if args.normalize else ext[:, 1]
        ax.plot(ext[:, 0], ye, "--", label=Path(args.external).stem)
    ax.set_xlabel("t (ms)")
    ax.legend()
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
