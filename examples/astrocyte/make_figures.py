#!/usr/bin/env python3
"""Figures for the astrocyte-depolarization runs (analog of the
reference's examples/local_astrocyte_depolarization/make_figures.py).

Three modes, mirroring the reference's pipeline:

* default: membrane-potential and ECS-potassium summaries from the
  driver's traces.npz;
* ``--probe x,y,z`` (repeatable): POST-HOC point evaluation from the
  saved XDMF field series — arbitrary locations chosen after the run,
  no pre-registered probes needed (reference make_figures.py:29,54-62:
  adios4dolfinx.read_function + scifem.evaluate_function);
* ``--compare dir [dir ...]``: normalized multi-config comparison of
  the glial depolarization across runs (reference make_figures.py:
  336-347 ``normalize`` and results/compare_tort.py:114-126).
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


def summary_figure(res: Path, out: str):
    d = np.load(res / "traces.npz")
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


def probe_figure(res: Path, points, out: str):
    """Traces of ECS [K+], [Na+] and phi at arbitrary points, evaluated
    from the saved field series (not from pre-registered probes)."""
    from knpemi_tpu.io import TimeSeriesReader

    series = sorted(res.glob("results_sub_0.xdmf"))
    if not series:
        raise SystemExit(f"no saved field series under {res} — rerun the "
                         "driver with an --outdir")
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    with TimeSeriesReader(series[0]) as r:
        t = np.asarray(r.times)
        for name, ax, lab in (
            ("c_K_0", axes[0], r"$[K^+]_e$ (mM)"),
            ("c_Na_0", axes[1], r"$[Na^+]_e$ (mM)"),
            ("phi_0", axes[2], r"$\phi_e$ (V)"),
        ):
            tr = r.evaluate(name, points)  # (n_times, n_pts)
            for j, p in enumerate(points):
                um = ", ".join(f"{x * 1e4:.0f}" for x in p)
                ax.plot(t, tr[:, j], label=f"({um}) um")
            ax.set_xlabel("t (ms)")
            ax.set_ylabel(lab)
            ax.legend(fontsize=7)
    fig.suptitle("post-hoc point probes (from saved fields)")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


def panel_figure(res: Path, point, out: str):
    """Reference-style multi-field publication panel (astrocyte
    make_figures.py:135-334 ``plot_3D_concentration``): at one spatial
    point, traces of [K+], [Na+], [Cl-] and phi in EVERY subdomain that
    saved a field series (ECS / neuron / glial), each evaluated at the
    subdomain's nearest dof to the point."""
    from knpemi_tpu.io import TimeSeriesReader

    names = {0: "ECS", 1: "neuron", 2: "glial"}
    series = sorted(res.glob("results_sub_*.xdmf"))
    if not series:
        raise SystemExit(f"no saved field series under {res}")
    rows = []
    for f in series:
        tag = int(f.stem.rsplit("_", 1)[1])
        rows.append((tag, TimeSeriesReader(str(f))))
    fig, axes = plt.subplots(len(rows), 4,
                             figsize=(17, 3.4 * len(rows)), squeeze=False)
    p = np.asarray(point, float)
    for r, (tag, rd) in enumerate(rows):
        # snap to the subdomain's nearest dof (the point generally lies
        # inside only one subdomain's submesh)
        q = rd.points[np.argmin(((rd.points - p) ** 2).sum(1))]
        t = np.asarray(rd.times)
        for c, (fld, lab) in enumerate([
            (f"c_K_{tag}", "$[K^+]$ (mM)"),
            (f"c_Na_{tag}", "$[Na^+]$ (mM)"),
            (f"c_Cl_{tag}", "$[Cl^-]$ (mM)"),
            (f"phi_{tag}", r"$\phi$ (mV)"),
        ]):
            tr = rd.evaluate(fld, [q])[:, 0]
            ax = axes[r][c]
            ax.plot(t, tr, linewidth=2.5,
                    color={0: "b", 1: "r", 2: "m"}.get(tag, "k"))
            ax.set_title(f"{names.get(tag, tag)}: {lab}", fontsize=10)
            if r == len(rows) - 1:
                ax.set_xlabel("t (ms)")
    um = ", ".join(f"{x * 1e4:.1f}" for x in p)
    fig.suptitle(f"field traces at ({um}) um (nearest dof per subdomain)")
    fig.tight_layout()
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


def _normalize(v):
    """Map a trace onto [0, 1] (reference make_figures.py:336-347)."""
    v = np.asarray(v, float)
    lo, hi = v.min(), v.max()
    return (v - lo) / (hi - lo) if hi > lo else np.zeros_like(v)


def compare_figure(dirs, out: str):
    """Normalized glial depolarization + K_e across configurations
    (reference compare_tort.py:114-126)."""
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for d in dirs:
        d = Path(d)
        tr = np.load(d / "traces.npz")
        t = np.asarray(tr["t"])
        lbl = d.name
        axes[0].plot(t, tr["phi_M_glial"], label=lbl)
        axes[1].plot(t, _normalize(tr["phi_M_glial"]), label=lbl)
        axes[2].plot(t, tr["K_e_max"], label=lbl)
    axes[0].set_title(r"glial $\phi_M$ (mV)")
    axes[1].set_title(r"glial $\phi_M$, normalized")
    axes[2].set_title(r"$[K^+]_e$ max (mM)")
    for ax in axes:
        ax.set_xlabel("t (ms)")
        ax.legend(fontsize=8)
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results/baseline")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--probe", action="append", default=None, metavar="X,Y,Z",
        help="post-hoc probe point (cm), repeatable",
    )
    ap.add_argument(
        "--compare", nargs="+", default=None, metavar="DIR",
        help="results dirs for a normalized multi-config comparison",
    )
    ap.add_argument(
        "--panel", default=None, metavar="X,Y,Z",
        help="multi-field panel (K/Na/Cl/phi per subdomain) at a point "
             "(cm) — reference plot_3D_concentration parity",
    )
    args = ap.parse_args()

    res = Path(args.results)
    if args.panel:
        p = [float(x) for x in args.panel.split(",")]
        panel_figure(res, p, args.out or str(res / "panel.png"))
        return
    if args.compare:
        compare_figure(args.compare, args.out or "compare_configs.png")
        return
    if args.probe:
        pts = np.array([[float(x) for x in p.split(",")]
                        for p in args.probe])
        probe_figure(res, pts, args.out or str(res / "probes.png"))
        return
    summary_figure(res, args.out or str(res / "figures.png"))


if __name__ == "__main__":
    main()
