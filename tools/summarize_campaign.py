#!/usr/bin/env python3
"""Summarize a flagship campaign directory (traces.npz + campaign.log).

Produces the long-horizon evidence VERDICT r4 item 1 asks for: wall
time, per-phase step cost and Krylov iteration stability, the K_e
excursion/recovery, and neuron/glial membrane dynamics over the full
trajectory.  Prints one JSON block.

    python tools/summarize_campaign.py results/flagship_300ms/campaign_300ms \
        [--log results/flagship_300ms/campaign.log] [--stim-end 100]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np


def parse_log(path: Path):
    """Per-chunk (step_end, ms_per_step, emi_it, knp_it) from the driver's
    verbose lines, concatenated across resumed legs."""
    rows = []
    pat = re.compile(
        r"steps (\d+)\.\.(\d+): ([0-9.]+) ms/step, emi_it=(\d+) knp_it=(\d+)")
    off = 0
    for line in path.read_text().splitlines():
        m = pat.search(line)
        if m:
            a, b, ms, ie, ik = (float(g) for g in m.groups())
            rows.append((b + off, ms, ie, ik, b - a + 1))
        # a resumed leg restarts its local step numbering at 1
        m2 = re.search(r"resumed from .*step (\d+)", line)
        if m2:
            off = int(m2.group(1))
    return np.asarray(rows) if rows else np.zeros((0, 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--log", default=None)
    ap.add_argument("--stim-end", type=float, default=100.0,
                    help="end of the pulsed-source phase (ms)")
    args = ap.parse_args()
    res = Path(args.results)
    tr = np.load(res / "traces.npz")
    t = tr["t"]
    out = {
        "t_final_ms": float(t[-1]),
        "n_saves": int(len(t)),
        "K_e": {
            "baseline_mM": float(tr["K_e_max"][0]),
            "peak_mM": float(tr["K_e_max"].max()),
            "peak_at_ms": float(t[int(tr["K_e_max"].argmax())]),
            "final_mM": float(tr["K_e_max"][-1]),
            # recovery fraction of the excursion at end of run
            "recovered_frac": float(
                (tr["K_e_max"].max() - tr["K_e_max"][-1])
                / max(tr["K_e_max"].max() - tr["K_e_max"][0], 1e-30)),
        },
        "phi_M_neuron_mV": {
            "min": float(tr["phi_M_neuron"].min()),
            "max": float(tr["phi_M_neuron"].max()),
            "final": float(tr["phi_M_neuron"][-1]),
        },
        "phi_M_glial_mV": {
            "min": float(tr["phi_M_glial"].min()),
            "max": float(tr["phi_M_glial"].max()),
            "final": float(tr["phi_M_glial"][-1]),
        },
    }
    # crude AP count: depolarization crossings of -20 mV (mean trace)
    v = tr["phi_M_neuron"]
    out["neuron_ap_crossings"] = int(
        ((v[1:] > -20) & (v[:-1] <= -20)).sum())

    log = Path(args.log) if args.log else res.parent / "campaign.log"
    if log.exists():
        rows = parse_log(log)
        if len(rows):
            dt_ms = t[-1] / rows[-1][0] if rows[-1][0] else 0.1
            t_chunk = rows[:, 0] * dt_ms
            stim = t_chunk <= args.stim_end
            def phase(sel):
                r = rows[sel]
                return {
                    "chunks": int(len(r)),
                    "ms_per_step_mean": round(float(r[:, 1].mean()), 1),
                    "ms_per_step_p90": round(
                        float(np.percentile(r[:, 1], 90)), 1),
                    "emi_it": [int(r[:, 2].min()), int(r[:, 2].max())],
                    "knp_it": [int(r[:, 3].min()), int(r[:, 3].max())],
                }
            out["stimulated_phase"] = phase(stim)
            if (~stim).any():
                out["relaxation_phase"] = phase(~stim)
            # chunk step counts come from each log line itself (a crash
            # + resume makes consecutive step numbers overlap, so a
            # diff across rows would go negative at the seam); this
            # counts ALL stepped time including the re-done post-crash
            # steps
            out["wall_min_stepping"] = round(
                float((rows[:, 1] * rows[:, 4]).sum() / 6e4), 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
