#!/usr/bin/env python3
"""Calibrate initial conditions: step the closed compartment ODE system to
its dynamic steady state.

Equivalent of the reference's
examples/calibrate_initial_conditions/run_calibration.py: integrates the
14-state calibration model for 10,000 steps of 0.1 ms (run_calibration.py:65-66)
and prints the converged state in copy-paste form for the PDE drivers
(the printed values correspond to run_stim_duration.py:232-242).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from knpemi_tpu.models import get_model
from knpemi_tpu.models.engine import rk4_step


def run(n_steps=10_000, dt=0.1, n_sub=5, stim_amplitude=0.0, plot=None):
    model = get_model("calibration")
    y = jnp.asarray(model.init_states())
    p = jnp.asarray(model.init_params(stim_amplitude=stim_amplitude))
    h = dt / n_sub

    @jax.jit
    def step(y, t):
        def sub(y, i):
            return rk4_step(model.rhs, t + i * h, y, p, h), None

        y, _ = jax.lax.scan(sub, y, jnp.arange(n_sub))
        return y

    traj = []
    t = 0.0
    for k in range(n_steps):
        y = step(y, t)
        t += dt
        if plot and k % 50 == 0:
            traj.append(np.asarray(y))

    y = np.asarray(y)
    names = model.state_names
    print("# converged state after", n_steps * dt, "ms")
    for n, v in zip(names, y):
        print(f"{n}_init = {v!r}")

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        traj = np.stack(traj)
        ts = np.arange(len(traj)) * 50 * dt
        fig, axes = plt.subplots(3, 1, figsize=(8, 10), sharex=True)
        axes[0].plot(ts, traj[:, 3], label="V_n")
        axes[0].plot(ts, traj[:, 4], label="V_g")
        axes[0].set_ylabel("mV")
        axes[0].legend()
        for i, n in enumerate(names[5:8]):
            axes[1].plot(ts, traj[:, 5 + i], label=n)
        axes[1].set_ylabel("K (mM)")
        axes[1].legend()
        for i, n in enumerate(names[8:14]):
            axes[2].plot(ts, traj[:, 8 + i], label=n)
        axes[2].set_ylabel("Na/Cl (mM)")
        axes[2].legend()
        axes[2].set_xlabel("t (ms)")
        fig.savefig(plot, dpi=120, bbox_inches="tight")
        print("wrote", plot)
    return y


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()
    run(n_steps=args.steps, dt=args.dt, plot=args.plot)
