#!/usr/bin/env python3
"""Measure EMI solve time vs V-cycle strength (nu, theta) on the
current backend — picks the round-2 default.

    python tools/tune_emi_cycle.py [--res 1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    from run_3d import build_simulation
    from knpemi_tpu.sim.stepper import SolverOptions

    for nu, theta in [(1, 0.08), (2, 0.08), (3, 0.08), (2, 0.04)]:
        sim = build_simulation(
            resolution=args.res, g_syn_bar=10.0,
            solver_options=SolverOptions(
                rtol_emi=1e-5, rtol_knp=1e-7, mg_nu=nu, mg_theta=theta,
            ),
        )
        state = sim.init_state()
        chunk = sim._chunk(1)
        state, _ = chunk(state)
        jax.block_until_ready(state.t)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, (ce, ck, _) = chunk(state)
        jax.block_until_ready(state.t)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(
            f"nu={nu} theta={theta}: {dt:7.2f} ms/step  "
            f"emi_it={int(ce[-1])} knp_it={int(ck[-1])}"
        )


if __name__ == "__main__":
    main()
