"""f32 vs f64 compute-path agreement.

TPU v5e has no native f64; the TPU compute path runs f32 with
dtype-floored solver tolerances.  This test pins the f32/f64 agreement
over half an action potential on the idealized 2-D scenario.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402


def test_f32_matches_f64_over_ap():
    sim32 = build_simulation(resolution=1, dtype=jnp.float32)
    sim64 = build_simulation(resolution=1, dtype=jnp.float64)
    s32 = sim32.init_state()
    s64 = sim64.init_state()
    s32, _, _ = sim32.run(s32, 50, save_every=50)
    s64, _, _ = sim64.run(s64, 50, save_every=50)
    dphi = np.abs(np.asarray(s64.phi_M[1]) - np.asarray(s32.phi_M[1])).max()
    # f32 solves stop at their dtype-attainable residual floor; the
    # divergence must stay far below physiological scales (~100 mV)
    assert dphi < 2e-4, f"phi_M f32/f64 divergence {dphi * 1e3} mV"
    for tag in s64.c:
        rel = np.abs(
            (np.asarray(s64.c[tag]) - np.asarray(s32.c[tag]))
            / np.asarray(s64.c[tag])
        ).max()
        assert rel < 3e-3, f"concentration divergence {rel}"
