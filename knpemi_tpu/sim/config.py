"""Unified YAML configuration for all drivers.

The reference only exposes configuration for the astrocyte driver
(argparse -c name -> config_files/{name}.yml, run_stim_duration.py:502-516)
with hard-coded parameters everywhere else; SURVEY.md section 5 calls for
one schema covering all drivers.  Keys (reference config_files/baseline.yml
kept verbatim, plus generalizations):

  mesh_file / mesh: path to an XDMF mesh, or a builtin mesh spec
      {kind: idealized_2d|idealized_3d|two_cell|astrocyte_tissue|mms,
       resolution: int}
  fname: output directory name
  Tstop, dt: simulation window
  f_value, period, delay, pulse_width, end_time: pulsed ECS source
  x_L..z_U: source box
  lambda_e, lambda_i: tortuosities
  save_frequency: steps between outputs
  solver: {direct, rtol_emi, atol_emi, rtol_knp, atol_knp, maxiter,
           restart, min_iter_knp, ...}  (any SolverOptions field)
  dtype: float32|float64
  g_syn_bar, stimulus_x_max: membrane ODE synaptic stimulus
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..ops import quadrature
from ..ops.geometry import DiscreteGeometry

DEFAULTS = dict(
    dt=0.1,
    Tstop=10.0,
    f_value=0.0,
    period=10.0,
    delay=1.0,
    pulse_width=1.0,
    end_time=100.0,
    lambda_e=1.6,
    lambda_i=3.4,
    save_frequency=5,
    g_syn_bar=0.0,
    dtype=None,
    solver=dict(),
)


def load_config(path) -> dict:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    out = dict(DEFAULTS)
    out.update(cfg or {})
    return out


def source_box_indicator_q(
    geom: DiscreteGeometry, tag: int, lo, hi, value: float = 1.0
) -> np.ndarray:
    """Indicator of the source box, evaluated at cell quadrature points of
    subdomain `tag` — the quadrature analog of the reference's UFL
    ``conditional(And(...))`` box source (astrocyte
    run_stim_duration.py:316-338)."""
    sub = geom.subdomains[tag]
    bary, _ = quadrature.cell_rule(geom.dim)
    Xq = np.einsum("qk,ckd->cqd", bary, sub.coords[sub.cells])
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    inside = ((Xq > lo) & (Xq < hi)).all(axis=-1)
    return value * inside.astype(np.float64)


def pulsed_source_gate(config):
    """jax-traceable t -> {0, 1} gate for the pulsed ECS source:
    on iff delay <= t <= end_time and (t - delay) mod period < pulse_width
    (run_stim_duration.py:316-338, 485)."""
    import jax.numpy as jnp

    delay = float(config["delay"])
    period = float(config["period"])
    width = float(config["pulse_width"])
    end = float(config["end_time"])

    def gate(t):
        on = (t >= delay) & (t <= end) & (jnp.mod(t - delay, period) < width)
        return jnp.where(on, 1.0, 0.0)

    return gate
