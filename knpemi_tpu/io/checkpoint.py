"""Restorable simulation checkpoints.

The reference writes adios4dolfinx .bp function checkpoints every step
but never checkpoints the gating variables and implements no resume
(SURVEY.md section 5, "Checkpoint / resume").  Here the COMPLETE
:class:`SimState` pytree — concentrations, potentials, membrane
potential, ODE states AND parameters, time, step counter — round-trips
through a single compressed .npz, and ``Simulation.run`` continues from
any loaded state bit-exactly (tests/test_checkpoint.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..systems.types import SimState

_DICT_FIELDS = ("c", "phi", "phi_M", "ode_states", "ode_params")
_SCALAR_FIELDS = ("t", "step", "emi_iters", "knp_iters")


def save_checkpoint(path, state: SimState, **metadata):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {}
    for f in _DICT_FIELDS:
        for tag, arr in getattr(state, f).items():
            payload[f"{f}__{tag}"] = np.asarray(arr)
    for f in _SCALAR_FIELDS:
        payload[f"scalar__{f}"] = np.asarray(getattr(state, f))
    for k, v in metadata.items():
        payload[f"meta__{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_checkpoint(path) -> Tuple[SimState, dict]:
    data = np.load(path)
    fields = {f: {} for f in _DICT_FIELDS}
    scalars = {}
    meta = {}
    for key in data.files:
        kind, _, rest = key.partition("__")
        if kind in _DICT_FIELDS:
            fields[kind][int(rest)] = jnp.asarray(data[key])
        elif kind == "scalar":
            scalars[rest] = jnp.asarray(data[key])
        elif kind == "meta":
            meta[rest] = data[key]
    state = SimState(**fields, **scalars)
    return state, meta
