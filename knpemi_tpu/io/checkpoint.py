"""Restorable simulation checkpoints.

The reference writes adios4dolfinx .bp function checkpoints every step
but never checkpoints the gating variables and implements no resume
(SURVEY.md section 5, "Checkpoint / resume").  Here the COMPLETE
:class:`SimState` pytree — concentrations, potentials, membrane
potential, ODE states AND parameters, time, step counter — round-trips
through a single compressed .npz, and ``Simulation.run`` continues from
any loaded state bit-exactly (tests/test_io.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..systems.types import SimState

_DICT_FIELDS = ("c", "phi", "phi_M", "ode_states", "ode_params")
_SCALAR_FIELDS = (
    "t", "step", "emi_iters", "knp_iters",
    "emi_ok", "knp_ok", "emi_res", "knp_res",
)


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


def save_checkpoint_orbax(path, state: SimState, **metadata):
    """Orbax backend: same complete-SimState checkpoint written as an
    orbax PyTree directory (async-friendly, multi-host-aware storage for
    large tissue runs; the npz backend stays the single-file default)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    payload = {
        "state": {
            f: {str(k): np.asarray(v) for k, v in getattr(state, f).items()}
            for f in _DICT_FIELDS
        },
        "scalars": {f: np.asarray(getattr(state, f)) for f in _SCALAR_FIELDS},
    }
    if metadata:
        payload["meta"] = {k: np.asarray(v) for k, v in metadata.items()}
    ocp.PyTreeCheckpointer().save(path, payload, force=True)


def load_checkpoint_orbax(path) -> Tuple[SimState, dict]:
    import orbax.checkpoint as ocp

    data = ocp.PyTreeCheckpointer().restore(Path(path).absolute())
    fields = {
        f: {int(k): jnp.asarray(v) for k, v in data["state"][f].items()}
        for f in _DICT_FIELDS
    }
    scalars = {f: jnp.asarray(v) for f, v in data["scalars"].items()}
    meta = dict(data.get("meta") or {})
    return SimState(**fields, **scalars), meta


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
