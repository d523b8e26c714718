"""Channel-model registry and the ODEModel container.

Mirrors the gotran-generated layout the reference uses
(mm_hh.py:7-131: init_state_values / init_parameter_values /
state_indices / parameter_indices / rhs) but as a declarative dataclass
around pure JAX functions; ion channel currents are an explicit output
(`currents`) instead of in-place writes to the parameter array
(mm_hh.py:220-225).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence

import numpy as np


@dataclasses.dataclass
class ODEModel:
    name: str
    state_names: Sequence[str]
    param_names: Sequence[str]
    default_states: np.ndarray
    default_params: np.ndarray
    rhs: Callable  # (t, y(S,), p(P,)) -> dy (S,)
    currents: Callable  # (t, y, p) -> tuple of per-ion currents
    current_names: Sequence[str]  # ion names, e.g. ("Na", "K", "Cl")

    def init_states(self, **overrides) -> np.ndarray:
        y = self.default_states.copy()
        for k, v in overrides.items():
            y[list(self.state_names).index(k)] = v
        return y

    def init_params(self, **overrides) -> np.ndarray:
        p = self.default_params.copy()
        for k, v in overrides.items():
            p[list(self.param_names).index(k)] = v
        return p

    # gotran-style index lookups (reference mm_hh.py:90-131)
    def state_indices(self, *names):
        idx = [list(self.state_names).index(n) for n in names]
        return idx if len(idx) > 1 else idx[0]

    def parameter_indices(self, *names):
        idx = [list(self.param_names).index(n) for n in names]
        return idx if len(idx) > 1 else idx[0]


_REGISTRY: Dict[str, ODEModel] = {}


def register_model(model: ODEModel) -> ODEModel:
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> ODEModel:
    from . import hh, glial, calibration, test_ode  # noqa: F401  (populate)

    return _REGISTRY[name]


def available_models():
    from . import hh, glial, calibration, test_ode  # noqa: F401

    return sorted(_REGISTRY)
