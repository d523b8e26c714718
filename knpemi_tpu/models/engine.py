"""Membrane ODE engine: vmapped fixed-substep integration of channel models.

TPU-native replacement for the reference's ``MembraneModel`` + numbalsoda
(odeSolver.py:6-188): instead of a **serial python loop over every
membrane dof calling C LSODA** (odeSolver.py:107-122, the reference's
hottest serial section), all membrane dofs advance simultaneously as a
``vmap`` over a fixed-substep RK4 integrator inside ``lax.scan`` — a pure
function suitable for jit/scan/shard_map.

A channel model is a :class:`ODEModel` (see hh.py / glial.py):

* ``state_names`` / ``param_names`` — gotran-style name->index layout
  (mirrors mm_hh.py:21, 69-78),
* ``init_states()`` / ``init_params()`` — default values,
* ``rhs(t, y, p) -> dy`` — pure per-point JAX function,
* ``currents(t, y, p) -> (I_per_ion ...)`` — ion-specific channel currents
  evaluated from the state (the reference writes these into the parameter
  array as a side effect of the RHS, mm_hh.py:220-225; here they are an
  explicit pure function of the final state).

With the reference's defaults (dt = 1e-4 s, n_steps_ODE = 25 substeps,
run_3D.py:174-178) RK4 at 4 us substeps resolves the HH gating dynamics
to well below the PDE splitting error; tests/test_ode.py checks against
scipy's LSODA at rtol 1e-8 / atol 1e-10 (the reference tolerances,
odeSolver.py:120).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.geometry import DiscreteGeometry, MembraneSpace
from .registry import ODEModel


def rk4_step(rhs: Callable, t, y, p, dt):
    k1 = rhs(t, y, p)
    k2 = rhs(t + dt / 2, y + dt / 2 * k1, p)
    k3 = rhs(t + dt / 2, y + dt / 2 * k2, p)
    k4 = rhs(t + dt, y + dt * k3, p)
    return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


class MembraneModel:
    """Static metadata + pure stepping functions for one membrane tag.

    State lives outside the object (in SimState pytrees); all methods are
    functional.  API names mirror the reference MembraneModel
    (odeSolver.py:52-89) but take/return arrays.
    """

    def __init__(self, ode: ODEModel, membrane: MembraneSpace, n_steps_ODE: int = 25):
        self.ode = ode
        self.membrane = membrane
        self.tag = membrane.tag
        self.n_steps_ODE = int(n_steps_ODE)
        self.n_dofs = membrane.n_dofs
        self.dof_coords = membrane.coords
        self._sidx = {n: i for i, n in enumerate(ode.state_names)}
        self._pidx = {n: i for i, n in enumerate(ode.param_names)}

    # ---- name-indexed functional setters/getters (odeSolver.py:130-188) ----
    def state_index(self, name: str) -> int:
        return self._sidx[name]

    def param_index(self, name: str) -> int:
        return self._pidx[name]

    def set_state(self, states, name, values):
        return states.at[:, self._sidx[name]].set(values)

    def get_state(self, states, name):
        return states[:, self._sidx[name]]

    def set_param(self, params, name, values):
        return params.at[:, self._pidx[name]].set(values)

    def get_param(self, params, name):
        return params[:, self._pidx[name]]

    def set_membrane_potential(self, states, phi_M):
        return self.set_state(states, "V", phi_M)

    def get_membrane_potential(self, states):
        return self.get_state(states, "V")

    # ---- initialization ----------------------------------------------------
    def init_states(self) -> np.ndarray:
        return np.tile(self.ode.init_states(), (self.n_dofs, 1))

    def init_params(self) -> np.ndarray:
        return np.tile(self.ode.init_params(), (self.n_dofs, 1))

    # ---- integration ---------------------------------------------------------
    def step(self, states, params, t0, dt):
        """Advance all membrane dofs by dt with n_steps_ODE RK4 substeps.

        states: (n, S); params: (n, P); returns new states.
        """
        n_sub = self.n_steps_ODE
        # keep the substep clock in the state dtype so the scan carry does
        # not upcast under x64 (f32 time is ample for the stimulus windows)
        t0 = jnp.asarray(t0, dtype=states.dtype)
        h = jnp.asarray(dt / n_sub, dtype=states.dtype)
        rhs = self.ode.rhs

        def substep(carry, i):
            y, t = carry
            y = jax.vmap(lambda yy, pp: rk4_step(rhs, t, yy, pp, h))(y, params)
            return (y, t + h), None

        (y, _), _ = jax.lax.scan(
            substep, (states, t0), jnp.arange(n_sub), length=n_sub
        )
        return y

    def currents(self, states, params, t) -> Dict[str, jnp.ndarray]:
        """Ion-specific channel currents at the current state: {ion: (n,)}.

        Matches the reference semantics where I_ch_* parameters hold the
        values from the last RHS evaluation of the completed ODE step
        (odeSolver.py step + get_parameter('I_ch_...'), run_2D.py:108-109).
        """
        t = jnp.asarray(t, dtype=states.dtype)
        vals = jax.vmap(lambda yy, pp: self.ode.currents(t, yy, pp))(states, params)
        return dict(zip(self.ode.current_names, vals))


def setup_membrane_model(
    stim_params: dict,
    physical_params,
    ode_models: Dict[int, ODEModel],
    geom: DiscreteGeometry,
    ions,
    n_steps_ODE: Optional[int] = None,
) -> List[MembraneModel]:
    """Create MembraneModels with PDE-consistent constants pushed into the
    per-dof parameter arrays (reference utils.py:105-148):

    * Cm, psi, z_<ion> from the physical parameters,
    * the stimulus amplitude written only at dofs selected by
      ``stim_params['stimulus_locator']`` (odeSolver.py:98-112).

    Returns a list of (model, init_states, init_params) triples wrapped in
    the models; initial arrays are attached as ``.states0`` / ``.params0``.
    """
    if n_steps_ODE is None:
        n_steps_ODE = getattr(physical_params, "n_steps_ODE", 25)
    stimulus = stim_params.get("stimulus") or {}
    locator = stim_params.get("stimulus_locator")

    mem_models = []
    for mtag, ode in ode_models.items():
        membrane = geom.membranes[mtag]
        mm = MembraneModel(ode, membrane, n_steps_ODE)
        params = mm.init_params()
        pset = dict(Cm=physical_params.C_M, psi=physical_params.psi)
        for ion in ions:
            pset[f"z_{ion.name}"] = ion.z
        for name, v in pset.items():
            if name in mm._pidx:
                params[:, mm.param_index(name)] = v
        if stimulus:
            if locator is None:
                mask = np.ones(mm.n_dofs, dtype=bool)
            else:
                mask = np.array([bool(locator(x)) for x in mm.dof_coords])
            for name, v in stimulus.items():
                col = mm.param_index(name)
                params[mask, col] = v
        mm.states0 = mm.init_states()
        mm.params0 = params
        mem_models.append(mm)
    return mem_models


def update_ode_variables(
    mm: MembraneModel,
    params: jnp.ndarray,
    states: jnp.ndarray,
    c: Dict[int, jnp.ndarray],
    phi_M: jnp.ndarray,
    ions,
    first_step,
):
    """Refresh the ODE inputs from the PDE state (reference utils.py:210-235):

    * two-sided concentration traces of every ion -> parameters
      ``<ion>_e`` / ``<ion>_i``,
    * membrane potential -> state V, except on the very first step where
      the ODE file's initial V is kept (utils.py:230-233).

    ``first_step`` may be a traced boolean. Returns (params, states).
    """
    mem = mm.membrane
    ct = mem.cell_tag
    m2e = jnp.asarray(mem.mem_to_ecs)
    m2i = jnp.asarray(mem.mem_to_ics)
    for k, ion in enumerate(ions):
        tr_e = c[0][k][m2e]
        tr_i = c[ct][k][m2i]
        if f"{ion.name}_e" in mm._pidx:
            params = mm.set_param(params, f"{ion.name}_e", tr_e)
            params = mm.set_param(params, f"{ion.name}_i", tr_i)
    v_idx = mm.state_index("V")
    new_V = jnp.where(first_step, states[:, v_idx], phi_M)
    states = states.at[:, v_idx].set(new_V)
    return params, states
