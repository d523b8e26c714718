"""Core data model: ions, physical parameters, simulation state.

Typed equivalents of the reference's dictionary conventions
(SURVEY.md section 2.1; reference run_2D.py:178-254):

* ``Ion`` — name, valence z, per-subdomain diffusion D, initial
  concentrations; **the last ion in a list is eliminated** via bulk
  electroneutrality and never solved for (knpWeakForm.py:53,77-78).
* ``PhysicalParams`` — dt, F, psi = F/(R*T), C_phi = C_M/dt, C_M, R,
  temperature, immobile background charge rho (with valence rho_z).
* ``SimState`` — the complete per-step state threaded through the jitted
  step function: concentrations (all ions, eliminated included), bulk
  potentials, membrane potentials, membrane ODE states/parameters, time.
  Unlike the reference this state includes the gating variables, so
  checkpoints are fully resumable (SURVEY.md section 5, checkpoint gap).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class Ion:
    """One ion species. D/c_init are keyed by subdomain tag."""

    name: str
    z: float
    D: Dict[int, float]
    c_init: Dict[int, Any] = dataclasses.field(default_factory=dict)
    # optional ECS source term: per-tag values at cell quadrature points
    # (reference: UFL conditional box source, benchmark
    # run_stim_duration.py:260-281); multiplied by the driver's time gate.
    f_source_q: Optional[Dict[int, np.ndarray]] = None


@dataclasses.dataclass
class PhysicalParams:
    dt: float
    F: float = 96485.0
    R: float = 8.314
    temperature: float = 300.0
    C_M: float = 0.02
    n_steps_ODE: int = 25
    rho_z: float = -1.0
    rho: Dict[int, float] = dataclasses.field(default_factory=dict)

    @property
    def psi(self) -> float:
        return self.F / (self.R * self.temperature)

    @property
    def C_phi(self) -> float:
        return self.C_M / self.dt


@dataclasses.dataclass
class SubdomainDef:
    """Declarative subdomain description (reference run_2D.py:145-151)."""

    tag: int
    name: str
    membrane_tags: List[int] = dataclasses.field(default_factory=list)
    ode_models: Dict[int, Any] = dataclasses.field(default_factory=dict)


class SimState(NamedTuple):
    """Complete simulation state (a pytree; dict values keyed by tag).

    c: {subdomain tag: (N_ions, n_dofs)} — previous/current concentrations,
        the last row is the eliminated ion (kept consistent by
        electroneutrality each step, utils.py:247-267 in the reference).
    phi: {subdomain tag: (n_dofs,)} — bulk potentials from the last EMI solve.
    phi_M: {membrane tag: (n_mem_dofs,)} — membrane potential.
    ode_states: {membrane tag: (n_mem_dofs, n_states)}.
    ode_params: {membrane tag: (n_mem_dofs, n_params)} — per-dof parameters
        (stimulus amplitudes, trace concentrations, channel currents).
    t: scalar simulation time; step: int32 step counter.
    emi_iters / knp_iters: Krylov iteration counts of the last step.
    """

    c: Dict[int, jnp.ndarray]
    phi: Dict[int, jnp.ndarray]
    phi_M: Dict[int, jnp.ndarray]
    ode_states: Dict[int, jnp.ndarray]
    ode_params: Dict[int, jnp.ndarray]
    t: jnp.ndarray
    step: jnp.ndarray
    emi_iters: jnp.ndarray
    knp_iters: jnp.ndarray
    # solver health of the last step (the reference fails fast via
    # ksp_error_if_not_converged, pdeSolver.py:20,27,95; Simulation.run
    # checks these on the host after every chunk and raises/warns)
    # plain Python defaults: evaluating jnp.asarray at class-definition
    # time would commit device arrays at import, before the caller's
    # dtype/x64/platform configuration is settled (construction sites
    # that care — init_state, checkpoint load — pass explicit arrays)
    emi_ok: jnp.ndarray = True
    knp_ok: jnp.ndarray = True
    emi_res: jnp.ndarray = 0.0
    knp_res: jnp.ndarray = 0.0
