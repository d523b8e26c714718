"""PDE <-> PDE and PDE <-> ODE coupling: traces, eliminated ion, phi_M.

Replaces the reference's utils.py coupling layer:

* ``interpolate_to_membrane`` (utils.py:150-207): for broken P1 spaces the
  two-sided membrane trace is an exact vertex **gather** through the
  precomputed maps ``mem_to_ecs`` / ``mem_to_ics`` — no interpolation
  machinery, no MPI scatter.
* ``eliminated_concentration`` (utils.py:247-267): bulk electroneutrality
  c_elim = -(1/z_N) (sum_k z_k c_k + z_rho rho), a pure vertex op.
* ``membrane_potential_from_phi`` (utils.py:285-293):
  phi_M = tr_i(phi_i) - tr_e(phi_e).
* ``update_pde_variables`` (utils.py:238-295): the end-of-step algebraic
  refresh combining the above.

All functions are jit-safe pure array ops.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from ..ops.geometry import DiscreteGeometry, MembraneSpace
from .types import Ion, PhysicalParams


def set_initial_conditions(
    geom: DiscreteGeometry, ions: List[Ion], dtype=jnp.float64
) -> Dict[int, jnp.ndarray]:
    """Build the concentration state {tag: (N_ions, n_dofs)} from each ion's
    per-tag initial condition (constant or per-dof array)
    (reference utils.py:90-102)."""
    c = {}
    for tag, sub in geom.subdomains.items():
        rows = []
        for ion in ions:
            v = ion.c_init[tag]
            arr = np.broadcast_to(np.asarray(v, dtype=np.float64), (sub.n_dofs,))
            rows.append(arr)
        c[tag] = jnp.asarray(np.stack(rows, axis=0), dtype=dtype)
    return c


def interpolate_to_membrane(u_e, u_i, membrane: MembraneSpace | dict):
    """Two-sided membrane traces of subdomain fields (gather).

    API parity with reference utils.py:150-207; returns (tr_e, tr_i) on the
    membrane dof numbering.
    """
    m2e = membrane["mem_to_ecs"] if isinstance(membrane, dict) else membrane.mem_to_ecs
    m2i = membrane["mem_to_ics"] if isinstance(membrane, dict) else membrane.mem_to_ics
    return u_e[..., m2e], u_i[..., m2i]


def eliminated_concentration(
    c_solved: jnp.ndarray, zs: np.ndarray, z_elim: float, rho_z: float, rho
) -> jnp.ndarray:
    """c_elim = -(1/z_N)(sum_k z_k c_k + z_rho * rho) (utils.py:247-267).

    c_solved: (N_ions-1, n_dofs) solved concentrations; rho scalar or (n,).
    """
    s = jnp.einsum("k,kn->n", jnp.asarray(zs, dtype=c_solved.dtype), c_solved)
    return -(s + rho_z * rho) / z_elim


def membrane_potential_from_phi(phi_e, phi_i, membrane) -> jnp.ndarray:
    tr_e, tr_i = interpolate_to_membrane(phi_e, phi_i, membrane)
    return tr_i - tr_e


def update_pde_variables(
    geom: DiscreteGeometry,
    ions: List[Ion],
    params: PhysicalParams,
    c_new: Dict[int, jnp.ndarray],
    phi: Dict[int, jnp.ndarray],
):
    """End-of-step refresh (reference utils.py:238-295): given the freshly
    solved concentrations (N_ions-1 rows per tag) and potentials, return
    (c with eliminated row appended, phi_M per membrane tag)."""
    zs = np.array([ion.z for ion in ions[:-1]])
    z_elim = ions[-1].z
    c_out = {}
    for tag, sub in geom.subdomains.items():
        rho = params.rho.get(tag, 0.0)
        c_el = eliminated_concentration(c_new[tag], zs, z_elim, params.rho_z, rho)
        c_out[tag] = jnp.concatenate([c_new[tag], c_el[None, :]], axis=0)
    phi_M = {}
    for mtag, mem in geom.membranes.items():
        phi_M[mtag] = membrane_potential_from_phi(phi[0], phi[mem.cell_tag], mem)
    return c_out, phi_M
