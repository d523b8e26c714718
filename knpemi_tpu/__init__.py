"""knpemi_tpu — a TPU-native framework for the KNP-EMI problem.

A from-scratch JAX/XLA/Pallas implementation of the electroneutral
Kirchhoff--Nernst--Planck equations on EMI (Extracellular / Membrane /
Intracellular) geometries, advanced by the Ellingsrud PDE/ODE splitting
scheme.  Functionally equivalent to the FEniCSx reference implementation
(adajel/knp-emi-fenics-x) but architected TPU-first:

* the mesh is a set of flat index arrays (no C++ topology objects),
* the fixed P1 weak forms are hand-derived element kernels executed as
  batched gather -> einsum -> scatter-add under ``jax.jit``
  (replaces UFL/FFCx/dolfinx assembly),
* linear systems are solved matrix-free with JAX-native CG / GMRES
  (replaces PETSc KSP + hypre BoomerAMG / MUMPS),
* membrane ODEs step as a single ``vmap`` over every membrane dof
  (replaces the serial per-dof python loop over C LSODA),
* distribution is SPMD over a ``jax.sharding.Mesh`` with XLA collectives
  (replaces MPI domain decomposition).

Public API mirrors the reference package surface
(src/knpemi/__init__.py:1-24 of the reference): ``emi_system``,
``knp_system``, ``create_functions_emi``, ``create_functions_knp``,
``create_solver_emi``, ``create_solver_knp``, ``MembraneModel``,
``set_initial_conditions``, ``setup_membrane_model``,
``interpolate_to_membrane``, ``update_ode_variables``,
``update_pde_variables``.
"""

import os

# Precision policy.  The KNP-EMI problem benefits from double precision
# (log-ratio Nernst potentials, rtol 1e-7 solves), so x64 is enabled by
# default on CPU.  On TPU there is no native f64, the compute path runs
# f32 with equilibrated solvers (see solvers/api.py) — and enabling the
# global x64 flag breaks Mosaic's Pallas lowering even for all-f32
# kernels, so x64 stays OFF when a TPU platform is requested.
# KNPEMI_X64=1/0 overrides either way.
_x64_env = os.environ.get("KNPEMI_X64")
if _x64_env is None:
    _platforms = os.environ.get("JAX_PLATFORMS", "")
    _enable_x64 = not any(p in _platforms for p in ("tpu", "axon"))
else:
    _enable_x64 = _x64_env != "0"
if _enable_x64:
    import jax

    jax.config.update("jax_enable_x64", True)
else:
    # On TPU, f32 dot_general defaults to bf16 MXU inputs; Krylov dot
    # products and MG coarse solves need true f32 accumulation.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

from .systems.types import (  # noqa: E402
    Ion,
    PhysicalParams,
    SubdomainDef,
)
from .mesh.core import Mesh  # noqa: E402
from .ops.geometry import build_geometry, DiscreteGeometry  # noqa: E402
from .systems.emi import emi_system, create_functions_emi  # noqa: E402
from .systems.knp import knp_system, create_functions_knp  # noqa: E402
from .systems.coupling import (  # noqa: E402
    set_initial_conditions,
    interpolate_to_membrane,
    update_pde_variables,
)
from .solvers.api import create_solver_emi, create_solver_knp  # noqa: E402
from .models.engine import (  # noqa: E402
    MembraneModel,
    setup_membrane_model,
    update_ode_variables,
)

__all__ = [
    "Ion",
    "PhysicalParams",
    "SubdomainDef",
    "Mesh",
    "DiscreteGeometry",
    "build_geometry",
    "emi_system",
    "knp_system",
    "create_functions_emi",
    "create_functions_knp",
    "create_solver_emi",
    "create_solver_knp",
    "set_initial_conditions",
    "interpolate_to_membrane",
    "update_pde_variables",
    "MembraneModel",
    "setup_membrane_model",
    "update_ode_variables",
]
