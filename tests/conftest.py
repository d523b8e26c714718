"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the distributed test strategy
in SURVEY.md section 4 — the reference delegates distributed correctness
to dolfinx/PETSc and has no such test.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
