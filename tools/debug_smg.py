#!/usr/bin/env python3
"""Direct numerical check of the sharded V-cycle (parallel/sharded_mg.py)
against the replicated DeviceMG applied to the SAME permuted hierarchy."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(
    0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
)

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from run_2d import build_simulation
from knpemi_tpu.parallel.sharded import ShardedSimulation, AXIS
from knpemi_tpu.parallel.sharded_mg import (
    ShardedMG, local_layout_gids, permute_operator, shard_hierarchy,
    smg_specs, squeeze_smg,
)
from knpemi_tpu.solvers.mg import build_hierarchy
from knpemi_tpu.solvers import direct as direct_mod
from knpemi_tpu.systems.coupling import set_initial_conditions

sim = build_simulation(resolution=1, dtype=jnp.float32)
sh = ShardedSimulation(sim, devices=jax.devices()[:8], distributed_mg=False)
n = 8

c0 = set_initial_conditions(sim.geom, sim.ions, dtype=jnp.float64)
kappa = {t: np.asarray(v) for t, v in sim.emi_sys.kappa(c0).items()}
A0 = direct_mod.assemble_emi_csr(sim.emi_sys, kappa)
gids, L256, L = local_layout_gids(sh.parts, sh.tags, n)
A_perm = permute_operator(A0, gids)
d = A_perm.diagonal()
d = np.where(d != 0, d, 1.0)
s = 1.0 / np.sqrt(np.abs(d))
A_hat = (sp.diags(s) @ A_perm @ sp.diags(s)).tocsr()
opts = sim.opts
hier = build_hierarchy(
    A_hat, B=1.0 / s, theta=opts.mg_theta, coarse_max=opts.mg_coarse_max,
    nu=opts.mg_nu, banded=True, smoother="jacobi", degree=opts.mg_degree,
)
print("levels:", [lv.n for lv in hier.levels], "coarse:",
      hier.levels[-1].P_csr.shape[1])
data, meta = shard_hierarchy(hier, n, jnp.float32)
data["fine_diag"] = jnp.asarray(d.reshape(n, L256), jnp.float32)

# replicated reference
dev = hier.device(jnp.float32)
rng = np.random.default_rng(0)
r_glob = rng.standard_normal(n * L256).astype(np.float32)
r_glob[gids < 0] = 0.0  # padding rows zero
z_ref = np.asarray(dev.apply(lambda v: v, jnp.asarray(r_glob)))

# sharded apply
specs = smg_specs(data)


def apply_sharded(r, dat):
    dsq = squeeze_smg(dat)
    mg = ShardedMG(dsq, meta, n, solver_len=L256)
    return mg.apply(None, r)


f = jax.jit(
    shard_map(
        apply_sharded,
        mesh=sh.mesh,
        in_specs=(P(AXIS), specs),
        out_specs=P(AXIS),
        check_vma=False,
    )
)
z_sh = np.asarray(f(jnp.asarray(r_glob), data))
err = np.abs(z_sh - z_ref)
den = np.abs(z_ref).max()
print("max |z_sh - z_ref| =", err.max(), " rel =", err.max() / den)
bad = np.argsort(-err)[:10]
print("worst rows:", bad, "dev:", bad // L256)
print("z_sh:", z_sh[bad])
print("z_ref:", z_ref[bad])
