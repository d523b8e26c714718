"""Dof-sharded domain decomposition vs the single-device step.

The replicate-dofs SPMD mode is covered by tests/test_spmd.py; this
validates the MPI-parity mode (knpemi_tpu/parallel/sharded.py): dof
vectors partitioned into per-device blocks with halo-exchange assembly
must reproduce the single-device step, and per-device dof storage must
actually shrink with the device count.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from run_2d import build_simulation  # noqa: E402
from knpemi_tpu.parallel.sharded import ShardedSimulation  # noqa: E402


@pytest.fixture(scope="module")
def sims():
    sim = build_simulation(resolution=1)
    # distributed_mg=False: with the REPLICATED hierarchy both paths run
    # bitwise-identical preconditioned iterations, so single-vs-sharded
    # equality is asserted at 1e-8 (the distributed V-cycle is a
    # different — permuted-operator — hierarchy and is covered at solver
    # tolerance by test_sharded_distributed_mg)
    sh = ShardedSimulation(sim, devices=jax.devices()[:8],
                           distributed_mg=False)
    return sim, sh


def test_sharded_step_matches_single_device(sims):
    sim, sh = sims
    s0 = sim.init_state()
    s1 = sim.step(s0)
    s1 = sim.step(s1)

    p0 = sh.init_state()
    p1 = sh.step(p0)
    p1 = sh.step(p1)
    pu = sh.unpad_state(p1)

    for t in s1.phi:
        np.testing.assert_allclose(
            np.asarray(pu.phi[t]), np.asarray(s1.phi[t]),
            rtol=1e-8, atol=1e-10,
        )
    for t in s1.c:
        np.testing.assert_allclose(
            np.asarray(pu.c[t]), np.asarray(s1.c[t]), rtol=1e-8
        )
    for m in s1.phi_M:
        np.testing.assert_allclose(
            np.asarray(pu.phi_M[m]), np.asarray(s1.phi_M[m]),
            rtol=1e-8, atol=1e-12,
        )
    assert int(p1.step) == 2


def test_sharded_state_is_partitioned(sims):
    sim, sh = sims
    state = sh.step(sh.init_state())
    x = state.phi[0]
    # dof axis sharded over all 8 devices, each shard owning B entries
    assert len(x.sharding.device_set) == 8
    shard = x.addressable_shards[0]
    assert shard.data.shape[0] == sh.parts[0].B
    assert 8 * sh.parts[0].B >= sim.geom.subdomains[0].n_dofs
    # concentrations shard along the dof axis only
    c = state.c[0]
    cs = c.addressable_shards[0]
    assert cs.data.shape == (c.shape[0], sh.parts[0].B)


def test_halo_is_neighbor_exchange(sims):
    """The bulk operator must use bounded-hop ppermute halos, not
    full-vector collectives: window size B+H with H = n_hops*B and
    n_hops << N on a mesh this size."""
    sim, sh = sims
    for t, p in sh.parts.items():
        assert p.H == p.n_hops * p.B
        assert p.n_hops >= 1
    # ECS Morton spread keeps the halo to a small hop count
    assert sh.parts[0].n_hops < 8


def _load_driver(example: str):
    """Load an example driver under a unique module name (both benchmark
    and astrocyte name their driver run_stim_duration.py — a plain
    import returns whichever got cached first)."""
    import importlib.util

    path = (Path(__file__).resolve().parents[1] / "examples" / example
            / "run_stim_duration.py")
    sys.path.insert(0, str(path.parent))
    spec = importlib.util.spec_from_file_location(
        f"{example}_run_stim_duration", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sharded_matches_single_device_with_sources():
    """Multi-membrane + ECS-source coverage: the benchmark scenario
    (3 membrane tags, pulsed K+/Na- box source, gate) must also match
    the single-device step under the dof-sharded decomposition."""
    bench_driver = _load_driver("benchmark")

    sim = bench_driver.build_simulation(resolution=0)
    sh = ShardedSimulation(sim, devices=jax.devices()[:8],
                           distributed_mg=False)

    s0 = sim.init_state()
    s1 = s0
    # the gate reads the PRE-step time: step 4 is the first with
    # state.t = 0.3 > 0.2, i.e. the first step the source actually fires
    for _ in range(4):
        s1 = sim.step(s1)

    p1 = sh.init_state()
    for _ in range(4):
        p1 = sh.step(p1)
    pu = sh.unpad_state(p1)

    for t in s1.c:
        np.testing.assert_allclose(
            np.asarray(pu.c[t]), np.asarray(s1.c[t]), rtol=1e-8
        )
    for m in s1.phi_M:
        np.testing.assert_allclose(
            np.asarray(pu.phi_M[m]), np.asarray(s1.phi_M[m]),
            rtol=1e-8, atol=1e-10,
        )
    # the source must have actually fired (K_e rises near the box well
    # beyond the resting membrane leak scale)
    assert float(pu.c[0][0].max()) > float(s0.c[0][0].max()) + 1e-4


def test_sharded_three_subdomains():
    """Three-subdomain coverage (ECS + neuron + glial): the astrocyte
    scenario exercises the sharded flat-EMI layout with multiple ICS
    blocks and two membranes."""
    astro_driver = _load_driver("astrocyte")
    from knpemi_tpu.sim.config import load_config

    cfg = load_config(
        Path(__file__).resolve().parents[1]
        / "examples" / "astrocyte" / "config_files" / "baseline.yml"
    )
    sim = astro_driver.build_simulation(cfg)
    sh = ShardedSimulation(sim, devices=jax.devices()[:8],
                           distributed_mg=False)

    s1 = sim.step(sim.init_state())
    p1 = sh.unpad_state(sh.step(sh.init_state()))

    for t in s1.c:
        np.testing.assert_allclose(
            np.asarray(p1.c[t]), np.asarray(s1.c[t]), rtol=1e-8
        )
    for m in s1.phi_M:
        np.testing.assert_allclose(
            np.asarray(p1.phi_M[m]), np.asarray(s1.phi_M[m]),
            rtol=1e-8, atol=1e-10,
        )


def test_sharded_pallas_blocked_kernels():
    """The blocked (Pallas) window kernels must run INSIDE shard_map on
    per-device halo'd windows — the multi-chip compute path keeps the
    single-chip kernel economics instead of the XLA gather fallback —
    and reproduce the single-device blocked step (interpret mode on the
    virtual CPU mesh)."""
    import os

    os.environ["KNPEMI_PALLAS"] = "1"
    try:
        simP = build_simulation(resolution=1, dtype=jnp.float32)
    finally:
        os.environ["KNPEMI_PALLAS"] = "0"
    assert simP.emi_sys.use_pallas

    sh = ShardedSimulation(simP, devices=jax.devices()[:8],
                           distributed_mg=False)
    # the per-device blockings must have engaged (no silent fallback)
    assert sh.blk_static is not None
    for t in sh.tags:
        assert "blk_lidx" in sh.local_arrays[t]

    sP = simP.step(simP.init_state())
    pu = sh.unpad_state(sh.step(sh.init_state()))
    # f32 + different reduction order between the flat and the windowed
    # blocked assemblies: ~1e-6 V agreement is the attainable equality
    for m in sP.phi_M:
        np.testing.assert_allclose(
            np.asarray(pu.phi_M[m]), np.asarray(sP.phi_M[m]), atol=3e-6
        )
    for t in sP.c:
        np.testing.assert_allclose(
            np.asarray(pu.c[t]), np.asarray(sP.c[t]), rtol=2e-5
        )


def test_sharded_distributed_mg():
    """Distributed V-cycle (parallel/sharded_mg.py): the permuted-
    operator hierarchy sharded by row block must (a) exist — every level
    banded, per-device slab memory 1/N of the total — and (b) drive the
    sharded step to the same converged solution as the single-device
    step, at solver tolerance (the preconditioned ITERATES differ: the
    hierarchy row order, and hence the aggregation, is different)."""
    sim = build_simulation(resolution=1)
    sh = ShardedSimulation(sim, devices=jax.devices()[:8])
    assert sh.emi_smg is not None, "distributed EMI hierarchy not built"
    assert sh.knp_smg is not None

    # per-device slab shards: leading device axis, so each device holds
    # 1/N of every level's slab memory (the replicated _GatheredMG held
    # the WHOLE hierarchy per device)
    for lvl in sh.emi_smg["levels"]:
        for win in lvl["wins"]:
            assert win["slabT"].shape[0] == 8  # device axis

    # window halos stay neighbor-hop (not all-gather) on the FINE level —
    # tiny coarse levels legitimately span most devices (a few hundred
    # rows per device) and cost nothing
    for wm in sh.emi_smg_meta.levels[0].wins:
        assert wm.hop_lo + wm.hop_hi < 8

    s1 = sim.step(sim.init_state())
    p1 = sh.unpad_state(sh.step(sh.init_state()))

    for m in s1.phi_M:
        np.testing.assert_allclose(
            np.asarray(p1.phi_M[m]), np.asarray(s1.phi_M[m]), atol=5e-6
        )
    for t in s1.c:
        np.testing.assert_allclose(
            np.asarray(p1.c[t]), np.asarray(s1.c[t]), rtol=1e-4
        )
    # the distributed preconditioner must be a working AMG: a handful of
    # Krylov iterations, not the ~hundreds of plain Jacobi.  (No direct
    # comparison with the single-device count: at this test size the
    # single-device path uses an EXACT dense coarse solve — 439 dofs is
    # below coarse_max — while the padded permuted hierarchy runs a true
    # smoother+coarse V-cycle.)
    assert int(p1.emi_iters) <= 30
    assert int(p1.knp_iters) <= 30


def test_smv_far_entries_match_scipy():
    """_shard_band + _smv with a NONEMPTY far (outside-window) set.

    Regression for the round-3 bug where each device passed its own
    far-cols array to gather_replicated, whose cross-device psum then
    mixed different gid sets — every hierarchy level with far entries
    produced a wrong matvec (first seen as EMI 300 / KNP 51 iterations
    on the 3-D res-1 dryrun; tools/debug_smg.py).  The far cols must be
    replicated; per-device rows/vals masked."""
    import scipy.sparse as sp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from jax.sharding import Mesh

    from knpemi_tpu.parallel.sharded import AXIS
    from knpemi_tpu.parallel import sharded_mg as SMG
    from knpemi_tpu.solvers.mg import _csr_to_banded

    n_dev, n = 8, 8 * 256 * 2
    rng = np.random.default_rng(7)
    A = sp.diags([-1.0, 2.5, -1.0], [-1, 0, 1], shape=(n, n)).tolil()
    # scatter far entries that cross several device blocks
    rr = rng.integers(0, n, 200)
    cc = rng.integers(0, n, 200)
    A[rr, cc] = rng.standard_normal(200)
    A = A.tocsr()

    band = _csr_to_banded(A, R=256)
    assert band is not None
    Bd = SMG._device_row_split(n, n_dev)
    data, metas, f_max = SMG._shard_band(band, Bd, Bd, n_dev, jnp.float32)
    assert f_max > 0, "test must exercise the far path"
    # replicated far cols: identical array, not per-device
    assert data["far"]["cols_rep"].ndim == 1

    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))

    def apply_op(x_loc, dat):
        def sq(node):
            if isinstance(node, dict):
                return {k: (v if k == "cols_rep" else sq(v))
                        for k, v in node.items()}
            if isinstance(node, list):
                return [sq(v) for v in node]
            return node[0]

        return SMG._smv(sq(dat), metas, f_max, Bd, Bd, x_loc, n_dev)

    def specs(node, name=None):
        if isinstance(node, dict):
            return {k: specs(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [specs(v) for v in node]
        return P() if name == "cols_rep" else P(AXIS, *([None] * (node.ndim - 1)))

    x = rng.standard_normal(n).astype(np.float32)
    f = jax.jit(shard_map(
        apply_op, mesh=mesh, in_specs=(P(AXIS), specs(data)),
        out_specs=P(AXIS), check_vma=False,
    ))
    y = np.asarray(f(jnp.asarray(x), data))
    y_ref = A @ x.astype(np.float64)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5
