"""Distributed V-cycle for the dof-sharded SPMD mode.

The round-2 sharded mode applied the lagged AMG preconditioner on an
``all_gather``-ed residual with a REPLICATED hierarchy
(parallel/sharded.py::_GatheredMG): correct, but per-device memory was
not n/N once the fine banded slabs were counted, and every Krylov
iteration paid a full-vector collective.  This module distributes the
V-cycle itself:

* **Row order = the sharded layout.**  The hierarchy is built on the
  PERMUTED fine operator whose rows follow the solver's local vectors:
  ``[dev0: tag0 block | tag1 block | ...][dev1: ...]`` with the per-tag
  padding rows kept as identity.  Contiguous R-row blocks of every level
  then belong to exactly one device and the block-banded slabs
  (solvers/mg.py::_csr_to_banded) shard by row block — per-device slab
  memory IS n/N.
* **Windows become two-sided contiguous halos.**  A banded row block
  reads a contiguous column window near its diagonal; Morton order makes
  a device's union of windows a contiguous run into its neighbors'
  blocks — fetched with ``ppermute`` hops both directions (the banded
  analog of the cell kernels' forward halo, sharded.py::halo_gather).
  No backward reduction is needed: banded layouts are row-complete.
* **Coarse levels gather.**  Aggregate relabeling follows the fine
  order, so coarse blocks also shard contiguously; only the coarsest
  dense solve (<= coarse_max rows) runs on an all_gather'ed vector —
  O(800) elements, negligible.
* The far (outside-window) COO remainder keeps GLOBAL column ids and is
  applied with one masked-psum gather per level
  (sharded.py::gather_replicated) — a few percent of nnz by
  construction.

Reference parity: hypre BoomerAMG applies its V-cycle on distributed
vectors with neighbor communication in the same way (SURVEY.md
section 2.3, "hypre BoomerAMG" row); this is the TPU-native equivalent
with XLA collectives instead of MPI.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from .sharded import AXIS, _perm, gather_replicated

R_BLOCK = 256  # row-block granularity of _csr_to_banded layouts


# ---------------------------------------------------------------------------
# host: permuted operator construction
# ---------------------------------------------------------------------------
def local_layout_gids(parts, tags, n_dev: int):
    """Global dof id of every entry of the concatenated local layout
    ``[dev: tag blocks + pad]``; -1 on padding.  Each device's segment
    is padded to a multiple of R_BLOCK so hierarchy row blocks align
    with device boundaries.  Returns (gids, L256, L) with L the
    unpadded per-device (solver) length."""
    offs_g = {}
    off = 0
    for t in tags:
        offs_g[t] = off
        off += parts[t].n_dofs
    L = sum(parts[t].B for t in tags)
    L256 = -(-L // R_BLOCK) * R_BLOCK
    segs = []
    for d in range(n_dev):
        for t in tags:
            p = parts[t]
            i = d * p.B + np.arange(p.B)
            g = np.where(i < p.n_dofs, offs_g[t] + i, -1)
            segs.append(g)
        if L256 > L:
            segs.append(np.full(L256 - L, -1, np.int64))
    return np.concatenate(segs).astype(np.int64), L256, L


def permute_operator(A: sp.csr_matrix, gids: np.ndarray) -> sp.csr_matrix:
    """A_perm[l1, l2] = A[gids[l1], gids[l2]]; padding rows identity."""
    n_pad = len(gids)
    real = gids >= 0
    rows = np.flatnonzero(real)
    S = sp.csr_matrix(
        (np.ones(len(rows)), (rows, gids[rows])), shape=(n_pad, A.shape[0])
    )
    A_perm = (S @ A @ S.T).tolil()
    pad_rows = np.flatnonzero(~real)
    A_perm[pad_rows, pad_rows] = 1.0
    return A_perm.tocsr()


def rcm_block_perm(A_perm: sp.csr_matrix, n_dev: int, Bd: int) -> np.ndarray:
    """Per-device RCM order of the local diagonal blocks.

    The solver layout concatenates per-tag blocks, which interleaves the
    EMI membrane coupling (ECS row <-> ICS column) across block-distant
    ids — the banded windows the hierarchy builds on that order inflate
    ~50x vs the mesh's RCM bandwidth (measured res 1: W=1152 x 104
    blocks = 30.7M slab MACs vs the single-device ELL's 0.6M).  RCM
    within each device's rows restores the bandwidth; the V-cycle
    permutes in/out with one local gather per application.  Cross-device
    couplings are not in the per-block graph, so their columns land in
    the far-COO remainder — bounded by the partition's cut size.

    Returns ``perm`` with MG slot ``i`` holding solver-layout row
    ``perm[i]`` (a bijection of each device's ``[d*Bd, (d+1)*Bd)``).
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = np.empty(n_dev * Bd, np.int64)
    for d in range(n_dev):
        blk = A_perm[d * Bd : (d + 1) * Bd, d * Bd : (d + 1) * Bd].tocsr()
        p = np.asarray(reverse_cuthill_mckee(blk, symmetric_mode=True))
        perm[d * Bd : (d + 1) * Bd] = d * Bd + p
    return perm


# ---------------------------------------------------------------------------
# host: shard a banded hierarchy
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class _WinMeta:
    W: int
    NBloc: int
    hop_lo: int
    hop_hi: int


@dataclasses.dataclass
class _LevelMeta:
    n: int          # true row count of the level
    Bd: int         # rows per device (multiple of R_BLOCK)
    Bc: int         # input (column) block per device = next level's Bd
    wins: List[_WinMeta]
    f_max: int      # far entries per device (padded)
    k_steps: int    # smoother polynomial degree


@dataclasses.dataclass
class SMGMeta:
    levels: List[_LevelMeta]
    p_meta: List["SMGOpMeta"]
    pt_meta: List["SMGOpMeta"]
    nu: int
    n_coarse: int


@dataclasses.dataclass
class SMGOpMeta:
    n: int
    Bd: int   # output rows per device
    Bc: int   # input block per device
    wins: List[_WinMeta]
    f_max: int


def _device_row_split(n: int, n_dev: int) -> int:
    """Rows per device: whole R_BLOCK row blocks, equal across devices."""
    nb = -(-n // R_BLOCK)
    nb_d = -(-nb // n_dev)
    return nb_d * R_BLOCK


def _shard_band(band, Bd: int, Bc: int, n_dev: int, dtype):
    """Split a host banded layout (windows, far...) by row block.

    Returns (data, meta): ``data`` is a dict of device-stacked arrays
    (leading axis n_dev, sharded by shard_map); ``meta`` the static
    shapes.  Window starts are re-based onto the device's haloed input
    buffer ``[d*Bc - hop_lo*Bc, (d+1)*Bc + hop_hi*Bc)``.
    """
    windows, fr, fc, fv, n, m = band
    NBloc = Bd // R_BLOCK
    data = {"wins": [], "far": None}
    metas = []
    for slabT, w0, W in windows:
        R = slabT.shape[1]
        assert R == R_BLOCK
        NB = len(w0)
        slab_d = np.zeros((n_dev, NBloc * W, R), slabT.dtype)
        w0_d = np.zeros((n_dev, NBloc), np.int64)
        # device d owns row blocks [d*NBloc, (d+1)*NBloc)
        hop_lo = hop_hi = 0
        for d in range(n_dev):
            for j in range(NBloc):
                b = d * NBloc + j
                if b >= NB:
                    # zero slab reading the buffer start: harmless
                    w0_d[d, j] = d * Bc
                    continue
                slab_d[d, j * W : (j + 1) * W] = slabT[b * W : (b + 1) * W]
                w0_d[d, j] = w0[b]
            lo = int(w0_d[d].min())
            hi = int(w0_d[d].max()) + W
            hop_lo = max(hop_lo, -(-(d * Bc - lo) // Bc) if lo < d * Bc else 0)
            need_hi = hi - (d + 1) * Bc
            hop_hi = max(hop_hi, -(-need_hi // Bc) if need_hi > 0 else 0)
        hop_lo = min(hop_lo, n_dev - 1)
        hop_hi = min(hop_hi, n_dev - 1)
        # re-base w0 on the haloed buffer start (clamp: wrapped halo
        # regions of edge devices hold unrelated blocks, but the slabs
        # that would read them are zero by construction above only for
        # padding; real windows never exceed the clamp because hop_*
        # was sized from the true extremes)
        for d in range(n_dev):
            buf0 = d * Bc - hop_lo * Bc
            w0_d[d] = w0_d[d] - buf0
        assert w0_d.min() >= 0, "window starts before the haloed buffer"
        data["wins"].append(
            dict(
                slabT=jnp.asarray(slab_d, dtype=dtype),
                w0=jnp.asarray(w0_d, dtype=jnp.int32),
            )
        )
        metas.append(_WinMeta(W=W, NBloc=NBloc, hop_lo=hop_lo, hop_hi=hop_hi))
    # Far remainder: the column-gather (gather_replicated) psums
    # x_loc[cols] contributions ACROSS devices, so the cols array must
    # be IDENTICAL on every device (a per-device cols array silently
    # mixes different gid sets in the psum — the round-3 bug that broke
    # every level with far entries; tools/debug_smg.py caught it on the
    # 3-D hierarchy).  Store one replicated cols array of ALL far
    # entries; rows/vals are per-device copies masked to the device's
    # own rows (foreign entries: val 0 adding at row 0 — harmless).
    #
    # COST BOUND: rows/vals are (n_dev, f_max) and every apply psums an
    # f_max-length gather, so memory and collective volume scale
    # O(n_dev * f_max) — fine while spill-free window widening keeps
    # f_max ~0 (solvers/mg.py::build_ellw; the flagship hierarchy's far
    # sets are all zero since round 4).  If large far sets reappear,
    # restore O(f_max) aggregate cost by keeping per-device cols over a
    # replicated union-of-cols index, or ppermute owner-segments.
    f_max = len(fr)
    frl = np.zeros((n_dev, max(f_max, 1)), np.int32)
    fvl = np.zeros((n_dev, max(f_max, 1)), np.float64)
    fc_rep = np.zeros(max(f_max, 1), np.int32)
    if f_max:
        owner = fr // Bd
        fc_rep[:] = fc
        for d in range(n_dev):
            own = owner == d
            frl[d, own] = fr[own] - d * Bd
            fvl[d, own] = fv[own]
    data["far"] = dict(
        rows=jnp.asarray(frl),
        cols_rep=jnp.asarray(fc_rep),
        vals=jnp.asarray(fvl, dtype=dtype),
    )
    return data, metas, f_max


def shard_hierarchy(hier, n_dev: int, dtype):
    """Host MGHierarchy (built on the PERMUTED operator) -> device-stacked
    sharded arrays + static metadata for :class:`ShardedMG`.

    Every level and transfer operator must carry a banded layout (the
    builder is invoked with ``banded=True``); levels that fell back to
    ELL are rejected — callers should fall back to the replicated
    ``_GatheredMG`` in that case.
    """
    if not hier.levels:
        raise ValueError(
            "hierarchy has no levels (problem below coarse_max); use the "
            "replicated preconditioner"
        )
    lvl_meta: List[_LevelMeta] = []
    p_meta: List[SMGOpMeta] = []
    pt_meta: List[SMGOpMeta] = []
    data = {"levels": [], "p": [], "pt": [], "coarse": None}
    # per-level row counts: fine = level[0].n, then coarse sizes
    sizes = [lv.n for lv in hier.levels]
    n_coarse = hier.levels[-1].P_csr.shape[1] if hier.levels else 0
    sizes.append(n_coarse)
    Bds = [_device_row_split(nn, n_dev) for nn in sizes]
    for i, lv in enumerate(hier.levels):
        if lv.a_band is None or lv.p_band is None or lv.pt_band is None:
            raise ValueError(
                f"level {i} lacks a banded layout; distributed V-cycle "
                "requires banded=True hierarchies"
            )
        Bd = Bds[i]
        a_data, a_wins, a_fmax = _shard_band(lv.a_band, Bd, Bd, n_dev, dtype)
        # dinv and steps
        dinv = 1.0 / lv.diag
        dinv_d = np.zeros((n_dev, Bd))
        for d in range(n_dev):
            seg = dinv[d * Bd : (d + 1) * Bd]
            dinv_d[d, : len(seg)] = seg
        steps = lv.steps if lv.steps is not None else np.array([lv.omega])
        a_data["dinv"] = jnp.asarray(dinv_d, dtype=dtype)
        a_data["steps"] = jnp.asarray(
            np.tile(steps, (n_dev, 1)), dtype=dtype
        )
        data["levels"].append(a_data)
        lvl_meta.append(
            _LevelMeta(n=lv.n, Bd=Bd, Bc=Bd, wins=a_wins, f_max=a_fmax,
                       k_steps=len(steps))
        )
        # transfers: pt (fine -> coarse): rows coarse (Bd_{i+1}), cols fine
        pt_data, pt_wins, pt_fmax = _shard_band(
            lv.pt_band, Bds[i + 1], Bd, n_dev, dtype
        )
        data["pt"].append(pt_data)
        pt_meta.append(
            SMGOpMeta(n=sizes[i + 1], Bd=Bds[i + 1], Bc=Bd, wins=pt_wins,
                      f_max=pt_fmax)
        )
        # p (coarse -> fine): rows fine, cols coarse
        p_data, p_wins, p_fmax = _shard_band(
            lv.p_band, Bd, Bds[i + 1], n_dev, dtype
        )
        data["p"].append(p_data)
        p_meta.append(
            SMGOpMeta(n=lv.n, Bd=Bd, Bc=Bds[i + 1], wins=p_wins,
                      f_max=p_fmax)
        )
    data["coarse"] = dict(
        V=jnp.asarray(hier.coarse_V, dtype=dtype),
        ilam=jnp.asarray(hier.coarse_ilam, dtype=dtype),
    )
    meta = SMGMeta(levels=lvl_meta, p_meta=p_meta, pt_meta=pt_meta,
                   nu=hier.nu, n_coarse=n_coarse)
    return data, meta


# ---------------------------------------------------------------------------
# device: sharded banded matvec + V-cycle (called INSIDE shard_map)
# ---------------------------------------------------------------------------
def _halo2(x_loc, hop_lo: int, hop_hi: int, n_dev: int):
    """(Bc,) owned block -> ((hop_lo+1+hop_hi)*Bc,) two-sided window."""
    blocks = []
    for h in range(hop_lo, 0, -1):
        blocks.append(jax.lax.ppermute(x_loc, AXIS, _perm(n_dev, -h)))
    blocks.append(x_loc)
    for h in range(1, hop_hi + 1):
        blocks.append(jax.lax.ppermute(x_loc, AXIS, _perm(n_dev, h)))
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else x_loc


def _smv(op_data, wins: List[_WinMeta], f_max: int, Bd: int, Bc: int,
         x_loc, n_dev: int, use_pallas: bool = False):
    """Local rows of ``A @ x`` for a sharded banded operator: banded
    windows read a two-sided contiguous halo of the input; the far COO
    remainder gathers its (global-id) columns with one masked psum."""
    y = jnp.zeros((Bd,), x_loc.dtype)
    for win, wm in zip(op_data["wins"], wins):
        slabT = win["slabT"]  # (NBloc*W, R)
        W, NBloc = wm.W, wm.NBloc
        xbuf = _halo2(x_loc, wm.hop_lo, wm.hop_hi, n_dev)
        if use_pallas:
            # the Pallas window kernel (ops/pallas_banded.py) avoids the
            # XLA window gather; window starts stay 128-aligned because
            # every block size is a multiple of R_BLOCK
            from ..ops.pallas_banded import banded_matvec

            ys = banded_matvec(
                slabT, win["w0"] // 128, xbuf, NBloc * R_BLOCK, W
            ).astype(x_loc.dtype)
        else:
            xp = jnp.pad(xbuf, (0, W))
            idx = win["w0"][:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
            xw = xp[idx]  # (NBloc, W)
            # bf16 slabs: storage only — upcast after the HBM read,
            # never round x (see ops/pallas_banded.py)
            ys = jax.lax.dot_general(
                slabT.reshape(NBloc, W, R_BLOCK).astype(x_loc.dtype),
                xw[:, :, None],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=x_loc.dtype,
            ).reshape(NBloc * R_BLOCK).astype(x_loc.dtype)
        y = y + ys
    if f_max:
        far = op_data["far"]
        # cols_rep is replicated (identical on every device) — required
        # for the cross-device psum inside gather_replicated
        xc = gather_replicated(x_loc, far["cols_rep"], Bc)
        y = y.at[far["rows"]].add(far["vals"] * xc)
    return y


def smg_specs(data):
    """shard_map PartitionSpecs for a :func:`shard_hierarchy` pytree:
    level/transfer arrays shard their leading device axis; the coarsest
    dense factors replicate."""
    from jax.sharding import PartitionSpec as P

    sh = lambda x: P(AXIS, *([None] * (x.ndim - 1)))

    def op_specs(tree):
        # dict-aware: far["cols_rep"] is replicated, everything else
        # shards its leading device axis
        def _map(node):
            if isinstance(node, dict):
                return {
                    k: (P() if k == "cols_rep" else _map(v))
                    for k, v in node.items()
                }
            if isinstance(node, list):
                return [_map(v) for v in node]
            return sh(node)

        return _map(tree)

    out = {
        "levels": op_specs(data["levels"]),
        "p": op_specs(data["p"]),
        "pt": op_specs(data["pt"]),
        "coarse": jax.tree.map(lambda x: P(), data["coarse"]),
        "fine_diag": sh(data["fine_diag"]),
    }
    for k in ("perm", "iperm"):
        if k in data:
            out[k] = sh(data[k])
    return out


def squeeze_smg(data):
    """Drop the size-1 device axis shard_map leaves on sharded leaves
    (replicated coarse factors arrive whole)."""
    def sq(node):
        # mirror smg_specs: replicated far cols arrive whole
        if isinstance(node, dict):
            return {
                k: (v if k == "cols_rep" else sq(v))
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [sq(v) for v in node]
        return node[0]

    out = {
        "levels": sq(data["levels"]),
        "p": sq(data["p"]),
        "pt": sq(data["pt"]),
        "coarse": data["coarse"],
        "fine_diag": data["fine_diag"][0],
    }
    for k in ("perm", "iperm"):
        if k in data:
            out[k] = data[k][0]
    return out


class ShardedMG:
    """Drop-in for ``_GatheredMG`` (duck-types ``apply(A0, r_loc)``) with
    the V-cycle running on sharded vectors.  ``data`` arrives through
    shard_map (leading device axis already consumed); ``meta`` is
    closure-static.  ``solver_len`` is the solver's local vector length
    (sum of per-tag blocks); the hierarchy rows are that layout padded
    to a multiple of R_BLOCK per device."""

    def __init__(self, data, meta: SMGMeta, n_dev: int,
                 fine_diag=None, use_pallas: bool = False,
                 solver_len: Optional[int] = None):
        self.data = data
        self.meta = meta
        self.n_dev = n_dev
        self.fine_diag = fine_diag
        self.use_pallas = use_pallas
        self.solver_len = solver_len

    def apply(self, A0, r_loc):
        L = r_loc.shape[0]
        pad = self.meta.levels[0].Bd - L
        r = jnp.pad(r_loc, (0, pad)) if pad else r_loc
        # device-local RCM layout of the hierarchy (rcm_block_perm): one
        # O(Bd) gather in and out of MG order per application
        perm = self.data.get("perm")
        if perm is not None:
            r = r[perm]
        z = self._cycle(0, r)
        if perm is not None:
            z = z[self.data["iperm"]]
        return z[:L] if pad else z

    def apply_batch(self, A0b, R):
        """(B, L) residual rows -> (B, L).  The ion batch is tiny (2-3
        solved ions), so an unrolled row loop keeps the V-cycle's window
        collectives 1-D; XLA still overlaps the independent rows."""
        return jnp.stack(
            [self.apply(None, R[i]) for i in range(R.shape[0])]
        )

    def _op(self, i: int, x_loc):
        lm = self.meta.levels[i]
        return _smv(self.data["levels"][i], lm.wins, lm.f_max, lm.Bd, lm.Bc,
                    x_loc, self.n_dev, self.use_pallas)

    def _restrict(self, i: int, r_loc):
        om = self.meta.pt_meta[i]
        return _smv(self.data["pt"][i], om.wins, om.f_max, om.Bd, om.Bc,
                    r_loc, self.n_dev, self.use_pallas)

    def _prolong(self, i: int, xc_loc):
        om = self.meta.p_meta[i]
        return _smv(self.data["p"][i], om.wins, om.f_max, om.Bd, om.Bc,
                    xc_loc, self.n_dev, self.use_pallas)

    def _coarse_solve(self, r_loc):
        n_c = self.meta.n_coarse
        V = self.data["coarse"]["V"]
        ilam = self.data["coarse"]["ilam"]
        rg = jax.lax.all_gather(r_loc, AXIS, tiled=True)[:n_c]
        xg = V @ (ilam * (V.T @ rg))
        d = jax.lax.axis_index(AXIS)
        Bd = r_loc.shape[0]  # coarsest-vector block per device
        xp = jnp.pad(xg, (0, self.n_dev * Bd - n_c))
        return jax.lax.dynamic_slice_in_dim(xp, d * Bd, Bd)

    def _cycle(self, i: int, r):
        if i == len(self.meta.levels):
            return self._coarse_solve(r)
        lv = self.data["levels"][i]
        lm = self.meta.levels[i]
        dinv = lv["dinv"]
        steps = lv["steps"][0] if lv["steps"].ndim == 2 else lv["steps"]
        k = lm.k_steps
        x = steps[0] * (dinv * r)
        for j in range(1, k):
            x = x + steps[j] * (dinv * (r - self._op(i, x)))
        for _ in range(self.meta.nu - 1):
            for j in range(k):
                x = x + steps[j] * (dinv * (r - self._op(i, x)))
        rc_in = r - self._op(i, x)
        # pt input block (Bc) must match the fine Bd: identical by
        # construction (pt rows = coarse, cols = fine)
        rc = self._restrict(i, rc_in)
        xc = self._cycle(i + 1, rc)
        x = x + self._prolong(i, xc)
        for _ in range(self.meta.nu):
            for j in range(k - 1, -1, -1):
                x = x + steps[j] * (dinv * (r - self._op(i, x)))
        return x
