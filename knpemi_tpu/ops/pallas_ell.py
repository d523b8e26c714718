"""Windowed-ELL sparse matvec kernels in Pallas (TPU).

The MG hierarchy's transfer operators and lagged level operators are
general sparse matrices.  The two layouts that existed before this
module both hit a TPU pathology at flagship scale (840k dofs):

* ELL + XLA gather: random gathers run ~140M elem/s — the level-0
  P/Pt transfers cost 13-15 ms EACH per V-cycle, ~45% of the cycle.
* block-banded dense slabs (solvers/mg.py::_csr_to_banded): the slab
  pays W x n bytes of HBM per apply; the flagship KNP fine operator
  needed a 4 GB slab (0.1% occupancy, 14.8 ms/apply), and the smoothed
  prolongator needs 3.1 GB (refused -> ELL fallback).

This layout keeps the K-entries-per-row ELL structure but replaces the
random gather/scatter with the factored one-hot MXU products of
ops/pallas_assembly.py, windowed per row-chunk:

* rows are processed in contiguous chunks of C; each chunk's column
  ids live in a window of Wr x 128 entries starting at a per-chunk,
  8-group-aligned offset q (bandwidth-ordered matrices — RCM dofs,
  min-index-relabeled aggregates — have narrow per-chunk spans);
* the SOURCE/DESTINATION vector is VMEM-RESIDENT in (G, 128) group
  layout (n <= ~2M fits: 8 MB), and the window is a dynamic sublane
  slice x_ref[pl.ds(q, Wr), :] — no window materialization in HBM;
* the in-window gather/scatter is a factored one-hot product over the
  SHORT Wr axis (microbenchmark: gather+scatter at Wr=40, KC=1536 runs
  ~0.4 us/chunk — MXU peak — vs ~25 us/chunk for the equivalent XLA
  gathers);
* entries outside their chunk's window spill to a fixed-capacity COO
  remainder applied by XLA scatter-add (zero-padded so refreshed
  hierarchies keep the compiled step's shapes).

Exactness: gathers split the f32 operand into bf16 passes against the
EXACT one-hot factor — 3 passes (3 x 8 mantissa bits) reproduce the
f32 gather bit-for-bit; the TPU production default is the certified
2-pass fast path (see _ELLW_PASSES below); values multiply on the VPU
in f32.

Used by solvers/mg.py for transfers and lagged level operators whose
banded slab would exceed the fast-slab budget.  Cite: reference
pdeSolver.py:24-38 (hypre BoomerAMG preconditioner application).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_assembly import (
    _dot3,
    _split3_bf16,
    _lane_sum,
    _lane_tile,
)

# Pass count of the bf16-split one-hot products (KNPEMI_ELLW_PASSES).
# 3 reproduces the f32 significand exactly; 2 truncates the VECTOR
# operand to 16 mantissa bits (~7.6e-6 relative input noise) for a 1/3
# cut in the tile-issue-bound MXU work.  Every ellw consumer is a
# preconditioner operator (lagged smoother ops, AP, P/Pt), so solutions
# are unaffected either way — only Krylov iteration counts could move,
# and they do not: measured on the 840k-dof flagship (RESULTS round 5),
# 2-pass runs 679.8 vs 764.6 ms/step (-11.1%) at IDENTICAL stimulated
# iteration counts (EMI 9 / KNP 7), with 100-step field equivalence at
# the f32-ULP level (max |dphi_M| 6.9e-5 mV, final rel L2 ~1e-6).
# Default: 2 on TPU (the certified fast path), 3 elsewhere (the tests'
# exactness contract); env overrides both.
_ELLW_PASSES = os.environ.get("KNPEMI_ELLW_PASSES")


def _passes() -> int:
    global _ELLW_PASSES
    if _ELLW_PASSES is None:
        _ELLW_PASSES = (
            2 if jax.devices()[0].platform in ("tpu", "axon") else 3
        )
    return int(_ELLW_PASSES)


def _splitN(v):
    return _split3_bf16(v)[:_passes()]


def _dotN(a, b, dims, out_dtype):
    if _passes() >= 3:
        return _dot3(a, b, dims, out_dtype)
    d = lambda p: jax.lax.dot_general(
        p, b, (dims, ((), ())), preferred_element_type=out_dtype,
        precision=jax.lax.Precision.DEFAULT,
    )
    parts = _splitN(a)
    out = d(parts[0])
    for p in parts[1:]:
        out = out + d(p)
    return out


@dataclasses.dataclass
class ELLW:
    """Host-side windowed-ELL layout of one sparse matrix (see module
    docstring).  Lane layout is slot-blocked like BlockedCells:
    lane j*C + c = (row c of the chunk, slot j)."""

    n_rows: int
    n_cols: int
    C: int          # rows per chunk
    K: int          # padded slots per row
    NCH: int        # number of chunks
    Wr: int         # window height in 128-element groups
    G: int          # padded source groups (>= max(q) + Wr, mult of 8)
    q: np.ndarray       # (NCH,) int32 window start group, multiple of 8
    lidx: np.ndarray    # (NCH, 1, K*C) int32 window-local ids
    vals: np.ndarray    # (NCH, 1, K*C) float
    far_rows: np.ndarray  # (far_cap,) int32 (zero-padded: val 0 -> no-op)
    far_cols: np.ndarray
    far_vals: np.ndarray
    far_cap: int

    _ARRAYS = ("q", "lidx", "vals", "far_rows", "far_cols", "far_vals")
    _STATIC = ("n_rows", "n_cols", "C", "K", "NCH", "Wr", "G", "far_cap")

    def device(self, dtype=None) -> "ELLW":
        conv = lambda name, a: jnp.asarray(
            a, dtype=dtype if (dtype and name.endswith("vals")) else None
        )
        return dataclasses.replace(self, **{
            f: conv(f, getattr(self, f)) for f in self._ARRAYS
        })

    @property
    def nbytes(self) -> int:
        return sum(
            np.asarray(getattr(self, f)).nbytes for f in self._ARRAYS
        )


jax.tree_util.register_pytree_node(
    ELLW,
    lambda e: (
        tuple(getattr(e, f) for f in ELLW._ARRAYS),
        tuple(getattr(e, f) for f in ELLW._STATIC),
    ),
    lambda aux, ch: ELLW(
        **dict(zip(ELLW._STATIC, aux)), **dict(zip(ELLW._ARRAYS, ch))
    ),
)


def _pad_pow2(k: int) -> int:
    p = 8
    while p < k:
        p *= 2
    return p


def build_ellw(
    A,
    Wr_cap: int = 128,
    far_frac_max: float = 0.10,
    force_shape: Optional[tuple] = None,
) -> Optional[ELLW]:
    """Build the windowed-ELL layout of a scipy CSR matrix.

    Returns None when more than ``far_frac_max`` of the entries would
    spill outside every chunk's window (the matrix is not bandwidth-
    ordered enough for this layout).  ``force_shape`` = (C, K, Wr, G,
    far_cap) reuses a previous layout's static shape so a refreshed
    hierarchy keeps the compiled step valid (raises ValueError if the
    new matrix does not fit — mirror of refresh_hierarchy's banded
    drift contract)."""
    import scipy.sparse as sp  # noqa: F401  (type context)

    A = A.tocsr()
    n, m = A.shape
    indptr, indices, data = A.indptr, A.indices, A.data
    row_nnz = np.diff(indptr)
    if force_shape is None:
        K = _pad_pow2(max(1, int(row_nnz.max())))
        if K > 256:
            return None
        C = max(8, 2048 // K)
    else:
        C, K, Wr_f, G_f, far_cap_f = force_shape
        if int(row_nnz.max()) > K:
            raise ValueError(
                f"ellw refill: row nnz {int(row_nnz.max())} exceeds the "
                f"frozen K={K}: sparsity pattern drifted"
            )
    NCH = -(-n // C)
    npad = NCH * C

    # per-chunk window CENTER from the mean column group — robust to a
    # few stray entries (an absolute min would let one outlier drag the
    # window off the band and spill everything); start aligned down to
    # 8 groups for the f32 sublane tiling of the dynamic slice
    rows = np.repeat(np.arange(n), row_nnz)
    chunk = rows // C
    col_grp = indices // 128
    cnt = np.maximum(1, np.bincount(chunk, minlength=NCH))
    mean_g = np.bincount(chunk, weights=col_grp, minlength=NCH) / cnt

    def starts(Wr_try):
        # floor-alignment to 8 groups loses up to 7 groups of placement:
        # aiming the aligned start at (center - Wr/2 + 4) guarantees the
        # window covers a half-band of (Wr/2 - 4) groups either side
        q = np.rint(mean_g - Wr_try / 2.0 + 4.0).astype(np.int64)
        return np.clip((q // 8) * 8, 0, None)

    if force_shape is None:
        # Smallest 8-multiple window covering enough entries — but keep
        # widening (up to 2x that width) if a SPILL-FREE window exists:
        # far entries pay a ~28 ns/entry gather+scatter per apply, so
        # e.g. the flagship EMI fine level at Wr=72 carried 117k far
        # entries (~3.3 ms/apply) that a Wr=96 window absorbs outright
        # into the streamed slab (round-4 probe; zero far at 96).
        first = zero = None
        for Wc in range(8, Wr_cap + 1, 8):
            q_try = starts(Wc)
            off = col_grp - q_try[chunk]
            frac_out = np.mean((off < 0) | (off >= Wc))
            if first is None and frac_out <= 0.5 * far_frac_max:
                first = Wc
            if frac_out == 0.0:
                zero = Wc
                break
            if first is not None and Wc >= 2 * first:
                break
        if first is None and zero is None:
            Wr = -(-Wr_cap // 8) * 8
        elif zero is not None and (first is None or zero <= 2 * first):
            Wr = zero
        else:
            Wr = first
    else:
        Wr = Wr_f
    qc = starts(Wr)

    inside = (col_grp - qc[chunk] >= 0) & (col_grp - qc[chunk] < Wr)
    n_far = int((~inside).sum())
    if force_shape is None and n_far > far_frac_max * max(1, A.nnz):
        return None

    # compact inside entries per row into slots 0..k-1
    ins_idx = np.flatnonzero(inside)
    r_ins = rows[ins_idx]
    # stable per-row slot ids for the inside entries
    slot = np.zeros(A.nnz, np.int64)
    csum = np.cumsum(inside)
    row_start_csum = np.concatenate([[0], csum])[indptr[:-1]]
    slot[ins_idx] = csum[ins_idx] - 1 - row_start_csum[r_ins]
    if force_shape is not None and len(ins_idx):
        if int(slot[ins_idx].max()) >= K:
            raise ValueError("ellw refill: slots exceed frozen K")

    KC = K * C
    lidx = np.zeros((NCH, 1, KC), np.int32)
    vals = np.zeros((NCH, 1, KC), data.dtype)
    ch = chunk[ins_idx]
    c_loc = (rows[ins_idx] % C).astype(np.int64)
    lane = slot[ins_idx] * C + c_loc
    lidx[ch, 0, lane] = (indices[ins_idx] - qc[ch] * 128).astype(np.int32)
    vals[ch, 0, lane] = data[ins_idx]

    far_idx = np.flatnonzero(~inside)
    if force_shape is None:
        far_cap = 0
        while far_cap < n_far:
            far_cap = max(64, far_cap * 2)
    else:
        far_cap = far_cap_f
        if n_far > far_cap:
            raise ValueError(
                f"ellw refill: {n_far} far entries exceed the frozen "
                f"capacity {far_cap}: sparsity pattern drifted"
            )
    far_rows = np.zeros(far_cap, np.int32)
    far_cols = np.zeros(far_cap, np.int32)
    far_vals = np.zeros(far_cap, data.dtype)
    if n_far:
        far_rows[:n_far] = rows[far_idx]
        far_cols[:n_far] = indices[far_idx]
        far_vals[:n_far] = data[far_idx]

    # padded source groups: the dynamic slice q..q+Wr must stay in range
    G = int(max(qc.max() + Wr, -(-m // 128)))
    G = -(-G // 8) * 8
    if force_shape is not None:
        if G > G_f:
            raise ValueError("ellw refill: source padding grew")
        G = G_f
    return ELLW(
        n_rows=n, n_cols=m, C=C, K=K, NCH=NCH, Wr=Wr, G=G,
        q=qc.astype(np.int32), lidx=lidx, vals=vals,
        far_rows=far_rows, far_cols=far_cols, far_vals=far_vals,
        far_cap=far_cap,
    )


def _to_groups(x: jnp.ndarray, G: int) -> jnp.ndarray:
    """(m,) -> (G, 128) zero-padded group layout."""
    m = x.shape[-1]
    pad = G * 128 - m
    return jnp.pad(x, (0, pad)).reshape(G, 128)


def _from_groups(x2: jnp.ndarray, m: int) -> jnp.ndarray:
    return x2.reshape(-1)[:m]


def _onehot_w(li: jnp.ndarray, Wr: int):
    """li (1, KC) window-local ids -> E_hi (Wr, KC) bf16, E_lo (128, KC)
    bool (hi = group, lo = element within group)."""
    KC = li.shape[1]
    hi = li // 128
    lo = li % 128
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (Wr, KC), 0)
    E_hi = (iota_w == hi).astype(jnp.bfloat16)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (128, KC), 0)
    E_lo = iota_s == lo
    return E_hi, E_lo


def _make_gather_kernel(C: int, K: int, Wr: int):
    def kern(q_ref, x_ref, li_ref, v_ref, out_ref):
        i = pl.program_id(0)
        q = pl.multiple_of(q_ref[i], 8)
        x2 = x_ref[pl.ds(q, Wr), :]        # (Wr, 128)
        li = li_ref[0]                     # (1, KC)
        vals = v_ref[0]
        E_hi, E_lo = _onehot_w(li, Wr)
        # gather: R[s, kc] = sum_g x2[g, s] E_hi[g, kc]  (f32-exact)
        R = _dotN(x2, E_hi, ((0,), (0,)), jnp.float32)   # (128, KC)
        xe = jnp.sum(jnp.where(E_lo, R, 0.0), axis=0, keepdims=True)
        ye = xe * vals
        out_ref[0] = _lane_sum(ye, K, C)   # (1, C)

    return kern


def _make_scatter_kernel(C: int, K: int, Wr: int):
    def kern(q_ref, r_ref, li_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        q = pl.multiple_of(q_ref[i], 8)
        re = r_ref[0]                       # (1, C)
        ye = _lane_tile(re, K) * v_ref[0]   # (1, KC)
        li = li_ref[0]
        E_hi, E_lo = _onehot_w(li, Wr)
        lo_b = E_lo.astype(jnp.bfloat16)
        acc = None
        for part in _splitN(ye):
            V = lo_b * part                 # (128, KC) bf16, exact terms
            # y2[g, s] = sum_kc E_hi[g, kc] V[s, kc]
            y2 = jax.lax.dot_general(
                E_hi, V, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )                               # (Wr, 128)
            acc = y2 if acc is None else acc + y2
        out_ref[pl.ds(q, Wr), :] += acc

    return kern


def _far_gather(y, e: ELLW, x):
    if e.far_cap == 0:
        return y
    return y.at[e.far_rows].add(
        e.far_vals.astype(y.dtype) * x[e.far_cols]
    )


def _far_scatter(y, e: ELLW, r):
    if e.far_cap == 0:
        return y
    return y.at[e.far_cols].add(
        e.far_vals.astype(y.dtype) * r[e.far_rows]
    )


def ellw_matvec(e: ELLW, x: jnp.ndarray, interpret: bool = False):
    """y = A @ x with A in windowed-ELL layout; x is (n_cols,)."""
    if x.dtype == jnp.float64:  # CPU f64 path: plain XLA (tests only)
        return _ellw_matvec_xla(e, x)
    KC = e.K * e.C
    x2 = _to_groups(x, e.G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e.NCH,),
        in_specs=[
            pl.BlockSpec((e.G, 128), lambda i, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, e.C), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    yc = pl.pallas_call(
        _make_gather_kernel(e.C, e.K, e.Wr),
        out_shape=jax.ShapeDtypeStruct((e.NCH, 1, e.C), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(e.q, x2, e.lidx, e.vals.astype(x.dtype))
    y = yc.reshape(-1)[: e.n_rows]
    return _far_gather(y, e, x)


def ellw_rmatvec(e: ELLW, r: jnp.ndarray, interpret: bool = False):
    """y = A.T @ r with A in windowed-ELL layout; r is (n_rows,)."""
    if r.dtype == jnp.float64:
        return _ellw_rmatvec_xla(e, r)
    KC = e.K * e.C
    rc = jnp.pad(r, (0, e.NCH * e.C - e.n_rows)).reshape(e.NCH, 1, e.C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e.NCH,),
        in_specs=[
            pl.BlockSpec((1, 1, e.C), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((e.G, 128), lambda i, q: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        _make_scatter_kernel(e.C, e.K, e.Wr),
        out_shape=jax.ShapeDtypeStruct((e.G, 128), r.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(e.q, rc, e.lidx, e.vals.astype(r.dtype))
    y = _from_groups(y2, e.n_cols)
    return _far_scatter(y, e, r)


def _ellw_matvec_xla(e: ELLW, x):
    """Reference/f64 path: same arithmetic via XLA gathers."""
    KC = e.K * e.C
    gidx = e.q[:, None] * 128 + jnp.asarray(e.lidx).reshape(e.NCH, KC)
    xp = jnp.pad(x, (0, e.G * 128 - e.n_cols))
    xe = xp[gidx]                            # (NCH, KC)
    ye = xe * jnp.asarray(e.vals).reshape(e.NCH, KC).astype(x.dtype)
    yr = ye.reshape(e.NCH, e.K, e.C).sum(axis=1)
    y = yr.reshape(-1)[: e.n_rows]
    return _far_gather(y, e, x)


def _ellw_rmatvec_xla(e: ELLW, r):
    KC = e.K * e.C
    gidx = e.q[:, None] * 128 + jnp.asarray(e.lidx).reshape(e.NCH, KC)
    rp = jnp.pad(r, (0, e.NCH * e.C - e.n_rows)).reshape(e.NCH, 1, e.C)
    rl = jnp.tile(rp, (1, e.K, 1)).reshape(e.NCH, KC)
    ye = rl * jnp.asarray(e.vals).reshape(e.NCH, KC).astype(r.dtype)
    y = jnp.zeros(e.G * 128, r.dtype).at[gidx.reshape(-1)].add(
        ye.reshape(-1)
    )[: e.n_cols]
    return _far_scatter(y, e, r)


def _make_gather_kernel_batch(B: int, C: int, K: int, Wr: int):
    def kern(q_ref, x_ref, li_ref, v_ref, out_ref):
        i = pl.program_id(0)
        q = pl.multiple_of(q_ref[i], 8)
        li = li_ref[0]
        vals = v_ref[0]
        E_hi, E_lo = _onehot_w(li, Wr)      # built ONCE, shared over B
        rows = []
        for b in range(B):
            x2 = x_ref[b, pl.ds(q, Wr), :]  # (Wr, 128)
            R = _dotN(x2, E_hi, ((0,), (0,)), jnp.float32)
            xe = jnp.sum(jnp.where(E_lo, R, 0.0), axis=0, keepdims=True)
            rows.append(_lane_sum(xe * vals, K, C))
        out_ref[0] = jnp.concatenate(rows, axis=0)  # (B, C)

    return kern


def _make_scatter_kernel_batch(B: int, C: int, K: int, Wr: int):
    def kern(q_ref, r_ref, li_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        q = pl.multiple_of(q_ref[i], 8)
        li = li_ref[0]
        vals = v_ref[0]
        E_hi, E_lo = _onehot_w(li, Wr)
        lo_b = E_lo.astype(jnp.bfloat16)
        for b in range(B):
            re = r_ref[0, b : b + 1]        # (1, C)
            ye = _lane_tile(re, K) * vals
            acc = None
            for part in _splitN(ye):
                V = lo_b * part
                y2 = jax.lax.dot_general(
                    E_hi, V, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                acc = y2 if acc is None else acc + y2
            out_ref[b, pl.ds(q, Wr), :] += acc

    return kern


_BATCH_NATIVE_MAX = 8


def ellw_matvec_batch(e: ELLW, X: jnp.ndarray, interpret: bool = False):
    """(B, n_cols) -> (B, n_rows).  For small B the batch runs in ONE
    kernel sharing the lane reads and one-hot construction across rows
    (the KNP ion-batched V-cycle path: B=3 costs ~1.5x one row, not
    3x); larger batches fall back to vmap."""
    B = X.shape[0]
    if X.dtype == jnp.float64 or B > _BATCH_NATIVE_MAX:
        return jax.vmap(lambda x: ellw_matvec(e, x, interpret))(X)
    KC = e.K * e.C
    X2 = jax.vmap(lambda x: _to_groups(x, e.G))(X)  # (B, G, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e.NCH,),
        in_specs=[
            pl.BlockSpec((B, e.G, 128), lambda i, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, e.C), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    Yc = pl.pallas_call(
        _make_gather_kernel_batch(B, e.C, e.K, e.Wr),
        out_shape=jax.ShapeDtypeStruct((e.NCH, B, e.C), X.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(e.q, X2, e.lidx, e.vals.astype(X.dtype))
    Y = jnp.moveaxis(Yc, 1, 0).reshape(B, -1)[:, : e.n_rows]
    return jax.vmap(lambda y, x: _far_gather(y, e, x))(Y, X)


def ellw_rmatvec_batch(e: ELLW, R: jnp.ndarray, interpret: bool = False):
    B = R.shape[0]
    if R.dtype == jnp.float64 or B > _BATCH_NATIVE_MAX:
        return jax.vmap(lambda r: ellw_rmatvec(e, r, interpret))(R)
    KC = e.K * e.C
    Rc = jnp.moveaxis(
        jnp.pad(R, ((0, 0), (0, e.NCH * e.C - e.n_rows))).reshape(
            B, e.NCH, e.C
        ), 1, 0,
    )  # (NCH, B, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e.NCH,),
        in_specs=[
            pl.BlockSpec((1, B, e.C), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, e.G, 128), lambda i, q: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    Y2 = pl.pallas_call(
        _make_scatter_kernel_batch(B, e.C, e.K, e.Wr),
        out_shape=jax.ShapeDtypeStruct((B, e.G, 128), R.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(e.q, Rc, e.lidx, e.vals.astype(R.dtype))
    Y = Y2.reshape(B, -1)[:, : e.n_cols]
    return jax.vmap(lambda y, r: _far_scatter(y, e, r))(Y, R)
