"""Blocked P1 assembly kernels in Pallas (TPU) — gather/scatter-free matvecs.

XLA lowers random-index gather/scatter on TPU to ~140M elem/s — three
orders of magnitude below HBM bandwidth — which makes naive FEM assembly
(x[cells] ... scatter-add) the dominant cost of every Krylov iteration.
This module replaces both memory operations with MXU matmuls:

* dofs are Morton-ordered and cells sorted by min-dof (ops/geometry.py),
  so the cells of a dof-stride block [b*S, (b+1)*S) touch only a compact
  dof window [b*S, b*S + W);
* window vectors are built with reshape+roll (contiguous, fast);
* the in-window gather/scatter become a SINGLE one-hot matmul per
  direction, with the cell-vertex slots FLATTENED INTO THE LANE AXIS:
      lanes of a chunk = [slot0 cells | slot1 cells | ... ]   (k*C wide)
      E[w, j*C+c] = (cells[c, j] - b*S == w)                  (W, k*C)
      gather    xe = x_row @ E                                (1, k*C)
      scatter   yw = E @ ye^T                                 (W, m)
  Cross-slot reductions (element sums) are 128-aligned lane-block adds.
  This shape is what Mosaic lowers cleanly: strictly 2-D values, no
  sublane-offset slicing of intermediate results, no loop-carried
  multi-buffer state (all of which fail to legalize);
* per-window partial outputs are combined by shifted adds — no scatter
  anywhere;
* all matmuls use Precision.HIGHEST (the MXU default truncates f32
  inputs to bf16, which would corrupt the gathered values).

For the EMI operator the per-cell conductivity weight (vols * mean
kappa) is prepared ONCE PER SOLVE in XLA (kappa is constant across CG
iterations), so the kernel gathers only x.  The KNP kernel emits the
three primitive actions [mass, stiffness, drift] in one pass; per-ion
operators are linear combinations formed outside.

Falls back transparently to the XLA path when blocking fails
(pathological Morton spread) or off-TPU; ``interpret=True`` runs the
same kernels on CPU for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class BlockedCells:
    """Host-side blocking of one subdomain's cells (see build_blocking).

    Lane-flattened chunk layouts (lane axis = k*C, slot-blocked):
      lidx_lane : (NB, NCH, 1, k*C) int32 window-local dof ids
      grads_lane: (NB, NCH, dim, k*C) basis gradient components
      vols_lane : (NB, NCH, 1, k*C) cell volumes (tiled across slots)
      cells_chunk: (NB, NCH, C, k) global dof ids (per-solve coefficient
                   preparation: kappa means, grad(phi))
    """

    n_dofs: int
    S: int
    W: int
    n_spill: int
    n_blocks: int
    C: int
    n_chunks: int
    k: int
    dim: int
    lidx_lane: np.ndarray
    grads_lane: np.ndarray
    vols_lane: np.ndarray
    cells_chunk: np.ndarray
    # outlier cells whose Morton dof spread exceeds the window: processed
    # by the XLA scatter fallback (a small tail, typically <=1 percent)
    rest_cells: np.ndarray = None
    rest_grads: np.ndarray = None
    rest_vols: np.ndarray = None

    _ARRAYS = (
        "lidx_lane", "grads_lane", "vols_lane", "cells_chunk",
        "rest_cells", "rest_grads", "rest_vols",
    )
    _STATIC = (
        "n_dofs", "S", "W", "n_spill", "n_blocks", "C", "n_chunks",
        "k", "dim",
    )

    def device(self, dtype=None) -> "BlockedCells":
        """Copy with the array fields as committed device arrays (float
        fields cast to ``dtype``).  Device-resident blockings travel as
        jit ARGUMENTS through Simulation._chunk's payload — baked-in
        numpy constants blow the remote-compile payload bound (HTTP 413
        at flagship scale: ~250 MB of lane arrays)."""

        def conv(name, a):
            if a is None:
                return None
            flt = name in ("grads_lane", "vols_lane", "rest_grads",
                           "rest_vols")
            return jnp.asarray(a, dtype=dtype if (flt and dtype) else None)

        return dataclasses.replace(self, **{
            f: conv(f, getattr(self, f)) for f in self._ARRAYS
        })


jax.tree_util.register_pytree_node(
    BlockedCells,
    lambda bk: (
        tuple(getattr(bk, f) for f in BlockedCells._ARRAYS),
        tuple(getattr(bk, f) for f in BlockedCells._STATIC),
    ),
    lambda aux, children: BlockedCells(
        **dict(zip(BlockedCells._STATIC, aux)),
        **dict(zip(BlockedCells._ARRAYS, children)),
    ),
)


def build_blocking(
    cells: np.ndarray,
    grads: np.ndarray,
    vols: np.ndarray,
    n_dofs: int,
    S: int = 512,
    max_spill: int = 31,
    vmem_budget: int = 12 * 1024 * 1024,
    force_spill: Optional[int] = None,
) -> Optional[BlockedCells]:
    """Assign each cell to the block of its min dof; returns None if the
    Morton dof spread forces windows beyond `max_spill` strides.

    The factored-index kernels made wide windows cheap (per-chunk cost
    is ~KC * (2*W/128 + const) bytes of VMEM, no longer W*KC), so the
    spill cap is generous: Morton spread grows ~n^(2/3) and the old cap
    of 7 silently disabled the whole Pallas path at 3-D res 2 (the
    matvec fell back to 65 ms XLA gathers)."""
    k = cells.shape[1]
    dim = grads.shape[-1]
    cmin = cells.min(axis=1)
    spreads = cells.max(axis=1) - cmin
    # split off outlier cells that would blow up the window size
    limit = max_spill * S
    outlier = spreads > limit
    if outlier.mean() > 0.10:
        return None  # blocking not worthwhile; use the XLA path
    rest_cells = cells[outlier]
    rest_grads = grads[outlier]
    rest_vols = vols[outlier]
    cells = cells[~outlier]
    grads = grads[~outlier]
    vols = vols[~outlier]
    cmin = cmin[~outlier]
    spread = int(spreads[~outlier].max()) if (~outlier).any() else 0
    n_spill = -(-max(spread, 1) // S)
    if force_spill is not None:
        # uniform window across per-device blockings (parallel/sharded.py
        # stacks them with a leading device axis; shard_map needs one
        # static shape)
        assert force_spill >= n_spill
        n_spill = force_spill
    W = (n_spill + 1) * S
    NB = -(-n_dofs // S)
    bid = cmin // S
    order = np.argsort(bid, kind="stable")
    counts = np.bincount(bid, minlength=NB)
    Bmax = int(counts.max())
    # lanes per chunk under the factored-kernel VMEM model (E_hi is
    # (W/128, KC) bf16 + ~5 (128, KC) f32 temporaries)
    C = max(32, min(512, vmem_budget // (k * (W // 64 + 2560))))
    C = int(2 ** np.floor(np.log2(C)))
    while (k * C) % 128:
        C *= 2
    n_chunks = -(-Bmax // C)
    Bpad = C * n_chunks

    lidx = np.zeros((NB, Bpad, k), np.int32)
    g_b = np.zeros((NB, Bpad, k, dim), grads.dtype)
    v_b = np.zeros((NB, Bpad), vols.dtype)
    cg_b = np.zeros((NB, Bpad, k), np.int32)
    starts = np.zeros(NB + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for b in range(NB):
        ids = order[starts[b] : starts[b + 1]]
        m = len(ids)
        lidx[b, :m] = cells[ids] - b * S
        g_b[b, :m] = grads[ids]
        v_b[b, :m] = vols[ids]
        cg_b[b, :m] = cells[ids]
    assert lidx.min() >= 0 and lidx.max() < W

    # chunk, then flatten slots into lanes: lane j*C + c = (cell c, slot j)
    lidx_lane = (
        lidx.reshape(NB, n_chunks, C, k)
        .transpose(0, 1, 3, 2)
        .reshape(NB, n_chunks, 1, k * C)
    )
    grads_lane = (
        g_b.reshape(NB, n_chunks, C, k, dim)
        .transpose(0, 1, 4, 3, 2)
        .reshape(NB, n_chunks, dim, k * C)
    )
    v_ch = v_b.reshape(NB, n_chunks, C)
    vols_lane = np.tile(v_ch, (1, 1, k)).reshape(NB, n_chunks, 1, k * C)
    cells_chunk = cg_b.reshape(NB, n_chunks, C, k)
    return BlockedCells(
        n_dofs=n_dofs, S=S, W=W, n_spill=n_spill, n_blocks=NB, C=C,
        n_chunks=n_chunks, k=k, dim=dim,
        lidx_lane=np.ascontiguousarray(lidx_lane),
        grads_lane=np.ascontiguousarray(grads_lane),
        vols_lane=np.ascontiguousarray(vols_lane),
        cells_chunk=np.ascontiguousarray(cells_chunk),
        rest_cells=rest_cells.astype(np.int32),
        rest_grads=rest_grads,
        rest_vols=rest_vols,
    )


def tile_lanes(per_cell, k):
    """(NB, NCH, C) per-cell values -> (NB, NCH, 1, k*C) slot-tiled lanes."""
    t = jnp.concatenate([per_cell] * k, axis=-1)
    return t[:, :, None, :]


# ---------------------------------------------------------------------------
# window build / combine (XLA, reshape+roll only)
# ---------------------------------------------------------------------------
def make_windows(xs, bk: BlockedCells):
    """Stack fields (list of (n,) arrays) into windows (NB, nvars, W)."""
    NB, S, ns = bk.n_blocks, bk.S, bk.n_spill
    rows = []
    for x in xs:
        xp = jnp.pad(x, (0, NB * S - bk.n_dofs))
        xr = xp.reshape(NB, S)
        parts = [xr] + [jnp.roll(xr, -j, axis=0) for j in range(1, ns + 1)]
        rows.append(jnp.concatenate(parts, axis=1))  # (NB, W)
    return jnp.stack(rows, axis=1)  # (NB, nvars, W)


def make_windows_colmajor(xs, bk: BlockedCells):
    """Windows in column layout (NB, nvars, 128, W/128): entry (j, w)
    holds x_window[w*128 + j] — the operand shape of the factored-index
    kernels (gather step 1 contracts the W/128 axis)."""
    xw = make_windows(xs, bk)  # (NB, nvars, W)
    NB, nv, W = xw.shape
    return xw.reshape(NB, nv, W // 128, 128).transpose(0, 1, 3, 2)


def windows_from_colmajor(yw_col, bk: BlockedCells):
    """(NB, m, 128, W/128) kernel outputs -> (NB, m, W) lane-major."""
    NB, m, _, Wr = yw_col.shape
    return yw_col.transpose(0, 1, 3, 2).reshape(NB, m, Wr * 128)


def combine_windows(yw, bk: BlockedCells):
    """(NB, m, W) partial outputs -> (m, n) via shifted adds.

    The kernels emit window rows in (vars, W) orientation — the same
    operand-major layout as the gather dot, which is the one Mosaic
    lowers cleanly for bf16 x bf16 -> f32 products."""
    S, ns = bk.S, bk.n_spill
    acc = yw[..., :S]
    for j in range(1, ns + 1):
        acc = acc + jnp.roll(yw[..., j * S : (j + 1) * S], j, axis=0)
    m = yw.shape[1]
    out = jnp.moveaxis(acc, 1, 0).reshape(m, bk.n_blocks * S)
    return out[:, : bk.n_dofs]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=HIGHEST,
        preferred_element_type=a.dtype,
    )


def _split3_bf16(v):
    """f32 -> (hi, mid, lo) bf16 triple with hi+mid+lo == v to f32
    accuracy (3 x 8 mantissa bits covers the f32 significand)."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(v.dtype)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(v.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(a, b, dims, out_dtype):
    """f32-exact product of an f32 operand `a` with an EXACT-in-bf16
    operand `b` (one-hot): three native-rate bf16 MXU passes over the
    3-term split of `a` (3 x 8 mantissa bits cover the f32 significand).

    precision must be DEFAULT explicitly: the package sets
    jax_default_matmul_precision=highest globally on TPU, and Mosaic
    rejects bf16 operands with an fp32 contract precision ("Bad lhs
    type"); bf16 x bf16 at DEFAULT is the native full-rate MXU pass."""
    d = lambda p: jax.lax.dot_general(
        p, b, (dims, ((), ())), preferred_element_type=out_dtype,
        precision=jax.lax.Precision.DEFAULT,
    )
    hi, mid, lo = _split3_bf16(a)
    return d(hi) + d(mid) + d(lo)


def _onehot_factored(li, Wr):
    """Factored one-hot pair for window-local ids li (1, KC): the id
    splits as hi*128 + lo, and gather/scatter become MXU products over
    the SHORT W/128 axis plus a VPU sublane select — ~16x fewer MXU
    tile-issues than the flat (W, KC) one-hot (which is tile-issue
    bound, not bandwidth bound: bf16 storage did not move it)."""
    KC = li.shape[1]
    hi = li // 128
    lo = li % 128
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (Wr, KC), 0)
    E_hi = (iota_w == hi).astype(jnp.bfloat16)  # (Wr, KC)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (128, KC), 0)
    E_lo = iota_s == lo  # (128, KC) bool
    return E_hi, E_lo


def _gather_factored(x2t, E_hi, E_lo, out_dtype):
    """x2t (128, Wr) column-layout window -> xe (1, KC) exact gather."""
    R = _dot3(x2t, E_hi, ((1,), (0,)), out_dtype)  # (128, KC)
    return jnp.sum(jnp.where(E_lo, R, 0.0), axis=0, keepdims=True)


def _scatter_factored(ye, E_hi, E_lo, out_dtype):
    """ye (1, KC) lane values -> (128, Wr) column-layout window rows.

    V = E_lo * ye_part is exact in bf16 (0 or the bf16 split term), so
    three bf16 passes contract KC against E_hi exactly."""
    lo_b = E_lo.astype(jnp.bfloat16)
    acc = None
    for part in _split3_bf16(ye):
        V = lo_b * part  # (128, KC) bf16
        y = jax.lax.dot_general(
            V, E_hi, (((1,), (1,)), ((), ())),
            preferred_element_type=out_dtype,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = y if acc is None else acc + y
    return acc


def _lane_sum(row, k, C):
    """Sum the k slot-blocks of a (1, k*C) row -> (1, C)."""
    out = row[:, 0:C]
    for j in range(1, k):
        out = out + row[:, j * C : (j + 1) * C]
    return out


def _lane_tile(row_c, k):
    """Tile a (1, C) row into (1, k*C)."""
    return jnp.concatenate([row_c] * k, axis=1)


def _make_emi_kernel(k: int):
    def _emi_kernel(x_ref, lidx_ref, grads_ref, wv_ref, out_ref):
        """Weighted-stiffness action; wv = vols * mean(kappa) per cell,
        lane-tiled (prepared once per solve).  x arrives column-layout
        (128, W/128); indices factor through :func:`_onehot_factored`."""
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x2t = x_ref[0, 0]  # (128, Wr)
        li = lidx_ref[0, 0]  # (1, KC)
        gr = grads_ref[0, 0]  # (dim, KC)
        wv = wv_ref[0, 0]  # (1, KC)
        Wr = x2t.shape[1]
        KC = li.shape[1]
        dim = gr.shape[0]
        C = KC // k

        E_hi, E_lo = _onehot_factored(li, Wr)
        xe = _gather_factored(x2t, E_hi, E_lo, x2t.dtype)  # (1, KC)
        ye = jnp.zeros_like(xe)
        for d in range(dim):
            gd = gr[d : d + 1, :]
            gx = _lane_sum(gd * xe, k, C)  # (1, C)
            ye = ye + _lane_tile(gx, k) * gd
        ye = ye * wv
        out_ref[0, 0] += _scatter_factored(ye, E_hi, E_lo, x2t.dtype)

    return _emi_kernel


def _make_knp_kernel(k: int):
    def _knp_kernel(coef_ref, x_ref, lidx_ref, grads_ref, vols_ref, wc_ref,
                    out_ref):
        """Full KNP operator action in one pass: y = (1/dt) mass(x)
        + D stiffness(x) + z psi D drift(x).  The per-ion scalars arrive
        in SMEM as coef = [1/dt, D, z*psi*D]."""
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dt_inv = coef_ref[0]
        D = coef_ref[1]
        zpsiD = coef_ref[2]
        x2t = x_ref[0, 0]  # (128, Wr)
        li = lidx_ref[0, 0]  # (1, KC)
        gr = grads_ref[0, 0]  # (dim, KC)
        vols = vols_ref[0, 0]  # (1, KC)
        wc = wc_ref[0, 0]  # (dim, KC) grad(phi) lane rows
        Wr = x2t.shape[1]
        KC = li.shape[1]
        dim = gr.shape[0]
        C = KC // k

        E_hi, E_lo = _onehot_factored(li, Wr)
        xe = _gather_factored(x2t, E_hi, E_lo, x2t.dtype)  # (1, KC)
        xsum = _lane_tile(_lane_sum(xe, k, C), k)  # (1, KC)

        m_row = (vols / (k * (k + 1))) * (xsum + xe)
        s_row = jnp.zeros_like(xe)
        wg = jnp.zeros_like(xe)
        for d in range(dim):
            gd = gr[d : d + 1, :]
            gx = _lane_tile(_lane_sum(gd * xe, k, C), k)
            s_row = s_row + gx * gd
            wg = wg + wc[d : d + 1, :] * gd
        ye = (
            dt_inv * m_row
            + (D * vols) * s_row
            + (zpsiD * vols) * ((xsum / k) * wg)
        )
        out_ref[0, 0] += _scatter_factored(ye, E_hi, E_lo, x2t.dtype)

    return _knp_kernel


def _make_knp_kernel_batch(k: int, B: int):
    def _knp_kernel_b(x_ref, lidx_ref, grads_ref, vols_ref, wc_ref,
                      coef_ref, out_ref):
        """Batched KNP operator action: all B ion systems of one
        subdomain in a single pass.  x is (B, 128, Wr) column-layout;
        the per-ion scalars [1/dt, D, z*psi*D] arrive as a VMEM (B, 128)
        row table (cols 0..2 used).  The factored one-hots are built
        once and shared by every ion, so B systems cost ~1x."""
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        li = lidx_ref[0, 0]  # (1, KC)
        gr = grads_ref[0, 0]  # (dim, KC)
        vols = vols_ref[0, 0]  # (1, KC)
        wc = wc_ref[0, 0]  # (dim, KC)
        Wr = x_ref.shape[3]
        KC = li.shape[1]
        dim = gr.shape[0]
        C = KC // k

        E_hi, E_lo = _onehot_factored(li, Wr)
        wg = jnp.zeros_like(gr[0:1])
        for d in range(dim):
            wg = wg + wc[d : d + 1, :] * gr[d : d + 1, :]
        for b in range(B):
            x2t = x_ref[0, b]  # (128, Wr)
            dt_inv = coef_ref[b : b + 1, 0:1]  # (1, 1)
            D = coef_ref[b : b + 1, 1:2]
            zpsiD = coef_ref[b : b + 1, 2:3]
            xe = _gather_factored(x2t, E_hi, E_lo, x2t.dtype)  # (1, KC)
            xsum = _lane_tile(_lane_sum(xe, k, C), k)
            m_row = (vols / (k * (k + 1))) * (xsum + xe)
            s_row = jnp.zeros_like(xe)
            for d in range(dim):
                gd = gr[d : d + 1, :]
                gx = _lane_tile(_lane_sum(gd * xe, k, C), k)
                s_row = s_row + gx * gd
            ye = (
                dt_inv * m_row
                + (D * vols) * s_row
                + (zpsiD * vols) * ((xsum / k) * wg)
            )
            out_ref[0, b] += _scatter_factored(ye, E_hi, E_lo, x2t.dtype)

    return _knp_kernel_b


def knp_apply_blocked_batch(X, bk: BlockedCells, grads_lane, vols_lane,
                            drift, dt_inv, D_vec, z_vec, psi,
                            interpret=False):
    """Batched KNP operator action for all solved ions of one subdomain:
    X is (B, n); D_vec/z_vec are per-ion (B,) coefficient vectors (may be
    traced).  One kernel pass serves every ion (shared one-hot E)."""
    wc_lane, rest_w = drift
    B = X.shape[0]
    coef = jnp.zeros((B, 128), X.dtype)
    coef = coef.at[:, 0].set(jnp.asarray(dt_inv, X.dtype))
    coef = coef.at[:, 1].set(jnp.asarray(D_vec, X.dtype))
    coef = coef.at[:, 2].set(jnp.asarray(z_vec * psi * D_vec, X.dtype))
    xw = make_windows_colmajor(list(X), bk)  # (NB, B, 128, Wr)

    NB, W, KC = bk.n_blocks, bk.W, bk.k * bk.C
    Wr = W // 128
    NCH = bk.n_chunks
    out = pl.pallas_call(
        _make_knp_kernel_batch(bk.k, B),
        grid=(NB, NCH),
        in_specs=[
            pl.BlockSpec((1, B, 128, Wr), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk.dim, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk.dim, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 128, Wr), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, B, 128, Wr), X.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xw, jnp.asarray(bk.lidx_lane), grads_lane, vols_lane, wc_lane, coef)
    Y = combine_windows(windows_from_colmajor(out, bk), bk)  # (B, n)
    if len(bk.rest_cells):
        from . import kernels as K

        rc = jnp.asarray(bk.rest_cells)
        rg = jnp.asarray(bk.rest_grads, X.dtype)
        rv = jnp.asarray(bk.rest_vols, X.dtype)

        def one(x, D, zpD):
            return (
                dt_inv * K.mass_apply(bk.n_dofs, x, rc, rv)
                + D * K.stiffness_apply(bk.n_dofs, x, rc, rg, rv)
                + zpD * K.drift_apply(bk.n_dofs, x, rc, rg, rv, rest_w)
            )

        Y = Y + jax.vmap(one)(X, jnp.asarray(D_vec, X.dtype),
                              jnp.asarray(z_vec * psi * D_vec, X.dtype))
    return Y


def _grid_call(kernel, bk: BlockedCells, xw, extra, out_cols, interpret,
               scalars=None):
    NB, W, KC = bk.n_blocks, bk.W, bk.k * bk.C
    NCH = bk.n_chunks
    nvars = xw.shape[1]
    in_specs = []
    pre_args = []
    if scalars is not None:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)
        )
        pre_args.append(scalars)
    Wr = W // 128
    in_specs += [
        pl.BlockSpec((1, nvars, 128, Wr), lambda b, c: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk.dim, KC), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = pre_args + [xw, jnp.asarray(bk.lidx_lane), extra[0], extra[1]]
    if len(extra) > 2:  # drift vector rows (NB, NCH, dim, KC)
        in_specs.append(
            pl.BlockSpec((1, 1, bk.dim, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(extra[2])
    out = pl.pallas_call(
        kernel,
        grid=(NB, NCH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, out_cols, 128, Wr),
                               lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, out_cols, 128, Wr), xw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return windows_from_colmajor(out, bk)


def emi_stiffness_blocked(x, prep, bk: BlockedCells, grads_lane,
                          interpret=False):
    """y = (kappa-weighted stiffness) @ x; ``prep`` is the per-solve
    prepared coefficient from :func:`prepare_emi_weight`."""
    wvols_lane, rest_w = prep
    xw = make_windows_colmajor([x], bk)
    yw = _grid_call(_make_emi_kernel(bk.k), bk, xw,
                    (grads_lane, wvols_lane), 1, interpret)
    y = combine_windows(yw, bk)[0]
    if len(bk.rest_cells):
        from . import kernels as K

        y = y + K.stiffness_apply(
            bk.n_dofs, x, jnp.asarray(bk.rest_cells),
            jnp.asarray(bk.rest_grads, x.dtype),
            jnp.asarray(bk.rest_vols, x.dtype), coef_cell=rest_w,
        )
    return y


def knp_apply_blocked(x, bk: BlockedCells, grads_lane, vols_lane, drift,
                      dt_inv, D, zpsiD, interpret=False):
    """Full KNP operator action: (1/dt) mass + D stiffness + z psi D
    drift, in one kernel pass.  ``drift`` is the per-solve context from
    :func:`prepare_knp_drift`; the scalars may be traced (per-ion)."""
    wc_lane, rest_w = drift
    coef = jnp.stack([
        jnp.asarray(dt_inv, x.dtype),
        jnp.asarray(D, x.dtype),
        jnp.asarray(zpsiD, x.dtype),
    ])
    xw = make_windows_colmajor([x], bk)
    yw = _grid_call(_make_knp_kernel(bk.k), bk, xw,
                    (grads_lane, vols_lane, wc_lane), 1, interpret,
                    scalars=coef)
    y = combine_windows(yw, bk)[0]
    if len(bk.rest_cells):
        from . import kernels as K

        rc = jnp.asarray(bk.rest_cells)
        rg = jnp.asarray(bk.rest_grads, x.dtype)
        rv = jnp.asarray(bk.rest_vols, x.dtype)
        y = y + (
            dt_inv * K.mass_apply(bk.n_dofs, x, rc, rv)
            + D * K.stiffness_apply(bk.n_dofs, x, rc, rg, rv)
            + zpsiD * K.drift_apply(bk.n_dofs, x, rc, rg, rv, rest_w)
        )
    return y


def _make_facet_mass_kernel(k: int):
    def _facet_kernel(x_ref, lidx_ref, wv_ref, out_ref):
        """P1 facet (surface) mass action in MEMBRANE numbering:
        ye[f,i] = wv_f * (sum_j x_j + x_i), wv = area/(k(k+1)) lane-tiled.
        Same factored one-hot structure as the volume kernels; facets
        play the role of cells."""
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x2t = x_ref[0, 0]  # (128, Wr)
        li = lidx_ref[0, 0]  # (1, KC)
        wv = wv_ref[0, 0]  # (1, KC)
        Wr = x2t.shape[1]
        KC = li.shape[1]
        C = KC // k

        E_hi, E_lo = _onehot_factored(li, Wr)
        xe = _gather_factored(x2t, E_hi, E_lo, x2t.dtype)  # (1, KC)
        xsum = _lane_tile(_lane_sum(xe, k, C), k)
        ye = wv * (xsum + xe)
        out_ref[0, 0] += _scatter_factored(ye, E_hi, E_lo, x2t.dtype)

    return _facet_kernel


def build_facet_blocking(facet_dofs, areas, n_mem, S: int = 512,
                         max_spill: int = 31):
    """Blocking of membrane facets over the MEMBRANE dof numbering for
    :func:`facet_mass_blocked`.  Reuses :func:`build_blocking` with the
    facet incidence as 'cells', facet areas as 'vols' and dummy
    gradients (the facet mass kernel does not use them)."""
    nf, k = facet_dofs.shape
    dummy_grads = np.zeros((nf, k, 1), np.float32)
    return build_blocking(
        np.asarray(facet_dofs), dummy_grads, np.asarray(areas), n_mem,
        S=S, max_spill=max_spill,
    )


def facet_mass_blocked(x_m, bk: BlockedCells, wv_lane, interpret=False):
    """y_m = M_Gamma @ x_m in membrane numbering: the static P1 surface
    mass matrix applied gather/scatter-free.  ``wv_lane`` is the
    lane-tiled area/(k(k+1)) weight (= bk.vols_lane / (k(k+1))); the
    caller applies any scalar prefactor (C_phi) to the result.

    Replaces the facet-level XLA path of the EMI membrane coupling
    (emiWeakForm.py:164-165): gathering u at facet_idofs/edofs and
    scatter-adding duplicate-indexed values costs ~6x the random traffic
    of this membrane-space formulation (each membrane vertex belongs to
    ~6 surface facets)."""
    xw = make_windows_colmajor([x_m], bk)
    NB, W, KC = bk.n_blocks, bk.W, bk.k * bk.C
    NCH = bk.n_chunks
    Wr = W // 128
    out = pl.pallas_call(
        _make_facet_mass_kernel(bk.k),
        grid=(NB, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, 128, Wr), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128, Wr), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 1, 128, Wr), x_m.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xw, jnp.asarray(bk.lidx_lane), wv_lane)
    y = combine_windows(windows_from_colmajor(out, bk), bk)[0]
    if len(bk.rest_cells):
        from . import kernels as K

        k = bk.k
        rc = jnp.asarray(bk.rest_cells)
        rv = jnp.asarray(bk.rest_vols, x_m.dtype)
        vals = K.facet_mass_values(x_m[rc], rv)  # includes 1/(k(k+1))
        y = y + K.scatter_add(bk.n_dofs, rc, vals)
    return y


def _make_facet_gather_kernel(F: int):
    def _kern(x_ref, lidx_ref, out_ref):
        """Gather F membrane-space fields at the facet slots of one chunk:
        (F, 128, Wr) column-layout windows -> (F, KC) slot values."""
        x3 = x_ref[0]  # (F, 128, Wr)
        li = lidx_ref[0, 0]  # (1, KC)
        Wr = x3.shape[2]
        E_hi, E_lo = _onehot_factored(li, Wr)
        rows = [
            _gather_factored(x3[f], E_hi, E_lo, x3.dtype) for f in range(F)
        ]
        out_ref[0, 0] = jnp.concatenate(rows, axis=0)

    return _kern


def _make_facet_scatter_kernel(F: int):
    def _kern(v_ref, lidx_ref, out_ref):
        """Scatter-add F channels of per-slot values (F, KC) back into
        membrane-space windows (F, 128, Wr), accumulated over chunks."""
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        vals = v_ref[0, 0]  # (F, KC)
        li = lidx_ref[0, 0]
        Wr = out_ref.shape[3]
        E_hi, E_lo = _onehot_factored(li, Wr)
        for f in range(F):
            out_ref[0, f] += _scatter_factored(
                vals[f : f + 1], E_hi, E_lo, vals.dtype
            )

    return _kern


def facet_gather_blocked(X, bk: BlockedCells, interpret=False):
    """Gather F membrane-space fields X (F, n_mem) to facet-local slot
    values in the blocked layout: (NB, NCH, F, KC), lane j*C + c =
    (facet c, vertex slot j).  Padding slots carry the value of dof 0;
    callers must weight by the (zero-padded) facet areas.

    With :func:`facet_scatter_blocked` this turns arbitrary nonlinear
    facet-quadrature assembly into dense XLA math between two one-hot
    kernels — no random-index memory traffic (the XLA path's x[facet_dofs]
    gathers cost ~6x the membrane size per field because each membrane
    vertex belongs to ~6 surface facets)."""
    F = X.shape[0]
    xw = make_windows_colmajor(list(X), bk)  # (NB, F, 128, Wr)
    NB, W, KC = bk.n_blocks, bk.W, bk.k * bk.C
    NCH = bk.n_chunks
    Wr = W // 128
    return pl.pallas_call(
        _make_facet_gather_kernel(F),
        grid=(NB, NCH),
        in_specs=[
            pl.BlockSpec((1, F, 128, Wr), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, F, KC), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, NCH, F, KC), X.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xw, jnp.asarray(bk.lidx_lane))


def facet_scatter_blocked(V, bk: BlockedCells, interpret=False):
    """Scatter-add blocked per-slot values V (NB, NCH, F, KC) back to
    membrane space: returns (F, n_mem).  Inverse of
    :func:`facet_gather_blocked` (padding slots must hold zeros)."""
    NB, NCH, F, KC = V.shape
    W = bk.W
    Wr = W // 128
    out = pl.pallas_call(
        _make_facet_scatter_kernel(F),
        grid=(NB, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, F, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, KC), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, 128, Wr), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, F, 128, Wr), V.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(V, jnp.asarray(bk.lidx_lane))
    return combine_windows(windows_from_colmajor(out, bk), bk)


def build_interp_ellw(bk: BlockedCells, weights, Wr_cap: int = 128):
    """Freeze a dof-vector -> cell-lane linear map as a windowed-ELL
    operator (ops/pallas_ell.py).

    ``weights`` is (NB, NCH, R, k, C): output row (b, h, r, c) is
    sum_k weights[b,h,r,k,c] * x[cells_chunk[b,h,c,k]].  Row order is
    the flat (NB, NCH, R, C) layout, so an ellw_matvec result reshapes
    straight into the lane arrays the assembly kernels consume.  The
    per-solve coefficient preparations (mean-vertex kappa for EMI,
    grad(phi) per cell for KNP drift) are exactly such maps with
    CONSTANT weights — as plain XLA gathers they run ~140M elem/s and
    cost ~40 ms each per flagship solve.  Returns None when the cell
    ordering is not window-coherent enough (build_ellw's refusal)."""
    import scipy.sparse as sp

    from .pallas_ell import build_ellw

    NB, NCH, C, k = bk.cells_chunk.shape
    R = weights.shape[2]
    w = np.moveaxis(np.asarray(weights), 3, 4)  # (NB, NCH, R, C, k)
    cols = np.broadcast_to(bk.cells_chunk[:, :, None, :, :], w.shape)
    rows = np.broadcast_to(
        np.arange(NB * NCH * R * C, dtype=np.int64).reshape(NB, NCH, R, C)[
            ..., None
        ],
        w.shape,
    )
    nz = w != 0  # padding lanes carry zero weight: drop
    A = sp.coo_matrix(
        (w[nz].astype(np.float64), (rows[nz], cols[nz])),
        shape=(NB * NCH * R * C, bk.n_dofs),
    ).tocsr()
    return build_ellw(A, Wr_cap=Wr_cap)


def prepare_emi_weight(kappa, bk: BlockedCells, vols_lane,
                       kbar_ellw=None, interpret: bool = False):
    """Per-solve EMI coefficient: (vols * mean-vertex-kappa) lane-tiled,
    plus the outlier cells' mean-kappa.  With ``kbar_ellw`` (the frozen
    interp operator from :func:`build_interp_ellw`) the dof->cell mean
    runs as a windowed-ELL kernel; otherwise one XLA gather of kappa
    per solve."""
    if kbar_ellw is not None:
        from .pallas_ell import ellw_matvec

        kbar = ellw_matvec(kbar_ellw, kappa, interpret).reshape(
            bk.n_blocks, bk.n_chunks, bk.C
        )
    else:
        ke = kappa[bk.cells_chunk]  # (NB, NCH, C, k)
        kbar = ke.mean(axis=-1)  # (NB, NCH, C)
    rest_w = (
        kappa[jnp.asarray(bk.rest_cells)].mean(axis=-1)
        if len(bk.rest_cells)
        else None
    )
    return vols_lane * tile_lanes(kbar, bk.k), rest_w


def prepare_knp_drift(phi, bk: BlockedCells, grads_lane,
                      drift_ellw=None, interpret: bool = False):
    """Per-solve drift rows: grad(phi) per cell as (NB, NCH, dim, k*C)
    lane-tiled, plus the outlier cells' grad(phi).  With ``drift_ellw``
    (grads frozen into a windowed-ELL operator) the dof->cell product
    runs as a Pallas kernel; otherwise one XLA gather of phi per
    solve."""
    if drift_ellw is not None:
        from .pallas_ell import ellw_matvec

        w = ellw_matvec(drift_ellw, phi, interpret).reshape(
            bk.n_blocks, bk.n_chunks, bk.dim, bk.C
        )
    else:
        pe = phi[bk.cells_chunk]  # (NB, NCH, C, k)
        gl = grads_lane.reshape(
            bk.n_blocks, bk.n_chunks, bk.dim, bk.k, bk.C
        )
        pe_t = jnp.moveaxis(pe, -1, 2)  # (NB, NCH, k, C)
        w = jnp.einsum("bhdkc,bhkc->bhdc", gl, pe_t)  # (NB, NCH, dim, C)
    rest_w = None
    if len(bk.rest_cells):
        rest_w = jnp.einsum(
            "ckd,ck->cd", jnp.asarray(bk.rest_grads, phi.dtype),
            phi[jnp.asarray(bk.rest_cells)],
        )
    return jnp.concatenate([w] * bk.k, axis=-1), rest_w
