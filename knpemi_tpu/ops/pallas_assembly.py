"""Blocked P1 assembly kernels in Pallas (TPU) — gather/scatter-free matvecs.

XLA lowers random-index gather/scatter on TPU to ~140M elem/s — three
orders of magnitude below HBM bandwidth — which makes naive FEM assembly
(x[cells] ... scatter-add) the dominant cost of every Krylov iteration.
This module replaces both memory operations with MXU matmuls:

* dofs are Morton-ordered and cells sorted by min-dof (ops/geometry.py),
  so the cells of a dof-stride block [b*S, (b+1)*S) touch only a compact
  dof window [b*S, b*S + W);
* window vectors are built with reshape+roll (contiguous, fast), and the
  in-window gather/scatter become ONE-HOT MATMULS computed in VMEM:
      gather   x_e = E @ x_w        E[c*4+k, j] = (cells[c,k]-b*S == j)
      scatter  y_w = E^T @ y_e
  The one-hot never exists in HBM; FLOP overhead (W/4 per useful value)
  is the MXU's sweet spot;
* the per-window partial results are combined by shifted adds
  (reshape+roll again) — no scatter anywhere.

The kernels compute the three primitive element actions (mass, stiffness,
drift) in one pass so per-ion operators are linear combinations formed
outside (KNP), and the kappa-weighted stiffness directly (EMI).

Falls back transparently to the XLA path when blocking fails (pathological
Morton spread) or off-TPU; `interpret=True` makes the same kernels run
(slowly) on CPU for tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class BlockedCells:
    """Host-side blocking of one subdomain's cells (see build_blocking)."""

    n_dofs: int
    S: int  # dof stride per block
    W: int  # window size = (n_spill + 1) * S
    n_spill: int
    n_blocks: int
    C: int  # cells per kernel chunk
    n_chunks: int  # chunks per block (Bmax = C * n_chunks)
    lidx: np.ndarray  # (NB, Bmax, k) window-local dof ids; dummies -> 0
    grads: np.ndarray  # (NB, Bmax, k, dim)
    vols: np.ndarray  # (NB, Bmax); dummies -> 0
    cells_global: np.ndarray  # (NB, Bmax, k) global dof ids (dummies -> 0)

    @property
    def k(self):
        return self.lidx.shape[-1]


def build_blocking(
    cells: np.ndarray,
    grads: np.ndarray,
    vols: np.ndarray,
    n_dofs: int,
    S: int = 512,
    max_spill: int = 7,
    vmem_budget: int = 6 * 1024 * 1024,
) -> Optional[BlockedCells]:
    """Assign each cell to the block of its min dof; returns None if the
    Morton dof spread forces windows beyond `max_spill` strides."""
    k = cells.shape[1]
    cmin = cells.min(axis=1)
    spread = int((cells.max(axis=1) - cmin).max()) if len(cells) else 0
    n_spill = -(-max(spread, 1) // S)
    if n_spill > max_spill:
        return None
    W = (n_spill + 1) * S
    NB = -(-n_dofs // S)
    bid = cmin // S
    order = np.argsort(bid, kind="stable")
    counts = np.bincount(bid, minlength=NB)
    Bmax = int(counts.max())
    # chunk size bounded by the one-hot VMEM budget: 4*C*k*W bytes
    C = max(64, min(512, vmem_budget // (4 * k * W)))
    C = int(2 ** np.floor(np.log2(C)))
    n_chunks = -(-Bmax // C)
    Bpad = C * n_chunks

    lidx = np.zeros((NB, Bpad, k), np.int32)
    g_b = np.zeros((NB, Bpad, k, grads.shape[-1]), grads.dtype)
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
    return BlockedCells(
        n_dofs=n_dofs, S=S, W=W, n_spill=n_spill, n_blocks=NB, C=C,
        n_chunks=n_chunks, lidx=lidx, grads=g_b, vols=v_b, cells_global=cg_b,
    )


# ---------------------------------------------------------------------------
# window build / combine (XLA, reshape+roll only)
# ---------------------------------------------------------------------------
def make_windows(xs, bk: BlockedCells):
    """Stack fields (list of (n,) arrays) into windows (NB, W, nvars)."""
    NB, S, ns = bk.n_blocks, bk.S, bk.n_spill
    cols = []
    for x in xs:
        xp = jnp.pad(x, (0, NB * S - bk.n_dofs))
        xr = xp.reshape(NB, S)
        parts = [xr] + [jnp.roll(xr, -j, axis=0) for j in range(1, ns + 1)]
        cols.append(jnp.concatenate(parts, axis=1))  # (NB, W)
    return jnp.stack(cols, axis=-1)  # (NB, W, nvars)


def combine_windows(yw, bk: BlockedCells):
    """(NB, W[, m]) partial outputs -> (n[, m]) via shifted adds."""
    NB, S, ns = bk.n_blocks, bk.S, bk.n_spill
    acc = yw[:, :S]
    for j in range(1, ns + 1):
        acc = acc + jnp.roll(yw[:, j * S : (j + 1) * S], j, axis=0)
    return acc.reshape((NB * S,) + yw.shape[2:])[: bk.n_dofs]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _onehot(lidx_flat, W, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (lidx_flat.shape[0], W), 1)
    return (lidx_flat[:, None] == iota).astype(dtype)


def _emi_kernel(xw_ref, lidx_ref, grads_ref, vols_ref, out_ref):
    """kappa-weighted stiffness: out_w += E^T ye, ye from element math."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lidx = lidx_ref[0, 0]  # (C, k)
    C, k = lidx.shape
    W = xw_ref.shape[1]
    E = _onehot(lidx.reshape(-1), W, xw_ref.dtype)  # (C*k, W)
    G = jax.lax.dot_general(
        E, xw_ref[0], (((1,), (0,)), ((), ())), precision=HIGHEST,
        preferred_element_type=xw_ref.dtype,
    )  # (C*k, 2): [x, kappa]
    xe = G[:, 0].reshape(C, k)
    ke = G[:, 1].reshape(C, k)
    grads = grads_ref[0, 0]  # (C, k, dim)
    vols = vols_ref[0, 0, 0]  # (C,)
    kbar = ke.mean(axis=1)
    gx = jnp.einsum("ckd,ck->cd", grads, xe)
    ye = jnp.einsum("cd,ckd->ck", gx, grads) * (vols * kbar)[:, None]
    yw = jax.lax.dot_general(
        E, ye.reshape(-1), (((0,), (0,)), ((), ())), precision=HIGHEST,
        preferred_element_type=xw_ref.dtype,
    )  # (W,)
    out_ref[0, 0, :] += yw


def _knp_kernel(xw_ref, lidx_ref, grads_ref, vols_ref, wcell_ref, out_ref):
    """Primitive actions for the KNP operator: out (W, 3) columns =
    [mass(x), stiffness(x), drift(x; w_cell)]."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lidx = lidx_ref[0, 0]
    C, k = lidx.shape
    W = xw_ref.shape[1]
    E = _onehot(lidx.reshape(-1), W, xw_ref.dtype)
    xe = jax.lax.dot_general(
        E, xw_ref[0, :, 0], (((1,), (0,)), ((), ())), precision=HIGHEST,
        preferred_element_type=xw_ref.dtype,
    ).reshape(C, k)
    grads = grads_ref[0, 0]
    vols = vols_ref[0, 0, 0]
    wc = wcell_ref[0, 0]  # (C, dim)
    # mass: vol/(k(k+1)) * (sum + x)
    s = xe.sum(axis=1, keepdims=True)
    m_e = (vols / (k * (k + 1)))[:, None] * (s + xe)
    # stiffness
    gx = jnp.einsum("ckd,ck->cd", grads, xe)
    s_e = jnp.einsum("cd,ckd->ck", gx, grads) * vols[:, None]
    # drift: vol * mean(x) * (w . g_i)
    wg = jnp.einsum("cd,ckd->ck", wc, grads)
    d_e = (vols * xe.mean(axis=1))[:, None] * wg
    ye = jnp.stack([m_e, s_e, d_e], axis=-1).reshape(C * k, 3)
    yw = jax.lax.dot_general(
        E, ye, (((0,), (0,)), ((), ())), precision=HIGHEST,
        preferred_element_type=xw_ref.dtype,
    )  # (W, 3)
    out_ref[0] += yw


def _grid_call(kernel, bk: BlockedCells, xw, cell_args, out_cols, interpret):
    """Launch over grid (NB, n_chunks).  TPU lowering requires the last
    two dims of every block to equal the array dims (or be tile-aligned),
    so all per-chunk arrays are reshaped to expose (chunk dims...) fully
    and grid indexing happens on leading dims only."""
    NB, C, W = bk.n_blocks, bk.C, bk.W
    k = bk.k
    NCH = bk.n_chunks
    nvars = xw.shape[-1]
    dim = cell_args[0].shape[-1]
    lidx = jnp.asarray(bk.lidx).reshape(NB, NCH, C, k)
    grads = cell_args[0].reshape(NB, NCH, C, k, dim)
    vols = cell_args[1].reshape(NB, NCH, 1, C)
    in_specs = [
        pl.BlockSpec((1, W, nvars), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C, k), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C, k, dim), lambda b, c: (b, c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, C), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xw, lidx, grads, vols]
    if len(cell_args) > 2:  # drift vector field
        wdim = cell_args[2].shape[-1]
        in_specs.append(
            pl.BlockSpec((1, 1, C, wdim), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(cell_args[2].reshape(NB, NCH, C, wdim))
    out_shape = (
        jax.ShapeDtypeStruct((NB, 1, W), xw.dtype)
        if out_cols == 1
        else jax.ShapeDtypeStruct((NB, W, out_cols), xw.dtype)
    )
    out_spec = (
        pl.BlockSpec((1, 1, W), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        if out_cols == 1
        else pl.BlockSpec((1, W, out_cols), lambda b, c: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(NB, NCH),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(NB, W) if out_cols == 1 else out


def emi_stiffness_blocked(x, kappa, bk: BlockedCells, grads, vols, interpret=False):
    """y = (kappa-weighted stiffness) @ x for one subdomain."""
    xw = make_windows([x, kappa], bk)
    yw = _grid_call(_emi_kernel, bk, xw, (grads, vols), 1, interpret)
    return combine_windows(yw, bk)


def knp_actions_blocked(x, bk: BlockedCells, grads, vols, w_cell, interpret=False):
    """Returns (mass(x), stiffness(x), drift(x)) stacked as (n, 3)."""
    xw = make_windows([x], bk)
    yw = _grid_call(_knp_kernel, bk, xw, (grads, vols, w_cell), 3, interpret)
    return combine_windows(yw, bk)
