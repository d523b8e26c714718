"""Blocked P1 assembly kernels in Pallas (TPU) — gather/scatter-free matvecs.

XLA lowers random-index gather/scatter on TPU to ~140M elem/s — three
orders of magnitude below HBM bandwidth — which makes naive FEM assembly
(x[cells] ... scatter-add) the dominant cost of every Krylov iteration.
This module replaces both memory operations with MXU matmuls:

* dofs are Morton-ordered and cells sorted by min-dof (ops/geometry.py),
  so the cells of a dof-stride block [b*S, (b+1)*S) touch only a compact
  dof window [b*S, b*S + W);
* window vectors are built with reshape+roll (contiguous, fast), and the
  in-window gather/scatter become ONE-HOT MATMULS computed in VMEM, one
  per local vertex slot j:
      E_j[w, c] = (cells[c, j] - b*S == w)          (W, C) one-hot
      gather    G_j = xw @ E_j                      (nvars, C)
      scatter   yw += E_j @ ye_j^T                  (W, m)
  The one-hot never exists in HBM; the FLOP overhead is MXU-friendly;
* per-window partial outputs are combined by shifted adds (reshape+roll
  again) — no scatter anywhere.

Mosaic constraints shape the layout: every in-kernel tensor is strictly
2-D with a 128-aligned lane dimension (C cells or W window), there are
no reshapes or 1-D vectors inside the kernel, and all matmuls use
Precision.HIGHEST (the MXU default truncates f32 inputs to bf16).

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

    Transposed, chunked layouts (lanes = C cells per chunk):
      lidx_t : (NB, NCH, k, C) window-local dof per vertex slot
      grads_t: (NB, NCH, k*dim, C) basis gradients, slot-major rows
      vols_t : (NB, NCH, 1, C)
      cells_global: (NB, NCH, C, k) global dof ids (coefficient prep)
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
    lidx_t: np.ndarray
    grads_t: np.ndarray
    vols_t: np.ndarray
    cells_global: np.ndarray


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
    dim = grads.shape[-1]
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
    # chunk size bounded by the per-slot one-hot VMEM cost (W*C floats,
    # k slots are sequential); lanes must be 128-aligned
    C = max(128, min(512, vmem_budget // (4 * W)))
    C = int(2 ** np.floor(np.log2(C)))
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

    lidx_t = lidx.reshape(NB, n_chunks, C, k).transpose(0, 1, 3, 2)
    grads_t = (
        g_b.reshape(NB, n_chunks, C, k, dim)
        .transpose(0, 1, 3, 4, 2)
        .reshape(NB, n_chunks, k * dim, C)
    )
    vols_t = v_b.reshape(NB, n_chunks, 1, C)
    cg_t = cg_b.reshape(NB, n_chunks, C, k)
    return BlockedCells(
        n_dofs=n_dofs, S=S, W=W, n_spill=n_spill, n_blocks=NB, C=C,
        n_chunks=n_chunks, k=k, dim=dim, lidx_t=np.ascontiguousarray(lidx_t),
        grads_t=np.ascontiguousarray(grads_t), vols_t=vols_t,
        cells_global=cg_t,
    )


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


def combine_windows(yw, bk: BlockedCells):
    """(NB, W, m) partial outputs -> (n, m) via shifted adds."""
    NB, S, ns = bk.n_blocks, bk.S, bk.n_spill
    acc = yw[:, :S]
    for j in range(1, ns + 1):
        acc = acc + jnp.roll(yw[:, j * S : (j + 1) * S], j, axis=0)
    return acc.reshape((NB * S,) + yw.shape[2:])[: bk.n_dofs]


# ---------------------------------------------------------------------------
# kernels (strictly 2-D in-kernel tensors)
# ---------------------------------------------------------------------------
def _slot_onehot(lidx_row, W, C, dtype):
    """E_j (W, C): one-hot of a slot's window-local dofs; lidx_row (1, C)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    return (iota == lidx_row).astype(dtype)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=HIGHEST,
        preferred_element_type=a.dtype,
    )


def _emi_kernel(xw_ref, lidx_ref, grads_ref, vols_ref, out_ref):
    """kappa-weighted stiffness action into the window (out (W, 1))."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xw = xw_ref[0]  # (2, W): rows [x, kappa]
    lidx = lidx_ref[0, 0]  # (k, C)
    grads = grads_ref[0, 0]  # (k*dim, C)
    vols = vols_ref[0, 0]  # (1, C)
    k = lidx.shape[0]
    dim = grads.shape[0] // k
    W = xw.shape[1]
    C = lidx.shape[1]

    Es = []
    xe = []  # per-slot (1, C)
    kbar = jnp.zeros_like(vols)
    for j in range(k):
        E = _slot_onehot(lidx[j : j + 1, :], W, C, xw.dtype)  # (W, C)
        G = _dot(xw, E, ((1,), (0,)))  # (2, C)
        Es.append(E)
        xe.append(G[0:1, :])
        kbar = kbar + G[1:2, :]
    kbar = kbar / k

    w = vols * kbar
    ye = [jnp.zeros_like(vols) for _ in range(k)]
    for d in range(dim):
        gx = jnp.zeros_like(vols)
        for j in range(k):
            gx = gx + grads[j * dim + d : j * dim + d + 1, :] * xe[j]
        for j in range(k):
            ye[j] = ye[j] + gx * grads[j * dim + d : j * dim + d + 1, :]
    acc = out_ref[0]  # (W, 1)
    for j in range(k):
        acc = acc + _dot(Es[j], (ye[j] * w), ((1,), (1,)))  # (W, 1)
    out_ref[0] = acc


def _knp_kernel(xw_ref, lidx_ref, grads_ref, vols_ref, wcell_ref, out_ref):
    """Primitive actions for the KNP operator: out (W, 3) columns =
    [mass(x), stiffness(x), drift(x; w_cell)]."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xw = xw_ref[0]  # (1, W)
    lidx = lidx_ref[0, 0]  # (k, C)
    grads = grads_ref[0, 0]  # (k*dim, C)
    vols = vols_ref[0, 0]  # (1, C)
    wc = wcell_ref[0, 0]  # (dim, C)
    k = lidx.shape[0]
    dim = grads.shape[0] // k
    W = xw.shape[1]
    C = lidx.shape[1]

    Es = []
    xe = []
    xsum = jnp.zeros_like(vols)
    for j in range(k):
        E = _slot_onehot(lidx[j : j + 1, :], W, C, xw.dtype)
        G = _dot(xw, E, ((1,), (0,)))  # (1, C)
        Es.append(E)
        xe.append(G)
        xsum = xsum + G

    gx = [jnp.zeros_like(vols) for _ in range(dim)]
    for d in range(dim):
        for j in range(k):
            gx[d] = gx[d] + grads[j * dim + d : j * dim + d + 1, :] * xe[j]

    m_scale = vols / (k * (k + 1))
    d_scale = vols * (xsum / k)
    acc = out_ref[0]  # (W, 3)
    for j in range(k):
        m_j = m_scale * (xsum + xe[j])  # (1, C)
        s_j = jnp.zeros_like(vols)
        wg_j = jnp.zeros_like(vols)
        for d in range(dim):
            g_row = grads[j * dim + d : j * dim + d + 1, :]
            s_j = s_j + gx[d] * g_row
            wg_j = wg_j + wc[d : d + 1, :] * g_row
        s_j = s_j * vols
        d_j = d_scale * wg_j
        ye3 = jnp.concatenate([m_j, s_j, d_j], axis=0)  # (3, C)
        acc = acc + _dot(Es[j], ye3, ((1,), (1,)))  # (W, 3)
    out_ref[0] = acc


def _grid_call(kernel, bk: BlockedCells, xw, extra, out_cols, interpret):
    NB, C, W = bk.n_blocks, bk.C, bk.W
    k, dim, NCH = bk.k, bk.dim, bk.n_chunks
    nvars = xw.shape[1]
    in_specs = [
        pl.BlockSpec((1, nvars, W), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, k, C), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, k * dim, C), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, C), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xw, jnp.asarray(bk.lidx_t), extra[0], extra[1]]
    if len(extra) > 2:  # drift vector rows (NB, NCH, dim, C)
        in_specs.append(
            pl.BlockSpec((1, 1, dim, C), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(extra[2])
    out = pl.pallas_call(
        kernel,
        grid=(NB, NCH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, W, out_cols), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, W, out_cols), xw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out


def emi_stiffness_blocked(x, kappa, bk: BlockedCells, grads_t, vols_t,
                          interpret=False):
    """y = (kappa-weighted stiffness) @ x for one subdomain."""
    xw = make_windows([x, kappa], bk)
    yw = _grid_call(_emi_kernel, bk, xw, (grads_t, vols_t), 1, interpret)
    return combine_windows(yw, bk)[:, 0]


def knp_actions_blocked(x, bk: BlockedCells, grads_t, vols_t, w_rows,
                        interpret=False):
    """Returns (n, 3): [mass(x), stiffness(x), drift(x)] actions."""
    xw = make_windows([x], bk)
    yw = _grid_call(_knp_kernel, bk, xw, (grads_t, vols_t, w_rows), 3,
                    interpret)
    return combine_windows(yw, bk)
