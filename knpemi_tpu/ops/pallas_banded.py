"""Pallas TPU kernel for block-banded dense matvecs.

The MG V-cycle's operators are stored block-banded (solvers/mg.py::
_csr_to_banded): per 256-row block, one dense (R, W) slab over that
block's column window plus a COO remainder.  The XLA formulation of the
window gather ``x[w0[:, None] + arange(W)]`` lowers to a general gather
(~1.7 ms for the EMI fine level — random-index gathers move ~140M
elem/s on TPU); this kernel eliminates it: the vector lives whole in
VMEM as a (rows, 128) table, each grid step reads its window as W/128
dynamically-offset row slices and contracts them against the streamed
slab with (1, 128) x (128, R) MXU dots.

Measured on the EMI fine level (NB=104, R=256, W=1536): 0.47 ms/apply,
327 GB/s of slab traffic, vs 2.5 ms for the XLA gather+einsum path.
Precision.HIGHEST costs nothing here (HBM-bound) and keeps the result
exact in f32, so the same kernel can serve actual operators, not just
preconditioner internals.  NOTE Mosaic's DEFAULT dot precision is a
single bf16 pass (rel err ~2e-3) — unlike XLA:TPU's 3-pass default —
so HIGHEST is load-bearing.

Constraints encoded here (see /opt/skills/guides/pallas_guide.md):
strictly 2-D in-kernel tensors, no in-kernel reshapes, window starts
aligned to 128 lanes (the host layout rounds w0 down and widens W),
out block (1, 1, R) because a (1, R) block violates the sublane rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("NB", "R", "W", "interpret"))
def _banded_mv_call(w0_rows, x2, slabT, NB, R, W, interpret):
    J = W // 128
    # bf16 slabs halve the HBM slab traffic (storage dtype only).  The
    # CONTRACTION stays f32: the slab block is upcast after the read and
    # x is never rounded — rounding x made the preconditioner an
    # input-dependent (nonlinear) map and cost 19 -> 137 CG iterations
    # ("coarse corrections cancel below bf16 mantissa", RESULTS.md);
    # a bf16-rounded-but-FIXED operator applied in f32 is a plain 0.4%
    # operator perturbation that CG absorbs.
    is_bf16 = slabT.dtype == jnp.bfloat16

    def kernel(w0r_ref, x_ref, s_ref, o_ref):
        b = pl.program_id(0)
        row0 = w0r_ref[b]
        acc = jnp.zeros((1, R), jnp.float32)
        for j in range(J):
            xrow = x_ref[pl.ds(row0 + j, 1), :]
            sblk = s_ref[j * 128:(j + 1) * 128, :]
            if is_bf16:
                sblk = sblk.astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                xrow, sblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        o_ref[0] = acc

    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((W, R), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NB, 1, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w0_rows, x2, slabT)
    return out.reshape(NB * R)


@functools.partial(
    jax.jit, static_argnames=("NB", "R", "W", "B", "interpret")
)
def _banded_mv_call_batch(w0_rows, x2, slabT, NB, R, W, B, interpret):
    """Batched variant: B vectors through ONE slab read.  The x table is
    lane-stacked (nrows, B*128) so each window row read stays a single
    contiguous (1, B*128) dynamic sublane slice; per 128-column block the
    kernel issues B small dots instead of 1 — still HBM-bound on the
    slab, so B solves cost ~1x the single-vector apply (the KNP ion
    batch reads each V-cycle level's slab once, not once per ion)."""
    J = W // 128
    # bf16 slabs: storage dtype only — upcast the block, keep x f32
    # (see _banded_mv_call for why rounding x is forbidden)
    is_bf16 = slabT.dtype == jnp.bfloat16

    def kernel(w0r_ref, x_ref, s_ref, o_ref):
        b = pl.program_id(0)
        row0 = w0r_ref[b]
        accs = [jnp.zeros((1, R), jnp.float32) for _ in range(B)]
        for j in range(J):
            xrow = x_ref[pl.ds(row0 + j, 1), :]  # (1, B*128)
            sblk = s_ref[j * 128:(j + 1) * 128, :]
            if is_bf16:
                sblk = sblk.astype(jnp.float32)
            for bb in range(B):
                accs[bb] = accs[bb] + jax.lax.dot_general(
                    xrow[:, bb * 128:(bb + 1) * 128], sblk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        o_ref[0] = jnp.concatenate(accs, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((W, R), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B, R), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NB, B, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w0_rows, x2, slabT)
    return out.transpose(1, 0, 2).reshape(B, NB * R)


def banded_matvec_batch(slabT, w0_rows, X, n, W, interpret=False):
    """Y = A_near X^T batched over rows of X (B, m): one slab read serves
    all B vectors.  See :func:`banded_matvec` for the layout contract."""
    R = slabT.shape[1]
    NB = slabT.shape[0] // W
    B, m = X.shape
    nrows = -(-(m + W) // 128) + 1
    x2 = jnp.pad(X, ((0, 0), (0, nrows * 128 - m))).reshape(B, nrows, 128)
    x2 = jnp.moveaxis(x2, 0, 1).reshape(nrows, B * 128)
    y = _banded_mv_call_batch(w0_rows, x2, slabT, NB, R, W, B, interpret)
    return y[:, :n]


def banded_matvec(slabT, w0_rows, x, n, W, interpret=False):
    """y = A_near x for a block-banded A: ``slabT`` is (NB*W, R) with
    slabT[b*W + w, r] = A[b*R + r, w0[b] + w]; ``w0_rows`` = w0 // 128
    (window starts are 128-aligned).  ``x`` has length m >= max col;
    the caller adds the COO far remainder."""
    R = slabT.shape[1]
    NB = slabT.shape[0] // W
    m = x.shape[0]
    nrows = -(-(m + W) // 128) + 1
    x2 = jnp.pad(x, (0, nrows * 128 - m)).reshape(nrows, 128)
    y = _banded_mv_call(w0_rows, x2, slabT, NB, R, W, interpret)
    return y[:n]
