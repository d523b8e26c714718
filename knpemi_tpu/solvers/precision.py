"""Compensated (double-single) inner products for the f32 TPU path.

The reference runs PETSc in f64; TPUs have no native f64 and the global
x64 flag breaks Mosaic lowering (knpemi_tpu.__init__), so the TPU path
is f32 with equilibrated operators.  The Krylov recurrences' weakest
link in f32 is the inner product: cancellation in r.z / p.Ap steers CG
and the attainable residual floor (BASELINE.md's 1e-6 gate;
SURVEY.md section 7 "fp64 required").

``dot2`` implements the product-compensated dot (Ogita-Rump-Oishi Dot2
with Dekker splitting for the exact product error; JAX exposes no fma):
every elementwise product is split exactly into p + e in f32, and both
channels ride XLA's tree reductions (tree summation error is
O(log n * eps), negligible next to product rounding).  The result is
accurate to ~2 ulps of an f64 dot evaluated in f32 range — measured to
track the f64 dot to ~1e-9 relative on 1e5-length physiological vectors
(tests/test_precision.py).

Cost: ~6 VPU flops/element instead of 1 — irrelevant next to the
matvec, since dots touch each vector once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for f32 (24-bit mantissa)


def _two_prod(a, b):
    """Exact product: a*b = p + e in f32 pairs (Dekker/Veltkamp)."""
    p = a * b
    ca = a * _SPLIT
    a_hi = ca - (ca - a)
    a_lo = a - a_hi
    cb = b * _SPLIT
    b_hi = cb - (cb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def dot2(u, v):
    """Product-compensated dot; drop-in for jnp.vdot on real vectors."""
    if u.dtype == jnp.float64:
        return jnp.vdot(u, v)
    p, e = _two_prod(u, v)
    return jnp.sum(p) + jnp.sum(e)


def bdot2(u, v):
    """Batched compensated dot: (B, n) x (B, n) -> (B,) (gmres_batched)."""
    if u.dtype == jnp.float64:
        return jnp.einsum("bn,bn->b", u, v)
    p, e = _two_prod(u, v)
    return p.sum(axis=-1) + e.sum(axis=-1)


def make_pdot2(axis: str):
    """SPMD variant: local compensated partial sums, one scalar psum of
    (value, error) per dot."""

    def pdot2(u, v):
        if u.dtype == jnp.float64:
            return jax.lax.psum(jnp.vdot(u, v), axis)
        p, e = _two_prod(u, v)
        s = jax.lax.psum(jnp.sum(p), axis)
        c = jax.lax.psum(jnp.sum(e), axis)
        return s + c

    return pdot2


def make_pbdot2(axis: str):
    """SPMD batched variant of :func:`bdot2`: (B, n_loc) rows -> (B,)
    with one (B,)-sized psum per channel (the ion-batched GMRES inner
    product inside shard_map)."""

    def pbdot2(u, v):
        if u.dtype == jnp.float64:
            return jax.lax.psum(jnp.einsum("bn,bn->b", u, v), axis)
        p, e = _two_prod(u, v)
        s = jax.lax.psum(p.sum(axis=-1), axis)
        c = jax.lax.psum(e.sum(axis=-1), axis)
        return s + c

    return pbdot2


def make_pbdot(axis: str):
    """Plain SPMD batched dot (f64 or uncompensated f32)."""

    def pbdot(u, v):
        return jax.lax.psum(jnp.einsum("bn,bn->b", u, v), axis)

    return pbdot
