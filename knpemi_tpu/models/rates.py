"""Numerically stable building blocks for membrane-model rate functions.

The classic HH rate functions contain the removable singularity
``x / (exp(x/k) - 1)`` (alpha_m at V = -40 mV, alpha_n at V = -55 mV).
The raw form is 0/0 = NaN whenever the operand rounds ``exp`` to
exactly 1 — a window of width ~|x| < 2^-25·k in f32.  The reference
integrates these rates with LSODA in f64 (gotran-generated mm_hh.py),
where the window is ~2^29 times narrower and is never hit in practice;
in this framework's f32 TPU path an RK4 substep sweeping the AP
upstroke lands in it after ~10^7 evaluations (measured: the idealized
2-D driver died at step 916 of a 100 ms run, V crossing -55 mV during
the 4th stimulus pulse, alpha_n = NaN -> whole ODE state NaN).

``exprel_inv`` evaluates z / (exp(z) - 1) stably: a Bernoulli series
for small z, z / expm1(z) elsewhere.  The where-sanitized operand
keeps the unselected branch NaN-free (both branches of jnp.where are
always computed under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["exprel_inv"]


def exprel_inv(z):
    """z / (exp(z) - 1), finite for all z (limit 1 at z = 0)."""
    small = jnp.abs(z) < 1e-4
    zs = jnp.where(small, 1.0, z)
    # z/(e^z - 1) = 1 - z/2 + z^2/12 - z^4/720 + ... ; truncation error
    # at |z| = 1e-4 is ~1e-17, far below f32 roundoff
    series = 1.0 - z / 2.0 + (z * z) / 12.0
    return jnp.where(small, series, zs / jnp.expm1(zs))
