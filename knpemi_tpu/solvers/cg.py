"""Preconditioned conjugate gradients, matrix-free, jit-safe.

TPU-native replacement for PETSc's CG + hypre BoomerAMG EMI solve
(reference pdeSolver.py:24-38).  Unlike ``jax.scipy.sparse.linalg.cg`` it

* reports the iteration count (the reference records per-step Krylov
  iteration statistics, run_2D.py:354-360),
* supports a constant-nullspace projection for the pure-Neumann EMI
  system (PETSc ``setNullSpace``, pdeSolver.py:72-78),
* uses the PETSc-style convergence test ||r|| < max(rtol*||r0||, atol).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class KrylovResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # int32
    resnorm: jnp.ndarray  # final residual 2-norm
    converged: jnp.ndarray  # bool


def _identity(x):
    return x


def cg(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-5,
    atol: float = 1e-40,
    maxiter: int = 1000,
    nullspace: Optional[jnp.ndarray] = None,
    dot: Callable = jnp.vdot,
) -> KrylovResult:
    """Solve A x = b with preconditioned CG.

    ``nullspace``: an orthonormal null vector (e.g. the normalized constant
    vector); b and all iterates are kept orthogonal to it.
    ``dot``: inner product — override with a psum-reducing dot under
    shard_map for the distributed path.
    """
    if M is None:
        M = _identity
    if x0 is None:
        x0 = jnp.zeros_like(b)

    def project(v):
        if nullspace is None:
            return v
        return v - dot(nullspace, v) * nullspace

    b = project(b)
    x0 = project(x0)

    r0 = project(b - A(x0))
    z0 = project(M(r0))
    gamma0 = dot(r0, z0)
    bnorm = jnp.sqrt(dot(r0, r0))
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        _, r, _, _, _, k = state
        rr = dot(r, r)
        return (rr > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, gamma, k = state
        Ap = project(A(p))
        alpha = gamma / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = project(M(r))
        gamma_new = dot(r, z)
        beta = gamma_new / gamma
        p = z + beta * p
        return (x, r, z, p, gamma_new, k + 1)

    state = (x0, r0, z0, z0, gamma0, jnp.int32(0))
    x, r, _, _, _, k = jax.lax.while_loop(cond, body, state)
    rn = jnp.sqrt(dot(r, r))
    return KrylovResult(x=x, iters=k, resnorm=rn, converged=rn * rn <= tol2)
