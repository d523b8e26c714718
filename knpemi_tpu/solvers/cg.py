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

    # floor the relative tolerance at the dtype's attainable residual
    # (f32 runs cannot reach the f64 tolerances the reference uses; the
    # extra digits are roundoff noise — see SolverOptions docs)
    eps = jnp.finfo(b.dtype).eps
    rtol = jnp.maximum(jnp.asarray(rtol, b.dtype), 4 * eps)

    r0 = project(b - A(x0))
    z0 = project(M(r0))
    gamma0 = dot(r0, z0)
    # PETSc KSPConvergedDefault semantics: ||r|| < max(rtol*||b||, atol)
    # (the reference's solves use this test with warm starts,
    # pdeSolver.py:30,105 ksp_initial_guess_nonzero)
    bnorm = jnp.sqrt(dot(b, b))
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    # stagnation window: stop when the residual has not improved for
    # this many iterations.  60 suffices in f32, where the guard's
    # purpose is the attainable floor eps*cond(A) > rtol; in f64 an
    # ill-conditioned UNpreconditioned solve can plateau legitimately
    # for >100 iterations before the next drop (measured: the MMS
    # ladder's deflation-CG at M>=400 exited falsely at 61 iterations
    # with an O(1) error), so the window is wider there
    stall = 60 if jnp.finfo(b.dtype).bits <= 32 else 300

    def cond(state):
        _, _, _, _, _, k, rr, best_rr, best_k = state
        # stop on convergence, iteration cap, or stagnation (rr is
        # carried in the state — body computes it anyway for the
        # stagnation guard; recomputing it here would cost one extra
        # full-vector dot per iteration)
        return (rr > tol2) & (k < maxiter) & (k - best_k < stall)

    def safe_div(a, b):
        ok = b != 0
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def body(state):
        x, r, z, p, gamma, k, _, best_rr, best_k = state
        Ap = project(A(p))
        alpha = safe_div(gamma, dot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = project(M(r))
        gamma_new = dot(r, z)
        beta = safe_div(gamma_new, gamma)
        p = z + beta * p
        rr = dot(r, r)
        improved = rr < 0.999 * best_rr
        best_rr = jnp.where(improved, rr, best_rr)
        best_k = jnp.where(improved, k + 1, best_k)
        return (x, r, z, p, gamma_new, k + 1, rr, best_rr, best_k)

    rr0 = dot(r0, r0)
    state = (x0, r0, z0, z0, gamma0, jnp.int32(0), rr0, rr0, jnp.int32(0))
    x, r, _, _, _, k, rr_f, _, _ = jax.lax.while_loop(cond, body, state)
    # roundoff reintroduces null components over many iterations; pin the
    # gauge on exit (the EMI potential is defined up to a constant)
    x = project(x)
    rn = jnp.sqrt(rr_f)
    return KrylovResult(x=x, iters=k, resnorm=rn, converged=rn * rn <= tol2)
