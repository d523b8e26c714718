"""Restarted GMRES(m), matrix-free, right-preconditioned, jit-safe.

TPU-native replacement for PETSc GMRES + hypre for the KNP solve
(reference pdeSolver.py:98-113).  Static shapes throughout: the Krylov
basis is a fixed (m+1, n) buffer; inner/outer loops are lax.while_loops.
Right preconditioning keeps the monitored residual equal to the true
residual.  vmap-compatible (the KNP block system is solved batched over
ions).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .cg import KrylovResult, _identity


def gmres(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-7,
    atol: float = 1e-40,
    maxiter: int = 1000,
    restart: int = 30,
    min_iter: int = 0,
    dot: Callable = jnp.vdot,
) -> KrylovResult:
    """Solve A x = b. ``min_iter`` mirrors PETSc's ksp_min_it (the
    reference sets 5, pdeSolver.py:100)."""
    has_M = M is not None
    if M is None:
        M = _identity
    if x0 is None:
        x0 = jnp.zeros_like(b)

    n = b.shape[0]
    m = restart

    # floor the relative tolerance at the dtype's attainable residual
    eps = jnp.finfo(b.dtype).eps
    rtol = jnp.maximum(jnp.asarray(rtol, b.dtype), 4 * eps)

    r0 = b - A(x0)
    # PETSc KSPConvergedDefault semantics: ||r|| < max(rtol*||b||, atol)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r0, r0))
    tol = jnp.maximum(rtol * bnorm, atol)

    def cycle(x, r, total_it):
        """One GMRES(m) cycle starting from x with residual r = b - A x
        (carried by the outer loop — computing it here would duplicate
        the initial-residual matvec on the common single-cycle path)."""
        beta = jnp.sqrt(dot(r, r))
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(r / safe_beta)
        # preconditioned basis Z[j] = M(V[j]) (flexible-GMRES storage):
        # the correction is Z y directly, skipping the extra V-cycle
        # apply of the textbook right-preconditioned update M(V y)
        Z = jnp.zeros((m, n), b.dtype) if has_M else None
        H = jnp.zeros((m + 1, m), b.dtype)
        cs = jnp.zeros((m,), b.dtype)
        sn = jnp.zeros((m,), b.dtype)
        g = jnp.zeros((m + 1,), b.dtype).at[0].set(beta)

        def inner_cond(st):
            V, Z, H, cs, sn, g, j, res = st
            keep = (res > tol) | (total_it + j < min_iter)
            return (j < m) & keep

        def inner_body(st):
            V, Z, H, cs, sn, g, j, res = st
            z = M(V[j])
            if has_M:
                Z = Z.at[j].set(z)
            w = A(z)
            # modified Gram-Schmidt over the j+1 live basis vectors
            # (dynamic trip count: each pass streams the full vector,
            # so running the dead i > j passes costs real HBM traffic)
            def mgs(i, carry):
                w, h = carry
                hi = dot(V[i], w)
                w = w - hi * V[i]
                return (w, h.at[i].set(hi))

            w, hcol = jax.lax.fori_loop(
                0, j + 1, mgs, (w, jnp.zeros((m + 1,), b.dtype))
            )
            hj1 = jnp.sqrt(dot(w, w))
            hcol = hcol.at[j + 1].set(hj1)
            V = V.at[j + 1].set(w / jnp.where(hj1 > 0, hj1, 1.0))

            # apply previous Givens rotations to the new column
            def rot(i, h):
                mask = i < j
                t = cs[i] * h[i] + sn[i] * h[i + 1]
                u = -sn[i] * h[i] + cs[i] * h[i + 1]
                return h.at[i].set(jnp.where(mask, t, h[i])).at[i + 1].set(
                    jnp.where(mask, u, h[i + 1])
                )

            hcol = jax.lax.fori_loop(0, m, rot, hcol)
            # (scalar work: the masked static loop unrolls cheaply)
            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            denom_s = jnp.where(denom > 0, denom, 1.0)
            c_new = jnp.where(denom > 0, hcol[j] / denom_s, 1.0)
            s_new = jnp.where(denom > 0, hcol[j + 1] / denom_s, 0.0)
            hcol = hcol.at[j].set(c_new * hcol[j] + s_new * hcol[j + 1]).at[
                j + 1
            ].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            g_j = g[j]
            g = g.at[j].set(c_new * g_j).at[j + 1].set(-s_new * g_j)
            H = H.at[:, j].set(hcol[: m + 1])
            res = jnp.abs(g[j + 1])
            return (V, Z, H, cs, sn, g, j + 1, res)

        V, Z, H, cs, sn, g, j, res = jax.lax.while_loop(
            inner_cond, inner_body, (V, Z, H, cs, sn, g, 0, beta)
        )

        # solve the (masked) upper-triangular system H[:j,:j] y = g[:j]
        mask = jnp.arange(m) < j
        Hm = H[:m, :m]
        # pad unused diagonal with 1 to keep the solve well-posed
        Hm = jnp.where(
            mask[None, :] & mask[:, None],
            Hm,
            jnp.eye(m, dtype=b.dtype),
        )
        gm = jnp.where(mask, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
        y = jnp.where(mask, y, 0.0)
        dx = (Z.T @ y) if has_M else (V[:m].T @ y)
        return x + dx, total_it + j, res

    def outer_cond(st):
        x, it, res, best = st
        # stop on convergence, cap, or a stagnated restart cycle; `best`
        # holds the smallest residual of all cycles BEFORE the latest one
        return (res > tol) & (it < maxiter) & (res < 0.999 * best)

    def outer_body(st):
        x, it, res, best = st
        best = jnp.minimum(best, res)
        # restart residual; the first cycle's r0 is peeled below, so
        # this matvec only runs when a restart actually happens
        x, it, res = cycle(x, b - A(x), it)
        return (x, it, res, best)

    # peel the first cycle: it reuses r0 (already computed for the PETSc
    # convergence test) instead of paying a second initial matvec.  Skip
    # it entirely when x0 already satisfies the tolerance, matching the
    # pre-peel semantics (the outer loop never ran).
    if maxiter > 0:
        x, it, res = jax.lax.cond(
            r0norm > tol,
            lambda: cycle(x0, r0, jnp.int32(0)),
            lambda: (x0, jnp.int32(0), r0norm),
        )
    else:
        x, it, res = x0, jnp.int32(0), r0norm
    x, it, res, _ = jax.lax.while_loop(
        outer_cond, outer_body, (x, it, res, r0norm)
    )
    return KrylovResult(x=x, iters=it, resnorm=res, converged=res <= tol)


def gmres_batched(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-7,
    atol: float = 1e-40,
    maxiter: int = 1000,
    restart: int = 30,
    min_iter: int = 0,
    bdot: Optional[Callable] = None,
) -> KrylovResult:
    """Restarted GMRES over a BATCH of systems sharing one operator call:
    ``A`` maps (B, n) -> (B, n) and is invoked once per inner iteration
    for all batch rows together.  ``bdot`` overrides the rowwise inner
    product (e.g. the compensated solvers/precision.py::bdot2).

    This is the TPU-shaped version of the KNP block solve: the ion
    systems of one subdomain differ only in scalar coefficients, and the
    assembly kernel's dominant cost (the materialized one-hot E) is
    shared across rows (ops/pallas_assembly.py::knp_apply_blocked_batch),
    so B systems cost barely more than one.  All rows run the same
    iteration count (until every row converges) — the extra iterations
    of already-converged rows ride along for free, and the aggregate
    ``iters`` matches the reference's single MatNest GMRES count
    semantics (max over the block system).

    Returns KrylovResult with x (B, n), scalar iters, per-row resnorm
    (B,), scalar converged (all rows).
    """
    has_M = M is not None
    if M is None:
        M = _identity
    if x0 is None:
        x0 = jnp.zeros_like(b)

    B, n = b.shape
    m = restart

    if bdot is None:
        def bdot(u, v):
            return jnp.einsum("bn,bn->b", u, v)

    eps = jnp.finfo(b.dtype).eps
    rtol = jnp.maximum(jnp.asarray(rtol, b.dtype), 4 * eps)

    r0 = b - A(x0)
    bnorm = jnp.sqrt(bdot(b, b))
    r0norm = jnp.sqrt(bdot(r0, r0))
    tol = jnp.maximum(rtol * bnorm, atol)  # (B,)

    def cycle(x, r, total_it):
        # r = b - A(x) is carried by the outer loop (the first cycle
        # reuses the convergence-test r0, saving one batched matvec)
        beta = jnp.sqrt(bdot(r, r))  # (B,)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, B, n), b.dtype).at[0].set(r / safe_beta[:, None])
        # preconditioned basis Z[j] = M(V[j]) (flexible-GMRES storage):
        # the correction is Z y directly — one batched V-cycle fewer per
        # cycle than the textbook M(V y) right-preconditioned update
        Z = jnp.zeros((m, B, n), b.dtype) if has_M else None
        H = jnp.zeros((B, m + 1, m), b.dtype)
        cs = jnp.zeros((B, m), b.dtype)
        sn = jnp.zeros((B, m), b.dtype)
        g = jnp.zeros((B, m + 1), b.dtype).at[:, 0].set(beta)

        def inner_cond(st):
            V, Z, H, cs, sn, g, j, res = st
            keep = (res > tol).any() | (total_it + j < min_iter)
            return (j < m) & keep

        def inner_body(st):
            V, Z, H, cs, sn, g, j, res = st
            z = M(V[j])  # (B, n)
            if has_M:
                Z = Z.at[j].set(z)
            w = A(z)

            # modified Gram-Schmidt over the j+1 live basis vectors
            # (dynamic trip count: every pass streams (B, n) vectors,
            # so the dead i > j passes cost real HBM traffic)
            def mgs(i, carry):
                w, h = carry
                hi = bdot(V[i], w)  # (B,)
                w = w - hi[:, None] * V[i]
                return (w, h.at[:, i].set(hi))

            w, hcol = jax.lax.fori_loop(
                0, j + 1, mgs, (w, jnp.zeros((B, m + 1), b.dtype))
            )
            hj1 = jnp.sqrt(bdot(w, w))  # (B,)
            hcol = hcol.at[:, j + 1].set(hj1)
            V = V.at[j + 1].set(w / jnp.where(hj1 > 0, hj1, 1.0)[:, None])

            def rot(i, h):
                mask = i < j
                t = cs[:, i] * h[:, i] + sn[:, i] * h[:, i + 1]
                u = -sn[:, i] * h[:, i] + cs[:, i] * h[:, i + 1]
                h = h.at[:, i].set(jnp.where(mask, t, h[:, i]))
                return h.at[:, i + 1].set(jnp.where(mask, u, h[:, i + 1]))

            hcol = jax.lax.fori_loop(0, m, rot, hcol)
            denom = jnp.sqrt(hcol[:, j] ** 2 + hcol[:, j + 1] ** 2)
            denom_s = jnp.where(denom > 0, denom, 1.0)
            c_new = jnp.where(denom > 0, hcol[:, j] / denom_s, 1.0)
            s_new = jnp.where(denom > 0, hcol[:, j + 1] / denom_s, 0.0)
            hcol = hcol.at[:, j].set(
                c_new * hcol[:, j] + s_new * hcol[:, j + 1]
            ).at[:, j + 1].set(0.0)
            cs = cs.at[:, j].set(c_new)
            sn = sn.at[:, j].set(s_new)
            g_j = g[:, j]
            g = g.at[:, j].set(c_new * g_j).at[:, j + 1].set(-s_new * g_j)
            H = H.at[:, :, j].set(hcol)
            res = jnp.abs(g[:, j + 1])  # (B,)
            return (V, Z, H, cs, sn, g, j + 1, res)

        V, Z, H, cs, sn, g, j, res = jax.lax.while_loop(
            inner_cond, inner_body, (V, Z, H, cs, sn, g, 0, beta)
        )

        mask = jnp.arange(m) < j
        Hm = H[:, :m, :m]
        Hm = jnp.where(
            (mask[None, None, :] & mask[None, :, None]),
            Hm,
            jnp.eye(m, dtype=b.dtype)[None],
        )
        gm = jnp.where(mask[None, :], g[:, :m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm[..., None], lower=False)
        y = jnp.where(mask[None, :], y[..., 0], 0.0)  # (B, m)
        basis = Z if has_M else V[:m]
        dx = jnp.einsum("jbn,bj->bn", basis, y)
        return x + dx, total_it + j, res

    def outer_cond(st):
        x, it, res, best = st
        return (res > tol).any() & (it < maxiter) & (res < 0.999 * best).any()

    def outer_body(st):
        x, it, res, best = st
        best = jnp.minimum(best, res)
        # restart residual; the first cycle is peeled below, so this
        # batched matvec only runs when a restart actually happens
        x, it, res = cycle(x, b - A(x), it)
        return (x, it, res, best)

    # peel the first cycle, reusing r0 (pre-peel semantics preserved:
    # skip when every row already satisfies the tolerance)
    if maxiter > 0:
        x, it, res = jax.lax.cond(
            (r0norm > tol).any(),
            lambda: cycle(x0, r0, jnp.int32(0)),
            lambda: (x0, jnp.int32(0), r0norm),
        )
    else:
        x, it, res = x0, jnp.int32(0), r0norm
    x, it, res, _ = jax.lax.while_loop(
        outer_cond, outer_body, (x, it, res, r0norm)
    )
    return KrylovResult(
        x=x, iters=it, resnorm=res, converged=(res <= tol).all()
    )
