"""Solver front-ends: configure and run the EMI / KNP solves.

API parity with the reference's pdeSolver.py ``create_solver_emi`` /
``create_solver_knp``: ``direct=True`` gives the LU path (host scipy,
standing in for MUMPS); ``direct=False`` gives the TPU-native matrix-free
Krylov path (CG for the symmetric EMI system, batched GMRES for the KNP
blocks) with Jacobi preconditioning and the constant-nullspace projection
for the pure-Neumann EMI system (pdeSolver.py:24-38, 72-78, 98-113).

The iterative ``solve`` methods are pure jit-safe functions so they can
live inside the jitted time step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .cg import cg
from .gmres import gmres
from . import direct as direct_mod


class EMISolver:
    def __init__(
        self,
        system,
        direct: bool = False,
        rtol: float = 1e-5,
        atol: float = 1e-40,
        maxiter: int = 1000,
        dot: Callable = jnp.vdot,
    ):
        self.system = system
        self.direct = direct
        self.rtol = rtol
        self.atol = atol
        self.maxiter = maxiter
        self.dot = dot

    def solve(self, c, phi_M, I_ch=None, x0: Optional[Dict[int, jnp.ndarray]] = None):
        """Returns ({tag: phi}, iters)."""
        sys_ = self.system
        if self.direct:
            import numpy as np

            x = direct_mod.solve_emi_direct(sys_, c, phi_M, I_ch)
            x = jnp.asarray(x)
            return sys_.split(x), jnp.int32(0)

        kappa = sys_.kappa(c)
        b = sys_.rhs(c, phi_M, I_ch)
        d = sys_.diag(kappa)
        Minv = 1.0 / d
        x0_flat = None if x0 is None else sys_.flatten(x0)
        res = cg(
            lambda v: sys_.matvec(v, kappa),
            b,
            x0=x0_flat,
            M=lambda v: Minv * v,
            rtol=self.rtol,
            atol=self.atol,
            maxiter=self.maxiter,
            nullspace=sys_.nullvec,
            dot=self.dot,
        )
        return sys_.split(res.x), res.iters


class KNPSolver:
    def __init__(
        self,
        system,
        direct: bool = False,
        rtol: float = 1e-7,
        atol: float = 2e-40,
        maxiter: int = 1000,
        restart: int = 30,
        min_iter: int = 5,
        dot: Callable = jnp.vdot,
    ):
        self.system = system
        self.direct = direct
        self.rtol = rtol
        self.atol = atol
        self.maxiter = maxiter
        self.restart = restart
        self.min_iter = min_iter
        self.dot = dot

    def solve(
        self,
        c,
        phi,
        phi_M,
        I_ch=None,
        source_gate=1.0,
        x0: Optional[Dict[int, jnp.ndarray]] = None,
    ):
        """Returns ({tag: (N_solved, n)}, iters).

        iters is the max over blocks — the analog of the reference's single
        MatNest GMRES iteration count.
        """
        sys_ = self.system
        if self.direct:
            out = direct_mod.solve_knp_direct(sys_, c, phi, phi_M, I_ch, source_gate)
            return {t: jnp.asarray(v) for t, v in out.items()}, jnp.int32(0)

        rhs = sys_.rhs(c, phi, phi_M, I_ch, source_gate)
        gradphi = sys_.gradphi_cells(phi)
        out = {}
        iters = jnp.int32(0)
        for t in sys_.tags:
            diag = sys_.diag(t, gradphi[t])  # (Ns, n)

            def solve_one(b_row, d_row, x0_row, D_k, z_k, t=t, gp=gradphi[t]):
                Minv = 1.0 / d_row
                return gmres(
                    lambda v: self.system.matvec_one(t, v, gp, D_k, z_k),
                    b_row,
                    x0=x0_row,
                    M=lambda v: Minv * v,
                    rtol=self.rtol,
                    atol=self.atol,
                    maxiter=self.maxiter,
                    restart=self.restart,
                    min_iter=self.min_iter,
                    dot=self.dot,
                )

            x0_t = (
                jnp.zeros_like(rhs[t])
                if x0 is None
                else x0[t][: sys_.n_solved]
            )
            res = jax.vmap(solve_one)(
                rhs[t], diag, x0_t, sys_.D[t], sys_.z_solved
            )
            out[t] = res.x
            iters = jnp.maximum(iters, res.iters.max())
        return out, iters


def create_solver_emi(system, direct=False, rtol=1e-5, atol=1e-40, **kw) -> EMISolver:
    return EMISolver(system, direct=direct, rtol=rtol, atol=atol, **kw)


def create_solver_knp(system, direct=False, rtol=1e-7, atol=2e-40, **kw) -> KNPSolver:
    return KNPSolver(system, direct=direct, rtol=rtol, atol=atol, **kw)
