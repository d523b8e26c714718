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

from typing import NamedTuple

from .cg import cg
from .gmres import gmres, gmres_batched
from . import direct as direct_mod


class SolveInfo(NamedTuple):
    """Health of one linear solve (aggregated over blocks for KNP).

    The reference surfaces this through PETSc's
    ``ksp_error_if_not_converged`` (pdeSolver.py:20,27,95); here the jitted
    step threads it into SimState and ``Simulation.run`` checks on host.
    """

    iters: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray


def _equilibrate(A, b, diag, x0=None):
    """Symmetric Jacobi equilibration: transform A x = b into
    (S A S) y = S b with S = diag(1/sqrt(|diag|)), x = S y.

    Beyond preconditioning, this is a *numerical-range* requirement for the
    f32 TPU path: physiological meshes are meter-scaled (h ~ 1e-7 m), raw
    matrix entries are ~1e-21 and unscaled residual dot products underflow
    f32.  After equilibration every Krylov quantity is O(1).
    """
    s = 1.0 / jnp.sqrt(jnp.abs(diag))
    A_hat = lambda v: s * A(s * v)
    b_hat = s * b
    x0_hat = None if x0 is None else x0 / s
    return A_hat, b_hat, x0_hat, s


class EMISolver:
    def __init__(
        self,
        system,
        direct: bool = False,
        rtol: float = 1e-5,
        atol: float = 1e-40,
        maxiter: int = 1000,
        dot: Callable = jnp.vdot,
        mg=None,
    ):
        self.system = system
        self.direct = direct
        self.rtol = rtol
        self.atol = atol
        self.maxiter = maxiter
        self.dot = dot
        # optional DeviceMG hierarchy (built on the equilibrated initial
        # operator, solvers/mg.py); replaces the Jacobi/deflation fallback
        self.mg = mg

    def solve(self, c, phi_M, I_ch=None, x0: Optional[Dict[int, jnp.ndarray]] = None):
        """Returns ({tag: phi}, SolveInfo)."""
        sys_ = self.system
        if self.direct:
            x = direct_mod.solve_emi_direct(sys_, c, phi_M, I_ch)
            x = jnp.asarray(x)
            return sys_.split(x), SolveInfo(
                jnp.int32(0), jnp.asarray(0.0, x.dtype), jnp.asarray(True)
            )

        kappa = sys_.kappa(c)
        ctx = sys_.prepare(kappa)  # once per solve (kappa gathers etc.)
        b = sys_.rhs(c, phi_M, I_ch)
        # equilibration scale: the hierarchy's lagged fine diagonal when
        # available (any positive scale gives the exact null direction
        # S^-1 1; skipping the per-solve diag assembly saves ~10 ms/step
        # at 3-D res 1), else assembled fresh
        if self.mg is not None and getattr(self.mg, "fine_diag", None) is not None:
            d = self.mg.fine_diag
        else:
            d = sys_.diag(kappa)
        x0_flat = None if x0 is None else sys_.flatten(x0)
        A_hat, b_hat, x0_hat, s = _equilibrate(
            lambda v: sys_.matvec(v, ctx), b, d, x0_flat
        )
        nullvec = sys_.nullvec
        if nullvec is not None:
            # null(S A S) = S^{-1} null(A); scale the system's null
            # direction (NOT a bare 1/s: sharded layouts carry padding
            # rows where the null direction is zero)
            nv = nullvec / s
            nullvec = nv / jnp.sqrt(self.dot(nv, nv))

        # Coarse-space deflation: the membrane coupling C_phi*M_Gamma is
        # weak relative to bulk conduction at physiological h, so each
        # ICS-subdomain indicator is a near-null mode that stalls plain
        # Jacobi-CG (the role hypre BoomerAMG plays in the reference,
        # pdeSolver.py:32).  An additive coarse correction over the
        # subdomain indicators removes those modes: M = I + W G^{-1} W^T
        # with W the ICS indicator block and G = W^T A_hat W.
        if self.mg is not None:
            M = lambda v: self.mg.apply(A_hat, v)
            res = cg(
                A_hat, b_hat, x0=x0_hat, M=M,
                rtol=self.rtol, atol=self.atol, maxiter=self.maxiter,
                nullspace=nullvec, dot=self.dot,
            )
            return sys_.split(s * res.x), SolveInfo(
                res.iters, res.resnorm, res.converged
            )

        W_cols = []
        for t in sys_.tags:
            if t == 0:
                continue
            e = jnp.zeros((sys_.n,), b.dtype)
            off = sys_.offsets[t]
            nd = sys_.sub[t]["n_dofs"]
            e = e.at[off : off + nd].set(1.0)
            W_cols.append(e / s)  # indicator in the equilibrated variables
        M = None
        if W_cols:
            W = jnp.stack(W_cols, axis=1)  # (n, k)
            AW = jnp.stack([A_hat(W[:, j]) for j in range(W.shape[1])], axis=1)
            G = W.T @ AW

            def M(v, W=W, G=G):
                return v + W @ jax.scipy.linalg.solve(G, W.T @ v)

        res = cg(
            A_hat,
            b_hat,
            x0=x0_hat,
            M=M,
            rtol=self.rtol,
            atol=self.atol,
            maxiter=self.maxiter,
            nullspace=nullvec,
            dot=self.dot,
        )
        return sys_.split(s * res.x), SolveInfo(
            res.iters, res.resnorm, res.converged
        )


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
        bdot: Optional[Callable] = None,
        mg=None,
    ):
        self.system = system
        self.direct = direct
        self.rtol = rtol
        self.atol = atol
        self.maxiter = maxiter
        self.restart = restart
        self.min_iter = min_iter
        self.dot = dot
        # batched inner product for the ion-batched GMRES path.  Derived
        # from `dot` only for the known compensated pair; callers passing
        # a custom dot supply the matching batched variant explicitly.
        if bdot is None:
            from .precision import dot2, bdot2

            bdot = bdot2 if dot is dot2 else None
        self.bdot = bdot
        # optional {tag: DeviceMG} hierarchies (lagged, built from the
        # t=0 operator with the ions' mean D; shared across the ion scan)
        self.mg = mg or {}

    def solve(
        self,
        c,
        phi,
        phi_M,
        I_ch=None,
        source_gate=1.0,
        x0: Optional[Dict[int, jnp.ndarray]] = None,
    ):
        """Returns ({tag: (N_solved, n)}, SolveInfo).

        SolveInfo aggregates over the (subdomain, ion) blocks — iters and
        resnorm are the max, converged the conjunction — the analog of the
        reference's single MatNest GMRES iteration count.
        """
        sys_ = self.system
        if self.direct:
            out = direct_mod.solve_knp_direct(sys_, c, phi, phi_M, I_ch, source_gate)
            out = {t: jnp.asarray(v) for t, v in out.items()}
            dt0 = next(iter(out.values())).dtype
            return out, SolveInfo(
                jnp.int32(0), jnp.asarray(0.0, dt0), jnp.asarray(True)
            )

        rhs = sys_.rhs(c, phi, phi_M, I_ch, source_gate)
        gradphi = sys_.gradphi_cells(phi)
        out = {}
        iters = jnp.int32(0)
        resnorm = None
        converged = jnp.asarray(True)
        for t in sys_.tags:
            mg_t = self.mg.get(t)
            if mg_t is not None and getattr(mg_t, "fine_diag", None) is not None:
                # lagged scale (mass + mean-D stiffness diagonal): the
                # drift part is negligible next to the 1/dt mass term
                diag = jnp.broadcast_to(
                    mg_t.fine_diag, (sys_.n_solved,) + mg_t.fine_diag.shape
                )
            else:
                diag = sys_.diag(t, gradphi[t])  # (Ns, n)

            def solve_one(b_row, d_row, x0_row, D_k, z_k, t=t,
                          gp=gradphi[t], mg_t=mg_t):
                A_hat, b_hat, x0_hat, s = _equilibrate(
                    lambda v: self.system.matvec_one(t, v, gp, D_k, z_k),
                    b_row, d_row, x0_row,
                )
                M = None if mg_t is None else (lambda v: mg_t.apply(A_hat, v))
                res = gmres(
                    A_hat,
                    b_hat,
                    x0=x0_hat,
                    M=M,
                    rtol=self.rtol,
                    atol=self.atol,
                    maxiter=self.maxiter,
                    restart=self.restart,
                    min_iter=self.min_iter,
                    dot=self.dot,
                )
                return res._replace(x=s * res.x)

            x0_t = (
                jnp.zeros_like(rhs[t])
                if x0 is None
                else x0[t][: sys_.n_solved]
            )
            if getattr(sys_, "use_pallas", False):
                # batched GMRES: all ions of the subdomain through ONE
                # operator application per iteration — the Pallas
                # kernel's dominant cost (the materialized one-hot E)
                # is shared across the ion rows
                # (knp_apply_blocked_batch), so B systems cost ~1x
                s_eq = 1.0 / jnp.sqrt(jnp.abs(diag))  # (Ns, n)
                A_hat = lambda V, t=t, s_eq=s_eq: s_eq * sys_.matvec_batch(
                    t, s_eq * V, gradphi[t]
                )
                M = None
                if mg_t is not None:
                    _noA = lambda V: V  # level-0 uses the lagged ELL/band

                    def M(V, mg_t=mg_t):
                        # batched V-cycle: each level's slab is read once
                        # for all ions (vs once per ion under vmap)
                        return mg_t.apply_batch(_noA, V)

                res = gmres_batched(
                    A_hat,
                    s_eq * rhs[t],
                    x0=x0_t / s_eq,
                    M=M,
                    rtol=self.rtol,
                    atol=self.atol,
                    maxiter=self.maxiter,
                    restart=self.restart,
                    min_iter=self.min_iter,
                    bdot=self.bdot,
                )
                out[t] = s_eq * res.x
                iters = jnp.maximum(iters, res.iters)
                rn_t, ok_t = res.resnorm.max(), res.converged
            else:
                res = jax.vmap(solve_one)(
                    rhs[t], diag, x0_t, sys_.D[t], sys_.z_solved
                )
                out[t] = res.x
                iters = jnp.maximum(iters, res.iters.max())
                rn_t, ok_t = res.resnorm.max(), res.converged.all()
            resnorm = rn_t if resnorm is None else jnp.maximum(resnorm, rn_t)
            converged = converged & ok_t
        return out, SolveInfo(iters, resnorm, converged)


def create_solver_emi(system, direct=False, rtol=1e-5, atol=1e-40, **kw) -> EMISolver:
    return EMISolver(system, direct=direct, rtol=rtol, atol=atol, **kw)


def create_solver_knp(system, direct=False, rtol=1e-7, atol=2e-40, **kw) -> KNPSolver:
    return KNPSolver(system, direct=direct, rtol=rtol, atol=atol, **kw)
