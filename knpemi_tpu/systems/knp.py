"""The KNP (concentration) block system, matrix-free and ion-batched.

TPU-native equivalent of the reference's knpWeakForm.py: for every
subdomain s and every solved ion k (the last ion is eliminated,
knpWeakForm.py:53), one implicit-Euler advection-diffusion equation

    (1/dt) int u v + int D_k grad(u).grad(v)
                   + z_k psi int D_k u grad(phi_s).grad(v)        (LHS)
  =
    (1/dt) int c_prev v  [+ sources]  [+ membrane Robin/coupling terms]

The LHS (knpWeakForm.py:123-143) contains **no interface terms**: the
block system is block-diagonal over (subdomain, ion), so the framework
solves the ion systems of one subdomain *batched with vmap* — a TPU-first
restructuring of the reference's single MatNest GMRES solve (the linear
algebra is equivalent; the preconditioned iterations differ but both sides
converge to rtol).

The membrane Robin terms (knpWeakForm.py:146-216) carry nonlinear
coefficients built from traces of the previous concentrations:

    alpha_r = D_r z^2 c_r / sum_l D_l z_l^2 c_l     (transference number)
    C_r     = alpha_r C_M / (F z dt)
    g_e     = phi_M - dt/(C_M alpha_e) I_ch_k + (dt/C_M) I_ch   (splitting)

integrated with facet quadrature (coefficients evaluated pointwise at
quadrature points from the two-sided P1 traces).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kernels as K
from ..ops.geometry import DiscreteGeometry
from .types import Ion, PhysicalParams


@dataclasses.dataclass
class KNPMMSData:
    """Manufactured-solution data (knpWeakForm.py:219-271).

    In the reference's MMS test the potential entering the drift and the
    interface coupling is the *exact* phi (run_mms.py:444-445), coupling
    coefficients are constants C=1, and the Robin data g is analytic.
    """

    # per tag: (N_solved, n_cells, nq) ion sources f_k
    f_k_q: Dict[int, np.ndarray]
    cell_bary: np.ndarray
    cell_qw: np.ndarray
    # per tag: (n_cells, nq, dim) exact grad(phi) for the drift term
    gradphi_q: Dict[int, np.ndarray]
    # per membrane tag: (N_solved, nf, nq) robin data per side
    g_robin_e_q: Dict[int, np.ndarray]
    g_robin_i_q: Dict[int, np.ndarray]
    # per membrane tag: (nf, nq) exact phi_i - phi_e at facet quad points
    dphi_q: Dict[int, np.ndarray]
    facet_bary: np.ndarray
    facet_qw: np.ndarray
    # per boundary tag: (N_solved, nf, nq) Neumann -J_k_e . n on the whole
    # exterior boundary (knpWeakForm.py:269)
    neumann_q: Dict[int, np.ndarray]
    # coupling constants C_r (=1 in the reference MMS)
    C_e: float = 1.0
    C_i: float = 1.0


class KNPSystem:
    def __init__(
        self,
        geom: DiscreteGeometry,
        ions: List[Ion],
        params: PhysicalParams,
        splitting_scheme: bool = True,
        mms: Optional[KNPMMSData] = None,
        reduce: Optional[callable] = None,
        dtype=jnp.float64,
        use_pallas: bool = False,
        pallas_interpret: bool = False,
    ):
        self.geom = geom
        self.ions = ions
        self.params = params
        self.splitting_scheme = splitting_scheme and mms is None
        self.mms = mms
        self.reduce = reduce or (lambda v: v)
        self.dtype = dtype
        self.tags = geom.sub_tags
        self.n_solved = len(ions) - 1
        self.dim = geom.dim

        self.sub = {
            t: dict(
                cells=jnp.asarray(s.cells),
                grads=jnp.asarray(s.grads, dtype=dtype),
                vols=jnp.asarray(s.vols, dtype=dtype),
                n_dofs=s.n_dofs,
            )
            for t, s in geom.subdomains.items()
        }
        self.mem = {
            m: dict(
                facet_dofs=jnp.asarray(sp.facet_dofs),
                facet_edofs=jnp.asarray(sp.facet_edofs),
                facet_idofs=jnp.asarray(sp.facet_idofs),
                areas=jnp.asarray(sp.areas, dtype=dtype),
                mem_to_ecs=jnp.asarray(sp.mem_to_ecs),
                mem_to_ics=jnp.asarray(sp.mem_to_ics),
                cell_tag=sp.cell_tag,
            )
            for m, sp in geom.membranes.items()
        }
        # ECS source terms at cell quadrature points, combined per tag into
        # one (n_cells, nq, N_solved) array (or None) so the SPMD path can
        # shard it along cells with the rest of the cell data.
        self.fsrc: Dict[int, Optional[np.ndarray]] = {}
        for t in self.tags:
            cols = []
            any_src = False
            nc = geom.subdomains[t].n_cells
            from ..ops import quadrature as quad

            nq = quad.cell_rule(self.dim)[0].shape[0]
            for ion in ions[:-1]:
                if ion.f_source_q and t in ion.f_source_q:
                    cols.append(np.asarray(ion.f_source_q[t]))
                    any_src = True
                else:
                    cols.append(np.zeros((nc, nq)))
            self.fsrc[t] = (
                jnp.asarray(np.stack(cols, axis=-1), dtype=dtype)
                if any_src else None
            )

        # The source's SPATIAL profile is static — only the scalar
        # source_gate varies in time — so assemble the quadrature RHS
        # vector ONCE here.  Inside the jitted step the alternative is a
        # constant-only scatter-add subgraph over every cell that XLA
        # does not fold: measured 113 ms per KNP solve at the 840k-dof
        # flagship (~9% of the step).  The sharded local-view path keeps
        # the per-device quad evaluation (its cells are partitioned).
        self._src_vec: Dict[int, Optional[jnp.ndarray]] = {}
        for t in self.tags:
            if self.fsrc[t] is None:
                self._src_vec[t] = None
                continue
            from ..ops import quadrature as quad

            cb, cw = quad.cell_rule(self.dim)
            s = geom.subdomains[t]
            self._src_vec[t] = jax.vmap(
                lambda fq: K.source_rhs_quad(
                    s.n_dofs, fq,
                    jnp.asarray(s.cells), jnp.asarray(s.vols, dtype=dtype),
                    jnp.asarray(cb, dtype=dtype), jnp.asarray(cw, dtype=dtype),
                )
            )(jnp.moveaxis(self.fsrc[t], -1, 0))

        # per-tag per-ion coefficient vectors (N_solved,) and all-ion (N,)
        self.z_solved = jnp.asarray([ion.z for ion in ions[:-1]], dtype=dtype)
        self.z_all = jnp.asarray([ion.z for ion in ions], dtype=dtype)
        self.D = {
            t: jnp.asarray([ion.D[t] for ion in ions[:-1]], dtype=dtype)
            for t in self.tags
        }
        self.D_all = {
            t: jnp.asarray([ion.D[t] for ion in ions], dtype=dtype)
            for t in self.tags
        }

        self.use_pallas = False
        self.pallas_interpret = (
            pallas_interpret or jax.devices()[0].platform != "tpu"
        )
        self.blocked = {}
        self.mem_blocked = {}
        if use_pallas:
            from ..ops import pallas_assembly as PA

            ok = True
            for t, sd in geom.subdomains.items():
                bk = PA.build_blocking(sd.cells, sd.grads, sd.vols, sd.n_dofs)
                if bk is None:
                    ok = False
                    break
                # frozen dof->cell grad(phi) operator: turns the
                # per-solve drift-context XLA gather (~40 ms at flagship
                # scale) into one windowed-ELL kernel launch
                drift = PA.build_interp_ellw(
                    bk,
                    bk.grads_lane.reshape(
                        bk.n_blocks, bk.n_chunks, bk.dim, bk.k, bk.C
                    ),
                )
                dbk = bk.device(dtype)
                self.blocked[t] = dict(
                    bk=dbk,
                    grads=dbk.grads_lane,
                    vols=dbk.vols_lane,
                    drift=None if drift is None else drift.device(dtype),
                )
            self.use_pallas = ok
            if ok:
                # membrane Robin RHS in MEMBRANE-dof space: the facet
                # quadrature becomes dense math between one blocked
                # gather and one blocked scatter (see rhs())
                for m, sp_ in geom.membranes.items():
                    bkm = PA.build_facet_blocking(
                        sp_.facet_dofs, sp_.areas, sp_.n_dofs
                    )
                    if bkm is None:
                        continue
                    NBm, NCHm = bkm.n_blocks, bkm.n_chunks
                    area_mc = np.asarray(bkm.vols_lane).reshape(
                        NBm, NCHm, bkm.k, bkm.C
                    )[:, :, 0, :].reshape(NBm * NCHm, bkm.C)
                    self.mem_blocked[m] = dict(
                        bk=bkm.device(dtype),
                        areas=jnp.asarray(area_mc, dtype=dtype),
                    )

    # ------------------------------------------------------------------
    def gradphi_cells(self, phi: Dict[int, jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        """Per-tag drift context: cell-layout grad(phi), plus the blocked
        layout when the Pallas path is active."""
        out = {}
        for t in self.tags:
            ctx = dict(
                cell=K.cell_gradients(
                    phi[t], self.sub[t]["cells"], self.sub[t]["grads"]
                )
            )
            if self.use_pallas:
                from ..ops import pallas_assembly as PA

                blk = self.blocked[t]
                ctx["blocked"] = PA.prepare_knp_drift(
                    phi[t], blk["bk"], blk["grads"],
                    drift_ellw=blk.get("drift"),
                    interpret=self.pallas_interpret,
                )
            out[t] = ctx
        return out

    def local_view(self, sub, mem, reduce):
        """Shallow copy with (sharded) local geometry arrays and a cross-
        device `reduce` — used inside shard_map (knpemi_tpu.parallel.spmd)."""
        import copy

        new = copy.copy(self)
        new.sub = {t: dict(self.sub[t], **sub[t]) for t in self.tags}
        new.mem = {m: dict(self.mem[m], **mem[m]) for m in self.mem}
        new.reduce = reduce
        new.use_pallas = False  # SPMD path shards the XLA kernels
        return new

    def matvec_one(self, tag: int, x: jnp.ndarray, gradphi, D, z):
        """LHS action for a single (subdomain, ion) block.  ``gradphi`` is
        the per-tag context from :meth:`gradphi_cells`."""
        if self.use_pallas and self.mms is None:
            from ..ops import pallas_assembly as PA

            blk = self.blocked[tag]
            y = PA.knp_apply_blocked(
                x, blk["bk"], blk["grads"], blk["vols"], gradphi["blocked"],
                1.0 / self.params.dt, D, z * self.params.psi * D,
                interpret=self.pallas_interpret,
            )
            return self.reduce(y)
        one = self._one_matvec(tag, gradphi["cell"] if isinstance(gradphi, dict) else gradphi)
        return one(x, D, z)

    def _one_matvec(self, tag: int, gradphi_cell):
        s = self.sub[tag]
        dt, psi = self.params.dt, self.params.psi

        if self.mms is not None:
            w_q = jnp.asarray(self.mms.gradphi_q[tag])
            bary = jnp.asarray(self.mms.cell_bary)
            qw = jnp.asarray(self.mms.cell_qw)

            def one(x, D, z):
                y = K.mass_apply(s["n_dofs"], x, s["cells"], s["vols"], 1.0 / dt)
                y += K.stiffness_apply(
                    s["n_dofs"], x, s["cells"], s["grads"], s["vols"], coef_cell=D
                )
                y += K.drift_apply_quad(
                    s["n_dofs"], x, s["cells"], s["grads"], s["vols"],
                    w_q, bary, qw, coef=z * psi * D,
                )
                return self.reduce(y)

        else:

            def one(x, D, z):
                y = K.mass_apply(s["n_dofs"], x, s["cells"], s["vols"], 1.0 / dt)
                y += K.stiffness_apply(
                    s["n_dofs"], x, s["cells"], s["grads"], s["vols"], coef_cell=D
                )
                y += K.drift_apply(
                    s["n_dofs"], x, s["cells"], s["grads"], s["vols"],
                    gradphi_cell, coef=z * psi * D,
                )
                return self.reduce(y)

        return one

    def matvec_batch(self, tag: int, X: jnp.ndarray, gradphi):
        """All solved ion systems of one subdomain in a single operator
        application: X (N_solved, n) -> (N_solved, n).  On the Pallas
        path this shares the materialized one-hot E across ions
        (ops/pallas_assembly.py::knp_apply_blocked_batch) — the batched
        call costs barely more than one ion's."""
        if self.use_pallas and self.mms is None:
            from ..ops import pallas_assembly as PA

            blk = self.blocked[tag]
            return self.reduce(
                PA.knp_apply_blocked_batch(
                    X, blk["bk"], blk["grads"], blk["vols"],
                    gradphi["blocked"], 1.0 / self.params.dt,
                    self.D[tag], self.z_solved, self.params.psi,
                    interpret=self.pallas_interpret,
                )
            )
        return self.matvec(tag, X, gradphi)

    def matvec(self, tag: int, X: jnp.ndarray, gradphi):
        """Batched LHS action for one subdomain: X (N_solved, n) -> (N_solved, n).

        For MMS, the drift uses the exact-phi quadrature path instead.
        """
        gp = gradphi["cell"] if isinstance(gradphi, dict) else gradphi
        one = self._one_matvec(tag, gp)
        return jax.vmap(one)(X, self.D[tag], self.z_solved)

    def diag(self, tag: int, gradphi) -> jnp.ndarray:
        """Batched Jacobi diagonal (N_solved, n)."""
        gp = gradphi["cell"] if isinstance(gradphi, dict) else gradphi
        s = self.sub[tag]
        dt, psi = self.params.dt, self.params.psi
        md = K.mass_diag(s["n_dofs"], s["cells"], s["vols"], 1.0 / dt)
        sd = K.stiffness_diag(s["n_dofs"], s["cells"], s["grads"], s["vols"])
        dd = K.drift_diag(
            s["n_dofs"], s["cells"], s["grads"], s["vols"], gp
        )
        D = self.D[tag][:, None]
        z = self.z_solved[:, None]
        return self.reduce(md[None, :]) + D * self.reduce(sd[None, :]) \
            + z * psi * D * self.reduce(dd[None, :])

    # ------------------------------------------------------------------
    def _robin_facet_values(self, ct, Xloc, areas, fbj, fwj):
        """Per-slot assembled values of the membrane Robin RHS terms from
        facet-LOCAL P1 values — the shared algebra of the blocked
        (membrane-space Pallas) and outlier-facet paths.

        Xloc: (F, M, k, L) facet-local values of the stacked fields
        [c_e (N) | c_i (N) | dphi | phi_M | I_ch (N)]; areas: (M, L)
        (zero on padding facets).  Returns (2*Ns, M, k, L): the e-side
        then i-side integrand values, area- and quadrature-weighted
        (knpWeakForm.py:146-216 algebra, identical to the XLA path).
        """
        p = self.params
        dt, Fc, C_M = p.dt, p.F, p.C_M
        N, Ns = len(self.ions), self.n_solved
        Tq = jnp.einsum("fmkl,qk->fmql", Xloc, fbj)
        c_e_q, c_i_q = Tq[:N], Tq[N : 2 * N]
        dphi_q, phiM_q = Tq[2 * N], Tq[2 * N + 1]
        Ich_q = Tq[2 * N + 2 :]

        def alpha(tag, cq):
            Dz2 = self.D_all[tag] * self.z_all**2  # (N,)
            w = Dz2[:, None, None, None] * cq
            den = w.sum(axis=0)
            den = jnp.where(den == 0, 1.0, den)  # padding facets only
            return w[:Ns] / den[None]

        alpha_e = alpha(0, c_e_q)  # (Ns, M, nq, L)
        alpha_i = alpha(ct, c_i_q)
        z = self.z_solved[:, None, None, None]
        C_e = alpha_e * C_M / (Fc * z * dt)
        C_i = alpha_i * C_M / (Fc * z * dt)
        Ich_tot_q = Ich_q.sum(axis=0)
        Ich_k_q = Ich_q[:Ns]
        if self.splitting_scheme:
            g_e = (
                phiM_q[None]
                - dt / (C_M * alpha_e) * Ich_k_q
                + (dt / C_M) * Ich_tot_q[None]
            )
            g_i = (
                phiM_q[None]
                - dt / (C_M * alpha_i) * Ich_k_q
                + (dt / C_M) * Ich_tot_q[None]
            )
        else:
            g_e = phiM_q[None] - dt / (C_M * alpha_e) * Ich_k_q
            g_i = phiM_q[None] - dt / (C_M * alpha_i) * Ich_k_q
        integ = jnp.concatenate(
            [C_e * (dphi_q[None] - g_e), C_i * (g_i - dphi_q[None])], axis=0
        )  # (2Ns, M, nq, L)
        return jnp.einsum("smql,q,qk->smkl", integ, fwj, fbj) * areas[
            None, :, None, :
        ]

    def _membrane_rhs_blocked(self, m, sp, c, phi, phi_M, I_ch, fbj, fwj):
        """Membrane Robin RHS in membrane-dof space: ONE flat gather per
        side + two blocked facet kernels replace the facet-level path's
        ~6x duplicate-indexed random traffic.  Returns (y_e, y_i), each
        (Ns, n_mem), to be scatter-added at mem_to_ecs / mem_to_ics."""
        from ..ops import pallas_assembly as PA

        mb = self.mem_blocked[m]
        bkm = mb["bk"]
        ct = sp["cell_tag"]
        N, Ns = len(self.ions), self.n_solved
        c_e_m = c[0][:, sp["mem_to_ecs"]]  # (N, n_mem)
        c_i_m = c[ct][:, sp["mem_to_ics"]]
        dphi_m = phi[ct][sp["mem_to_ics"]] - phi[0][sp["mem_to_ecs"]]
        X = jnp.concatenate(
            [c_e_m, c_i_m, dphi_m[None], phi_M[m][None], I_ch[m]], axis=0
        )  # (F, n_mem)
        G = PA.facet_gather_blocked(X, bkm, interpret=self.pallas_interpret)
        NB, NCH, F, KC = G.shape
        k, C = bkm.k, KC // bkm.k
        Xloc = (
            G.reshape(NB * NCH, F, k, C).transpose(1, 0, 2, 3)
        )  # (F, M, k, C)
        vals = self._robin_facet_values(ct, Xloc, mb["areas"], fbj, fwj)
        V = (
            vals.transpose(1, 0, 2, 3)  # (M, 2Ns, k, C)
            .reshape(NB, NCH, 2 * Ns, KC)
        )
        Y = PA.facet_scatter_blocked(
            V, bkm, interpret=self.pallas_interpret
        )  # (2Ns, n_mem)
        y_e, y_i = Y[:Ns], Y[Ns:]
        if len(bkm.rest_cells):
            rc = jnp.asarray(bkm.rest_cells)  # (nr, k)
            ra = jnp.asarray(bkm.rest_vols, self.dtype)  # (nr,)
            Xr = X[:, rc].transpose(0, 2, 1)[:, None]  # (F, 1, k, nr)
            vr = self._robin_facet_values(ct, Xr, ra[None, :], fbj, fwj)
            vr = vr[:, 0].transpose(0, 2, 1)  # (2Ns, nr, k)
            n_m = X.shape[1]
            add = jax.vmap(lambda v: K.scatter_add(n_m, rc, v))(vr)
            y_e = y_e + add[:Ns]
            y_i = y_i + add[Ns:]
        return y_e, y_i

    def _alpha_q(self, tag: int, c_traces_q: jnp.ndarray) -> jnp.ndarray:
        """Transference numbers at facet quadrature points.

        c_traces_q: (N_ions, nf, nq) traces of ALL ions from side `tag`.
        Returns (N_solved, nf, nq): alpha_k = D_k z_k^2 c_k / sum_l D_l z_l^2 c_l
        (knpWeakForm.py:83-100, 178-179).
        """
        Dz2 = self.D_all[tag] * self.z_all**2  # (N,)
        weighted = Dz2[:, None, None] * c_traces_q
        denom = weighted.sum(axis=0)
        return weighted[: self.n_solved] / denom

    def rhs(
        self,
        c: Dict[int, jnp.ndarray],
        phi: Dict[int, jnp.ndarray],
        phi_M: Dict[int, jnp.ndarray],
        I_ch: Optional[Dict[int, jnp.ndarray]] = None,
        source_gate: float | jnp.ndarray = 1.0,
    ) -> Dict[int, jnp.ndarray]:
        """RHS per subdomain: {tag: (N_solved, n)} (knpWeakForm.py:146-216)."""
        p = self.params
        dt, F, C_M = p.dt, p.F, p.C_M
        mms = self.mms

        r = {}
        for t in self.tags:
            s = self.sub[t]
            # time derivative: (1/dt) c_prev.  On the Pallas path the
            # batched operator kernel with D = z = 0 IS the mass action
            # (gather/scatter-free); the XLA scatter path costs ~8 ms at
            # 3-D res 1 and was the largest single RHS term.
            if self.use_pallas and mms is None:
                from ..ops import pallas_assembly as PA

                blk = self.blocked[t]
                nrest = len(blk["bk"].rest_cells)
                rest_w = (
                    jnp.zeros((nrest, self.dim), self.dtype)
                    if nrest else None
                )
                zeros = jnp.zeros((self.n_solved,), self.dtype)
                r_t = PA.knp_apply_blocked_batch(
                    c[t][: self.n_solved], blk["bk"], blk["grads"],
                    blk["vols"], (blk["grads"], rest_w), 1.0 / dt,
                    zeros, zeros, self.params.psi,
                    interpret=self.pallas_interpret,
                )
            else:
                r_t = jax.vmap(
                    lambda x: K.mass_apply(
                        s["n_dofs"], x, s["cells"], s["vols"], 1.0 / dt
                    )
                )(c[t][: self.n_solved])
            # sources
            if mms is not None and t in mms.f_k_q:
                cb, cw = jnp.asarray(mms.cell_bary), jnp.asarray(mms.cell_qw)
                r_t += jax.vmap(
                    lambda fq: K.source_rhs_quad(
                        s["n_dofs"], fq, s["cells"], s["vols"], cb, cw
                    )
                )(jnp.asarray(mms.f_k_q[t]))
            if mms is None and self.fsrc[t] is not None:
                if "fsrc" in s:
                    # sharded local view: cells are partitioned, so the
                    # quad evaluation runs on the device-local slice
                    from ..ops import quadrature as quad

                    cb, cw = quad.cell_rule(self.dim)
                    cb = jnp.asarray(cb, dtype=self.dtype)
                    cw = jnp.asarray(cw, dtype=self.dtype)
                    r_t = r_t + source_gate * jax.vmap(
                        lambda fq: K.source_rhs_quad(
                            s["n_dofs"], fq, s["cells"], s["vols"], cb, cw
                        )
                    )(jnp.moveaxis(s["fsrc"], -1, 0))
                else:
                    # static spatial profile x time gate: precomputed
                    r_t = r_t + source_gate * self._src_vec[t]
            r[t] = r_t

        # ---- membrane Robin + coupling terms --------------------------------
        if mms is not None:
            fb, fw = jnp.asarray(mms.facet_bary), jnp.asarray(mms.facet_qw)
            for m, sp in self.mem.items():
                ct = sp["cell_tag"]
                dphi = jnp.asarray(mms.dphi_q[m])  # (nf, nq)
                g_e = jnp.asarray(mms.g_robin_e_q[m])  # (Ns, nf, nq)
                g_i = jnp.asarray(mms.g_robin_i_q[m])
                Ce, Ci = mms.C_e, mms.C_i
                r[0] += jax.vmap(
                    lambda ge: K.facet_rhs_quad(
                        self.sub[0]["n_dofs"], Ce * (dphi - ge),
                        sp["facet_edofs"], sp["areas"], fb, fw,
                    )
                )(g_e)
                r[ct] += jax.vmap(
                    lambda gi: K.facet_rhs_quad(
                        self.sub[ct]["n_dofs"], Ci * (gi - dphi),
                        sp["facet_idofs"], sp["areas"], fb, fw,
                    )
                )(g_i)
            # exterior Neumann (whole boundary, knpWeakForm.py:269)
            for btag, nq in mms.neumann_q.items():
                bs = self.geom.boundaries[btag]
                fd = jnp.asarray(bs.facet_dofs)
                ar = jnp.asarray(bs.areas)
                r[bs.sub_tag] += jax.vmap(
                    lambda jq: K.facet_rhs_quad(
                        self.sub[bs.sub_tag]["n_dofs"], jq, fd, ar, fb, fw
                    )
                )(jnp.asarray(nq))
            return {t: self.reduce(v) for t, v in r.items()}

        from ..ops import quadrature as quad

        fb_np, fw_np = quad.facet_rule(self.geom.dim)
        fb = jnp.asarray(fb_np, dtype=self.dtype)
        fw = jnp.asarray(fw_np, dtype=self.dtype)
        for m, sp in self.mem.items():
            ct = sp["cell_tag"]
            if self.use_pallas and m in self.mem_blocked:
                y_e, y_i = self._membrane_rhs_blocked(
                    m, sp, c, phi, phi_M, I_ch, fb, fw
                )
                r[0] = r[0].at[:, sp["mem_to_ecs"]].add(y_e)
                r[ct] = r[ct].at[:, sp["mem_to_ics"]].add(y_i)
                continue
            # traces of all ions at facet quadrature points, both sides
            c_e_q = jnp.einsum("Kfk,qk->Kfq", c[0][:, sp["facet_edofs"]], fb)
            c_i_q = jnp.einsum("Kfk,qk->Kfq", c[ct][:, sp["facet_idofs"]], fb)
            alpha_e = self._alpha_q(0, c_e_q)  # (Ns, nf, nq)
            alpha_i = self._alpha_q(ct, c_i_q)
            z = self.z_solved[:, None, None]
            C_e = alpha_e * C_M / (F * z * dt)
            C_i = alpha_i * C_M / (F * z * dt)

            phiM_q = K.trace_at_quad(phi_M[m], sp["facet_dofs"], fb)  # (nf, nq)
            dphi_q = K.trace_at_quad(
                phi[ct], sp["facet_idofs"], fb
            ) - K.trace_at_quad(phi[0], sp["facet_edofs"], fb)

            # channel currents on the membrane space: (N_ions, n_m)
            Ich = I_ch[m]
            Ich_q = jnp.einsum("Kfk,qk->Kfq", Ich[:, sp["facet_dofs"]], fb)
            Ich_tot_q = Ich_q.sum(axis=0)  # (nf, nq)
            Ich_k_q = Ich_q[: self.n_solved]

            if self.splitting_scheme:
                g_e = (
                    phiM_q[None]
                    - dt / (C_M * alpha_e) * Ich_k_q
                    + (dt / C_M) * Ich_tot_q[None]
                )
                g_i = (
                    phiM_q[None]
                    - dt / (C_M * alpha_i) * Ich_k_q
                    + (dt / C_M) * Ich_tot_q[None]
                )
            else:
                g_e = phiM_q[None] - dt / (C_M * alpha_e) * Ich_k_q
                g_i = phiM_q[None] - dt / (C_M * alpha_i) * Ich_k_q

            r[0] += jax.vmap(
                lambda ce, ge: K.facet_rhs_quad(
                    self.sub[0]["n_dofs"], ce * (dphi_q - ge),
                    sp["facet_edofs"], sp["areas"], fb, fw,
                )
            )(C_e, g_e)
            r[ct] += jax.vmap(
                lambda ci, gi: K.facet_rhs_quad(
                    self.sub[ct]["n_dofs"], ci * (gi - dphi_q),
                    sp["facet_idofs"], sp["areas"], fb, fw,
                )
            )(C_i, g_i)
        return {t: self.reduce(v) for t, v in r.items()}


def create_functions_knp(geom: DiscreteGeometry, ions: List[Ion], dtype=jnp.float64):
    """Allocate concentration state {tag: zeros(N_ions, n_dofs)} (API parity
    with knpWeakForm.py:47-80; the eliminated ion is the last row)."""
    return {
        t: jnp.zeros((len(ions), s.n_dofs), dtype)
        for t, s in geom.subdomains.items()
    }


def knp_system(
    geom: DiscreteGeometry,
    ions: List[Ion],
    params: PhysicalParams,
    splitting_scheme: bool = True,
    mms: Optional[KNPMMSData] = None,
) -> KNPSystem:
    return KNPSystem(geom, ions, params, splitting_scheme, mms)
