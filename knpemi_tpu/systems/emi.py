"""The EMI (potential) block system, matrix-free.

TPU-native equivalent of the reference's emiWeakForm.py: one block
elliptic system for the potentials {phi_s} of all subdomains, coupled
through membrane facet terms.

Weak form (emiWeakForm.py:138-241), for every subdomain s with test v_s:

    sum_s  int_{Omega_s} kappa_s grad(phi_s) . grad(v_s) dx
  + sum_m  C_phi int_{Gamma_m} (phi_i - phi_e)(v_i - v_e) dS
  =
    sum_s sum_k  -F z_k int_{Omega_s} D_k,s grad(c_k) . grad(v_s) dx
  + sum_m  C_phi int_{Gamma_m} g (v_i - v_e) dS

with kappa_s = F psi sum_k z_k^2 D_k,s c_k,s (emiWeakForm.py:103) a P1
field rebuilt from the previous concentrations every step, and Robin data
g = phi_M_prev under the Ellingsrud splitting scheme
(g = phi_M_prev - I_ch/C_phi without splitting, emiWeakForm.py:231-239).

The system is assembled *matrix-free*: `matvec` runs the batched P1
kernels of :mod:`knpemi_tpu.ops.kernels` over static index arrays.  The
system is pure-Neumann and singular with constant nullspace unless a
Dirichlet BC is attached (MMS only), matching PETSc's nullspace handling
(pdeSolver.py:72-78).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..ops import kernels as K
from ..ops.geometry import DiscreteGeometry
from .types import Ion, PhysicalParams


@dataclasses.dataclass
class EMIMMSData:
    """Extra manufactured-solution terms (emiWeakForm.py:244-285, 344-362)."""

    # per subdomain tag: source f_phi at cell quadrature points (nc, nq)
    f_phi_q: Dict[int, np.ndarray]
    cell_bary: np.ndarray  # (nq, d+1)
    cell_qw: np.ndarray  # (nq,)
    # per membrane tag: robin data / current-jump at facet quad points
    f_phi_m_q: Dict[int, np.ndarray]
    f_I_M_q: Dict[int, np.ndarray]
    facet_bary: np.ndarray  # (nqf, d)
    facet_qw: np.ndarray
    # Neumann flux sum_k -F z_k (J_k_e . n) at boundary facet quad points,
    # per boundary tag (reference only uses tag 5, emiWeakForm.py:262)
    neumann_q: Dict[int, np.ndarray]
    # Dirichlet BC on the ECS exterior boundary: (local ECS dofs, values)
    dirichlet_dofs: Optional[np.ndarray] = None
    dirichlet_vals: Optional[np.ndarray] = None


class EMISystem:
    def __init__(
        self,
        geom: DiscreteGeometry,
        ions: List[Ion],
        params: PhysicalParams,
        splitting_scheme: bool = True,
        mms: Optional[EMIMMSData] = None,
        reduce: Optional[callable] = None,
        dtype=jnp.float64,
        use_pallas: bool = False,
        pallas_interpret: bool = False,
    ):
        # `reduce` is the cross-device reduction applied to every assembled
        # vector (identity on a single device; lax.psum(...,'cells') under
        # shard_map — see knpemi_tpu.parallel.spmd).
        self.reduce = reduce or (lambda v: v)
        self.dtype = dtype
        self.geom = geom
        self.ions = ions
        self.params = params
        # MMS runs have no ODEs: splitting disabled (emiWeakForm.py:292-294)
        self.splitting_scheme = splitting_scheme and mms is None
        self.mms = mms

        self.tags = geom.sub_tags
        self.offsets = geom.emi_offsets()
        self.n = geom.emi_size

        # device copies of static geometry
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

        # Dirichlet mask (flat); MMS only
        mask = np.ones(self.n, dtype=np.dtype(str(np.dtype(dtype))))
        self._bc_vals_flat = None
        if mms is not None and mms.dirichlet_dofs is not None:
            off0 = self.offsets[0]
            mask[off0 + mms.dirichlet_dofs] = 0.0
            v = np.zeros(self.n)
            v[off0 + mms.dirichlet_dofs] = mms.dirichlet_vals
            self._bc_vals_flat = jnp.asarray(v)
        self.bc_mask = jnp.asarray(mask)
        self.has_bc = self._bc_vals_flat is not None

        # normalized constant null vector (pure-Neumann case)
        self.nullvec = None if self.has_bc else jnp.full(
            (self.n,), 1.0 / np.sqrt(self.n), dtype=dtype
        )

        # blocked (Pallas) assembly path: one-hot-matmul windows replace
        # XLA gather/scatter on TPU (ops/pallas_assembly.py)
        self.use_pallas = False
        import jax as _jax

        self.pallas_interpret = (
            pallas_interpret or _jax.devices()[0].platform != "tpu"
        )
        self.blocked = {}
        self.mem_blocked = {}
        self._mem_diag_flat = None
        if use_pallas:
            from ..ops import pallas_assembly as PA

            ok = True
            for t, sd in geom.subdomains.items():
                bk = PA.build_blocking(
                    sd.cells, sd.grads, sd.vols, sd.n_dofs
                )
                if bk is None:
                    ok = False
                    break
                # frozen dof->cell mean-kappa operator: the per-solve
                # coefficient gather (~40 ms at flagship scale) becomes
                # one windowed-ELL kernel launch.  Padding lanes carry
                # zero weight (real cells have vol > 0).
                k_c = bk.cells_chunk.shape[-1]
                pad = (
                    bk.vols_lane[:, :, 0, : bk.C] != 0
                )[:, :, None, None, :]
                kbar = PA.build_interp_ellw(
                    bk,
                    np.broadcast_to(
                        pad / k_c,
                        (bk.n_blocks, bk.n_chunks, 1, k_c, bk.C),
                    ),
                )
                dbk = bk.device(dtype)
                self.blocked[t] = dict(
                    bk=dbk,
                    grads=dbk.grads_lane,
                    vols=dbk.vols_lane,
                    cells=dbk.cells_chunk,
                    kbar=None if kbar is None else kbar.device(dtype),
                )
            self.use_pallas = ok
            if ok:
                # membrane coupling in MEMBRANE-dof space: u_M = R_i x_i
                # - R_e x_e (one 2*n_mem gather), M_Gamma applied by the
                # blocked facet kernel, one 2*n_mem scatter back — vs the
                # facet-level path's ~6x duplicate-indexed random traffic
                for m, sp_ in geom.membranes.items():
                    bkm = PA.build_facet_blocking(
                        sp_.facet_dofs, sp_.areas, sp_.n_dofs
                    )
                    if bkm is None:
                        continue
                    kf = sp_.facet_dofs.shape[1]
                    flat_idx = np.concatenate([
                        self.offsets[0] + sp_.mem_to_ecs,
                        self.offsets[sp_.cell_tag] + sp_.mem_to_ics,
                    ]).astype(np.int32)
                    self.mem_blocked[m] = dict(
                        bk=bkm.device(dtype),
                        wv=jnp.asarray(
                            bkm.vols_lane / (kf * (kf + 1)), dtype=dtype
                        ),
                        flat_idx=jnp.asarray(flat_idx),
                    )
                # static membrane mass diagonal, flat over the EMI vector
                # (C_phi M_Gamma's diagonal never changes): precomputed so
                # diag() is dense math + one blocked scatter per subdomain
                dmem = np.zeros(self.n)
                C_phi = params.C_phi
                for m, sp_ in geom.membranes.items():
                    k_f = sp_.facet_dofs.shape[1]
                    dv = (
                        2.0 * np.asarray(sp_.areas) * C_phi
                        / (k_f * (k_f + 1))
                    )
                    np.add.at(
                        dmem,
                        self.offsets[sp_.cell_tag] + sp_.facet_idofs,
                        dv[:, None],
                    )
                    np.add.at(
                        dmem, self.offsets[0] + sp_.facet_edofs, dv[:, None]
                    )
                self._mem_diag_flat = jnp.asarray(dmem, dtype=dtype)

    # ------------------------------------------------------------------
    def local_view(self, sub, mem, reduce):
        """Shallow copy whose geometry dicts are (sharded) local arrays and
        whose assembled vectors are combined with `reduce` — used inside
        shard_map (knpemi_tpu.parallel.spmd)."""
        import copy

        new = copy.copy(self)
        new.sub = {
            t: dict(self.sub[t], **sub[t]) for t in self.tags
        }
        new.mem = {
            m: dict(self.mem[m], **mem[m]) for m in self.mem
        }
        new.reduce = reduce
        new.use_pallas = False  # SPMD path shards the XLA kernels
        return new

    # ------------------------------------------------------------------
    def split(self, x: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        return {
            t: x[self.offsets[t] : self.offsets[t] + self.sub[t]["n_dofs"]]
            for t in self.tags
        }

    def flatten(self, d: Dict[int, jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate([d[t] for t in self.tags])

    # ------------------------------------------------------------------
    def kappa(self, c: Dict[int, jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        """Tissue conductance per subdomain, P1 vertex field
        (emiWeakForm.py:84-113): kappa = F*psi*sum_k z_k^2 D_k c_k."""
        F, psi = self.params.F, self.params.psi
        out = {}
        for t in self.tags:
            acc = 0.0
            for k, ion in enumerate(self.ions):
                acc = acc + (ion.z**2) * ion.D[t] * c[t][k]
            out[t] = F * psi * acc
        return out

    # ------------------------------------------------------------------
    def prepare(self, kappa: Dict[int, jnp.ndarray]) -> dict:
        """Per-solve coefficient preparation: for the blocked (Pallas)
        path, gather kappa once and form vols*mean-kappa lane rows so the
        per-iteration kernel gathers only x."""
        ctx = {"kappa": kappa}
        if self.use_pallas:
            from ..ops import pallas_assembly as PA

            ctx["wv"] = {
                t: PA.prepare_emi_weight(
                    kappa[t], self.blocked[t]["bk"], self.blocked[t]["vols"],
                    kbar_ellw=self.blocked[t].get("kbar"),
                    interpret=self.pallas_interpret,
                )
                for t in self.tags
            }
        return ctx

    def matvec_free(self, x: jnp.ndarray, ctx):
        """A @ x without boundary-condition masking.  ``ctx`` is either a
        per-vertex kappa dict or the output of :meth:`prepare`."""
        if not (isinstance(ctx, dict) and "kappa" in ctx):
            ctx = self.prepare(ctx)
        kappa = ctx["kappa"]
        xs = self.split(x)
        ys = {}
        for t in self.tags:
            s = self.sub[t]
            if self.use_pallas:
                from ..ops import pallas_assembly as PA

                blk = self.blocked[t]
                ys[t] = PA.emi_stiffness_blocked(
                    xs[t], ctx["wv"][t], blk["bk"], blk["grads"],
                    interpret=self.pallas_interpret,
                )
            else:
                ys[t] = K.stiffness_apply(
                    s["n_dofs"], xs[t], s["cells"], s["grads"], s["vols"],
                    coef_vertex=kappa[t],
                )
        C_phi = self.params.C_phi
        deferred = []
        for m, sp in self.mem.items():
            if self.use_pallas and m in self.mem_blocked:
                deferred.append(m)  # handled on the flat vector below
                continue
            ct = sp["cell_tag"]
            u_i = xs[ct][sp["facet_idofs"]]
            u_e = xs[0][sp["facet_edofs"]]
            vals = K.facet_mass_values(u_i - u_e, sp["areas"], C_phi)
            ys[ct] = ys[ct].at[sp["facet_idofs"].reshape(-1)].add(vals.reshape(-1))
            ys[0] = ys[0].at[sp["facet_edofs"].reshape(-1)].add(-vals.reshape(-1))
        y = self.flatten(ys)
        for m in deferred:
            from ..ops import pallas_assembly as PA

            mb = self.mem_blocked[m]
            n_m = mb["bk"].n_dofs  # static (pytree aux), not a tracer
            u2 = x[mb["flat_idx"]]  # [R_e x | R_i x]
            w = C_phi * PA.facet_mass_blocked(
                u2[n_m:] - u2[:n_m], mb["bk"], mb["wv"],
                interpret=self.pallas_interpret,
            )
            y = y.at[mb["flat_idx"]].add(jnp.concatenate([-w, w]))
        return self.reduce(y)

    def matvec(self, x: jnp.ndarray, ctx):
        """Operator with symmetric Dirichlet elimination: identity on bc
        dofs, masked A on free dofs (CG-safe)."""
        if not self.has_bc:
            return self.matvec_free(x, ctx)
        xm = x * self.bc_mask
        y = self.matvec_free(xm, ctx)
        return y * self.bc_mask + x * (1.0 - self.bc_mask)

    def diag(self, kappa: Dict[int, jnp.ndarray]) -> jnp.ndarray:
        if self.use_pallas and self._mem_diag_flat is not None:
            return self._diag_blocked(kappa)
        ds = {}
        for t in self.tags:
            s = self.sub[t]
            ds[t] = K.stiffness_diag(
                s["n_dofs"], s["cells"], s["grads"], s["vols"], coef_vertex=kappa[t]
            )
        C_phi = self.params.C_phi
        for m, sp in self.mem.items():
            ct = sp["cell_tag"]
            k_f = sp["facet_dofs"].shape[1]
            dvals = K.facet_mass_diag_values(sp["areas"], k_f, C_phi)
            ds[ct] = ds[ct].at[sp["facet_idofs"].reshape(-1)].add(dvals.reshape(-1))
            ds[0] = ds[0].at[sp["facet_edofs"].reshape(-1)].add(dvals.reshape(-1))
        d = self.reduce(self.flatten(ds))
        if self.has_bc:
            d = d * self.bc_mask + (1.0 - self.bc_mask)
        return d

    def _diag_blocked(self, kappa: Dict[int, jnp.ndarray]) -> jnp.ndarray:
        """Jacobi diagonal on the blocked path: the stiffness diagonal is
        per-slot dense math (wv * |grad_slot|^2) + one blocked scatter per
        subdomain; the static membrane mass diagonal is precomputed flat.
        Replaces a ~70 ms XLA scatter storm at 3-D res 2."""
        from ..ops import pallas_assembly as PA

        ds = {}
        for t in self.tags:
            blk = self.blocked[t]
            bk = blk["bk"]
            wv, rest_w = PA.prepare_emi_weight(
                kappa[t], bk, blk["vols"], kbar_ellw=blk.get("kbar"),
                interpret=self.pallas_interpret,
            )
            # wv and g2 are both (NB, NCH, 1, KC)
            g2 = (blk["grads"] ** 2).sum(axis=2, keepdims=True)
            V = wv * g2
            y = PA.facet_scatter_blocked(
                V, bk, interpret=self.pallas_interpret
            )[0]
            if len(bk.rest_cells):
                rv = jnp.asarray(bk.rest_vols, self.dtype) * rest_w
                rg2 = (jnp.asarray(bk.rest_grads, self.dtype) ** 2).sum(-1)
                y = y + K.scatter_add(
                    bk.n_dofs, jnp.asarray(bk.rest_cells), rv[:, None] * rg2
                )
            ds[t] = y
        d = self.reduce(self.flatten(ds) + self._mem_diag_flat)
        if self.has_bc:
            d = d * self.bc_mask + (1.0 - self.bc_mask)
        return d

    # ------------------------------------------------------------------
    def rhs(
        self,
        c: Dict[int, jnp.ndarray],
        phi_M: Dict[int, jnp.ndarray],
        I_ch: Optional[Dict[int, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Right-hand side (emiWeakForm.py:201-241; MMS variant 244-285).

        c: all-ion concentrations {tag: (N_ions, n)}; phi_M: {membrane tag:
        (n_m,)}; I_ch: {membrane tag: (N_ions, n_m)} channel currents
        (needed only without splitting).
        """
        F, psi, C_phi = self.params.F, self.params.psi, self.params.C_phi
        rs = {}
        for t in self.tags:
            s = self.sub[t]
            # diffusive driving: -sum_k F z_k D_k grad(c_k) . grad(v).
            # D_k is constant per subdomain, so the sum commutes with the
            # gradient: ONE stiffness action of the combined field.
            u_star = jnp.zeros((s["n_dofs"],), dtype=self.dtype)
            for k, ion in enumerate(self.ions):
                u_star = u_star + (F * ion.z * ion.D[t]) * c[t][k]
            # electroneutrality keeps u* nearly uniform: center it so the
            # stiffness acts on the variation, not on f32 roundoff of the
            # large mean (otherwise the f32 RHS is mostly noise and CG
            # stalls chasing it)
            u_star = u_star - u_star.mean()
            if self.use_pallas:
                from ..ops import pallas_assembly as PA

                blk = self.blocked[t]
                nrest = len(blk["bk"].rest_cells)
                unit = (
                    jnp.ones((nrest,), self.dtype) if nrest else None
                )
                r = -PA.emi_stiffness_blocked(
                    u_star, (blk["vols"], unit), blk["bk"], blk["grads"],
                    interpret=self.pallas_interpret,
                )
            else:
                r = -K.stiffness_apply(
                    s["n_dofs"], u_star, s["cells"], s["grads"], s["vols"]
                )
            rs[t] = r

        mem_flat = []
        if self.mms is None:
            for m, sp in self.mem.items():
                ct = sp["cell_tag"]
                g = phi_M[m]
                if not self.splitting_scheme:
                    g = g - (1.0 / C_phi) * I_ch[m].sum(axis=0)
                if self.use_pallas and m in self.mem_blocked:
                    mem_flat.append((m, g))  # flat-level add below
                    continue
                gf = g[sp["facet_dofs"]]
                vals = K.facet_mass_values(gf, sp["areas"], C_phi)
                rs[ct] = rs[ct].at[sp["facet_idofs"].reshape(-1)].add(vals.reshape(-1))
                rs[0] = rs[0].at[sp["facet_edofs"].reshape(-1)].add(-vals.reshape(-1))
        else:
            mm = self.mms
            cb = jnp.asarray(mm.cell_bary)
            cw = jnp.asarray(mm.cell_qw)
            for t, fq in mm.f_phi_q.items():
                s = self.sub[t]
                rs[t] = rs[t] + K.source_rhs_quad(
                    s["n_dofs"], jnp.asarray(fq), s["cells"], s["vols"], cb, cw
                )
            fb = jnp.asarray(mm.facet_bary)
            fw = jnp.asarray(mm.facet_qw)
            for m, sp in self.mem.items():
                ct = sp["cell_tag"]
                fpm = jnp.asarray(mm.f_phi_m_q[m])
                rs[ct] = rs[ct] + K.facet_rhs_quad(
                    self.sub[ct]["n_dofs"], C_phi * fpm, sp["facet_idofs"],
                    sp["areas"], fb, fw,
                )
                rs[0] = rs[0] - K.facet_rhs_quad(
                    self.sub[0]["n_dofs"], C_phi * fpm, sp["facet_edofs"],
                    sp["areas"], fb, fw,
                )
                fim = jnp.asarray(mm.f_I_M_q[m])
                rs[0] = rs[0] - K.facet_rhs_quad(
                    self.sub[0]["n_dofs"], fim, sp["facet_edofs"],
                    sp["areas"], fb, fw,
                )
            # exterior Neumann on the ECS (emiWeakForm.py:262)
            for btag, nq in mm.neumann_q.items():
                bs = self.geom.boundaries[btag]
                rs[bs.sub_tag] = rs[bs.sub_tag] + K.facet_rhs_quad(
                    self.sub[bs.sub_tag]["n_dofs"],
                    jnp.asarray(nq),
                    jnp.asarray(bs.facet_dofs),
                    jnp.asarray(bs.areas),
                    fb,
                    fw,
                )

        b = self.flatten(rs)
        for m, g in mem_flat:
            from ..ops import pallas_assembly as PA

            mb = self.mem_blocked[m]
            w = C_phi * PA.facet_mass_blocked(
                g, mb["bk"], mb["wv"], interpret=self.pallas_interpret
            )
            b = b.at[mb["flat_idx"]].add(jnp.concatenate([-w, w]))
        b = self.reduce(b)
        if self.has_bc:
            # symmetric elimination: b_free -= A @ x_bc ; b_bc = g
            kap = self.kappa(c)
            b = self.bc_mask * (b - self.matvec_free(self._bc_vals_flat, kap))
            b = b + self._bc_vals_flat
        return b


def create_functions_emi(geom: DiscreteGeometry, dtype=jnp.float64):
    """Allocate potential arrays {tag: zeros(n_dofs)} and membrane potential
    arrays {membrane tag: zeros(n_mem)} (API parity with
    emiWeakForm.py:54-81)."""
    phi = {t: jnp.zeros((s.n_dofs,), dtype) for t, s in geom.subdomains.items()}
    phi_M = {m: jnp.zeros((sp.n_dofs,), dtype) for m, sp in geom.membranes.items()}
    return phi, phi_M


def emi_system(
    geom: DiscreteGeometry,
    ions: List[Ion],
    params: PhysicalParams,
    splitting_scheme: bool = True,
    mms: Optional[EMIMMSData] = None,
) -> EMISystem:
    return EMISystem(geom, ions, params, splitting_scheme, mms)
