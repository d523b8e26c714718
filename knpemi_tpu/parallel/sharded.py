"""Dof-sharded domain decomposition: the MPI-parity SPMD mode.

The replicate-dofs mode (knpemi_tpu.parallel.spmd) shards only the
O(cells) work and psums full dof vectors.  This module implements the
TPU analog of the reference's PETSc domain decomposition (SURVEY.md
section 2.3 "MPI" row: partitioned vectors, ghost updates
utils.py:100,254,293):

* every subdomain's Morton-ordered dofs are split into contiguous
  blocks of B per device — per-device dof memory is n/N;
* cells go to the device owning their min dof (cells are already
  sorted by min dof, ops/geometry.py), so a device's cells reference
  only the window [d*B, d*B + B + H) with H = the max Morton spread:
  the halo is a CONTIGUOUS run into the next device(s);
* operator application is: halo-gather x (ceil(H/B) neighbor
  ``ppermute`` hops — the ghost update), local gather->element
  kernel->scatter-add over local cells, then the mirrored backward
  exchange adds the tail partial sums into their owners (PETSc's
  ADD_VALUES ghost reverse);
* membrane coupling terms ride replicated membrane-sized vectors
  (one psum of O(surface) per side) — the bulk never sees a full psum;
* Krylov inner products are local dots + scalar psum;
* the lagged MG preconditioner runs as a DISTRIBUTED V-cycle
  (parallel/sharded_mg.py): every level's banded slabs shard by row
  block (per-device hierarchy memory is n/N), window reads halo via
  two-sided neighbor ppermutes, and only the small coarsest dense
  solve gathers.  ``_GatheredMG`` (all_gather + replicated hierarchy)
  is retained as the fallback for operators the permuted-layout build
  declines.

Modular wrap in the ppermutes needs no boundary cases: padding cells
have zero volume, so wrapped halo values are never read by real cells
and wrapped partial sums are exact zeros.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

AXIS = "cells"


# ---------------------------------------------------------------------------
# host-side partition
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class SubPartition:
    """Per-subdomain dof/cell partition over N devices (host arrays are
    stacked with a leading device axis and sharded by shard_map)."""

    tag: int
    n_dofs: int  # true dof count
    B: int  # owned block per device (n padded to N*B)
    H: int  # halo width (multiple of nothing; window = B + H)
    n_hops: int
    cells: np.ndarray  # (N, Cmax, k) window-local dof ids
    grads: np.ndarray  # (N, Cmax, k, dim)
    vols: np.ndarray  # (N, Cmax)  zero-padded
    fsrc: Optional[np.ndarray] = None  # (N, Cmax, nq, Ns) source at quad pts


def partition_subdomain(sub, n_dev: int, fsrc=None) -> SubPartition:
    n = sub.n_dofs
    B = -(-n // n_dev)
    cells = np.asarray(sub.cells)
    cmin = cells.min(axis=1)
    owner = np.minimum(cmin // B, n_dev - 1)
    spread = int((cells.max(axis=1) - cmin).max()) if len(cells) else 1
    H = min(max(spread, 1), (n_dev - 1) * B)
    n_hops = -(-H // B)
    H = n_hops * B  # whole blocks keep the exchange slicing static
    counts = np.bincount(owner, minlength=n_dev)
    Cmax = int(counts.max())
    k = cells.shape[1]
    dim = sub.grads.shape[-1]
    c_l = np.zeros((n_dev, Cmax, k), np.int32)
    g_l = np.zeros((n_dev, Cmax, k, dim), sub.grads.dtype)
    v_l = np.zeros((n_dev, Cmax), sub.vols.dtype)
    f_l = None
    if fsrc is not None:
        fsrc = np.asarray(fsrc)
        f_l = np.zeros((n_dev,) + (Cmax,) + fsrc.shape[1:], fsrc.dtype)
    for d in range(n_dev):
        ids = np.flatnonzero(owner == d)
        m = len(ids)
        loc = cells[ids] - d * B
        assert loc.min() >= 0 and loc.max() < B + H, (
            f"cell window violation on device {d}"
        )
        c_l[d, :m] = loc
        g_l[d, :m] = sub.grads[ids]
        v_l[d, :m] = sub.vols[ids]
        if f_l is not None:
            f_l[d, :m] = fsrc[ids]
    return SubPartition(
        tag=sub.tag, n_dofs=n, B=B, H=H, n_hops=n_hops,
        cells=c_l, grads=g_l, vols=v_l, fsrc=f_l,
    )


def partition_blocking(part: SubPartition, S: int = 512):
    """Per-device Pallas blockings of the window-local cells, padded to
    UNIFORM static shapes and stacked with a leading device axis (the
    shard_map operand layout).  Returns (arrays dict, static dict) or
    None when any device's blocking fails.

    The blocked one-hot kernels then run per device on the halo'd
    window [0, B+H) exactly as they do single-device on [0, n) — the
    multi-chip compute path keeps the single-chip kernel economics
    instead of falling back to XLA random gathers."""
    from ..ops.pallas_assembly import build_blocking

    N = part.cells.shape[0]
    # drop the zero-volume padding cells (they would all land in block 0
    # and inflate its chunk count); build_blocking re-pads per block
    keep = [np.flatnonzero(part.vols[d] > 0) for d in range(N)]

    def dev_blocking(d, force=None):
        kd = keep[d]
        return build_blocking(
            part.cells[d][kd], part.grads[d][kd], part.vols[d][kd],
            part.B + part.H, S=S, force_spill=force,
        )

    bks = []
    spill = 0
    for d in range(N):
        bk = dev_blocking(d)
        if bk is None or len(bk.rest_cells):
            # outlier cells would need a second (per-device ragged) path;
            # the window is the halo'd block, so spills are rare — fall
            # back entirely rather than complicate the SPMD kernel
            return None
        bks.append(bk)
        spill = max(spill, bk.n_spill)
    bks = [dev_blocking(d, force=spill) for d in range(N)]
    if any(b is None or len(b.rest_cells) for b in bks):
        return None
    NCH = max(b.n_chunks for b in bks)
    b0 = bks[0]

    def pad_nch(a, nch):
        pad = NCH - nch
        if pad == 0:
            return a
        w = [(0, 0)] * a.ndim
        w[1] = (0, pad)
        return np.pad(a, w)

    arrays = dict(
        lidx=np.stack([pad_nch(b.lidx_lane, b.n_chunks) for b in bks]),
        grads=np.stack([pad_nch(b.grads_lane, b.n_chunks) for b in bks]),
        vols=np.stack([pad_nch(b.vols_lane, b.n_chunks) for b in bks]),
        cells_chunk=np.stack(
            [pad_nch(b.cells_chunk, b.n_chunks) for b in bks]
        ),
    )
    static = dict(
        n_dofs=part.B + part.H, S=S, W=b0.W, n_spill=b0.n_spill,
        n_blocks=b0.n_blocks, C=b0.C, n_chunks=NCH, k=b0.k, dim=b0.dim,
    )
    return arrays, static


def local_blocking(arrays_sq: dict, static: dict):
    """Reconstruct a device-local BlockedCells INSIDE shard_map from the
    squeezed sharded arrays (traced) + replicated static metadata."""
    from ..ops.pallas_assembly import BlockedCells

    return BlockedCells(
        rest_cells=np.zeros((0, static["k"]), np.int32),
        rest_grads=np.zeros((0, static["k"], static["dim"]), np.float32),
        rest_vols=np.zeros((0,), np.float32),
        lidx_lane=arrays_sq["lidx"],
        grads_lane=arrays_sq["grads"],
        vols_lane=arrays_sq["vols"],
        cells_chunk=arrays_sq["cells_chunk"],
        **{k: v for k, v in static.items()},
    )


# ---------------------------------------------------------------------------
# device-side halo / membrane primitives (called INSIDE shard_map)
# ---------------------------------------------------------------------------
def _perm(n_dev: int, shift: int):
    return [((d + shift) % n_dev, d) for d in range(n_dev)]


def halo_gather(x_loc: jnp.ndarray, part: SubPartition, n_dev: int):
    """(..., B) owned block -> (..., B+H) window [own | next blocks].
    Leading axes (e.g. the ion batch) ride the same ppermutes — one
    collective per hop regardless of batch size."""
    blocks = [x_loc]
    for h in range(1, part.n_hops + 1):
        blocks.append(
            jax.lax.ppermute(x_loc, AXIS, _perm(n_dev, h))
        )
    return jnp.concatenate(blocks, axis=-1)


def halo_reduce(y_ext: jnp.ndarray, part: SubPartition, n_dev: int):
    """(..., B+H) window partial sums -> (..., B) owned block with the
    tail contributions delivered to their owners and added."""
    B = part.B
    y = y_ext[..., :B]
    for h in range(1, part.n_hops + 1):
        tail = y_ext[..., h * B : (h + 1) * B]
        y = y + jax.lax.ppermute(tail, AXIS, _perm(n_dev, -h))
    return y


def gather_replicated(x_loc: jnp.ndarray, gids: jnp.ndarray, B: int):
    """Values of a sharded dof vector at global ids -> replicated array
    (the trace gather; one O(len(gids)) psum)."""
    d = jax.lax.axis_index(AXIS)
    loc = gids - d * B
    ok = (loc >= 0) & (loc < B)
    vals = jnp.where(ok, x_loc[jnp.clip(loc, 0, B - 1)], 0.0)
    return jax.lax.psum(vals, AXIS)


def scatter_owned(y_loc: jnp.ndarray, gids: jnp.ndarray, vals: jnp.ndarray,
                  B: int):
    """Add replicated per-gid values into the shard that owns each gid."""
    d = jax.lax.axis_index(AXIS)
    loc = gids - d * B
    ok = (loc >= 0) & (loc < B)
    return y_loc.at[jnp.clip(loc, 0, B - 1)].add(
        jnp.where(ok, vals, 0.0)
    )


def pdot(u, v):
    return jax.lax.psum(jnp.vdot(u, v), AXIS)


# ---------------------------------------------------------------------------
# sharded EMI system (duck-types the EMISolver surface)
# ---------------------------------------------------------------------------
class ShardedEMI:
    """EMISystem equivalent over per-device dof blocks.

    Vectors are the LOCAL flat concatenation of per-subdomain owned
    blocks; `dot` must be :func:`pdot`.  Mirrors systems/emi.py
    (weak form emiWeakForm.py:138-241) with halo-exchange assembly.
    """

    def __init__(self, emi_sys, parts: Dict[int, SubPartition],
                 local_parts: Dict[int, dict], mem_arrays: Dict[int, dict],
                 n_dev: int, blk: Optional[dict] = None,
                 interpret: bool = False):
        self.base = emi_sys
        self.parts = parts
        self.local = local_parts  # {tag: {cells, grads, vols}} device-local
        self.mem = mem_arrays  # replicated membrane arrays (+ base's maps)
        self.n_dev = n_dev
        # per-device BlockedCells on the halo'd window (traced lane
        # arrays + static metadata): the single-chip Pallas kernel
        # economics inside shard_map
        self.blk = blk or {}
        self.interpret = interpret
        self.tags = emi_sys.tags
        self.params = emi_sys.params
        self.ions = emi_sys.ions
        self.dtype = emi_sys.dtype
        self.has_bc = False
        self.offsets = {}
        off = 0
        for t in self.tags:
            self.offsets[t] = off
            off += parts[t].B
        self.n_local = off
        n_glob = sum(p.n_dofs for p in parts.values())
        # plain float: a np.float64 scalar would strongly promote the
        # nullvec (and then the whole CG carry) to f64 under x64
        self.nullvec_scale = float(1.0 / np.sqrt(n_glob))

    # -- layout helpers --------------------------------------------------
    def split(self, x):
        return {
            t: x[self.offsets[t] : self.offsets[t] + self.parts[t].B]
            for t in self.tags
        }

    def flatten(self, d):
        return jnp.concatenate([d[t] for t in self.tags])

    def owned_mask(self, tag):
        """(B,) 1.0 on real dofs, 0.0 on block padding."""
        p = self.parts[tag]
        d = jax.lax.axis_index(AXIS)
        gid = d * p.B + jnp.arange(p.B)
        return (gid < p.n_dofs).astype(self.dtype)

    @property
    def nullvec(self):
        parts = [
            self.owned_mask(t) * self.nullvec_scale for t in self.tags
        ]
        return jnp.concatenate(parts)

    # -- physics ----------------------------------------------------------
    def kappa(self, c_loc):
        """c_loc: {tag: (N_ions, B)} sharded concentrations."""
        F, psi = self.params.F, self.params.psi
        out = {}
        for t in self.tags:
            acc = 0.0
            for k, ion in enumerate(self.ions):
                acc = acc + (ion.z**2) * ion.D[t] * c_loc[t][k]
            out[t] = F * psi * acc
        return out

    def prepare(self, kappa):
        """Once-per-solve context: on the blocked path, gather the kappa
        window and form the weighted-vols lane rows so each iteration's
        kernel gathers only x (mirrors systems/emi.py::prepare)."""
        ctx = {"kappa": kappa}
        if self.blk:
            from ..ops import pallas_assembly as PA

            ctx["wv"] = {}
            for t in self.tags:
                p = self.parts[t]
                kap_ext = halo_gather(kappa[t], p, self.n_dev)
                ctx["wv"][t] = PA.prepare_emi_weight(
                    kap_ext, self.blk[t], self.blk[t].vols_lane
                )
        return ctx

    def matvec(self, x, ctx):
        from ..ops import kernels as K

        if not (isinstance(ctx, dict) and "kappa" in ctx):
            ctx = self.prepare(ctx)
        kappa = ctx["kappa"]
        xs = self.split(x)
        ys = {}
        for t in self.tags:
            p = self.parts[t]
            lc = self.local[t]
            x_ext = halo_gather(xs[t], p, self.n_dev)
            if self.blk:
                from ..ops import pallas_assembly as PA

                y_ext = PA.emi_stiffness_blocked(
                    x_ext, ctx["wv"][t], self.blk[t],
                    self.blk[t].grads_lane, interpret=self.interpret,
                )
            else:
                kap_ext = halo_gather(kappa[t], p, self.n_dev)
                y_ext = K.stiffness_apply(
                    p.B + p.H, x_ext, lc["cells"], lc["grads"], lc["vols"],
                    coef_vertex=kap_ext,
                )
            ys[t] = halo_reduce(y_ext, p, self.n_dev)
        self._membrane_terms(xs, ys)
        return self.flatten(ys)

    def _membrane_terms(self, xs, ys, data=None):
        """C_phi (u_i - u_e)(v_i - v_e) dS via replicated membrane-sized
        vectors (emiWeakForm.py:164-165); `data` replaces (u_i - u_e)
        with given per-facet values for the RHS variant."""
        from ..ops import kernels as K

        C_phi = self.params.C_phi
        for m, sp in self.mem.items():
            ct = sp["cell_tag"]
            pe, pi = self.parts[0], self.parts[ct]
            if data is None:
                u_e = gather_replicated(xs[0], sp["mem_to_ecs"], pe.B)
                u_i = gather_replicated(xs[ct], sp["mem_to_ics"], pi.B)
                g = (u_i - u_e)[sp["facet_dofs"]]
            else:
                g = data[m]
            vals = K.facet_mass_values(g, sp["areas"], C_phi)
            s_i = jnp.zeros((sp["n_mem"],), vals.dtype).at[
                sp["facet_dofs"].reshape(-1)
            ].add(vals.reshape(-1))
            ys[ct] = scatter_owned(
                ys[ct], sp["mem_to_ics"], s_i, pi.B
            )
            ys[0] = scatter_owned(
                ys[0], sp["mem_to_ecs"], -s_i, pe.B
            )

    def diag(self, kappa):
        from ..ops import kernels as K

        ds = {}
        for t in self.tags:
            p = self.parts[t]
            lc = self.local[t]
            kap_ext = halo_gather(kappa[t], p, self.n_dev)
            d_ext = K.stiffness_diag(
                p.B + p.H, lc["cells"], lc["grads"], lc["vols"],
                coef_vertex=kap_ext,
            )
            ds[t] = halo_reduce(d_ext, p, self.n_dev)
        C_phi = self.params.C_phi
        for m, sp in self.mem.items():
            ct = sp["cell_tag"]
            k_f = sp["facet_dofs"].shape[1]
            dv = K.facet_mass_diag_values(sp["areas"], k_f, C_phi)
            s = jnp.zeros((sp["n_mem"],), dv.dtype).at[
                sp["facet_dofs"].reshape(-1)
            ].add(dv.reshape(-1))
            ds[ct] = scatter_owned(ds[ct], sp["mem_to_ics"], s,
                                   self.parts[ct].B)
            ds[0] = scatter_owned(ds[0], sp["mem_to_ecs"], s,
                                  self.parts[0].B)
        # padded rows are identity so equilibration stays finite
        for t in self.tags:
            mask = self.owned_mask(t)
            ds[t] = ds[t] * mask + (1.0 - mask)
        return self.flatten(ds)

    def rhs(self, c_loc, phi_M, I_ch=None):
        """c_loc sharded; phi_M/I_ch replicated membrane arrays."""
        from ..ops import kernels as K

        F, C_phi = self.params.F, self.params.C_phi
        rs = {}
        for t in self.tags:
            p = self.parts[t]
            lc = self.local[t]
            u_star = jnp.zeros((p.B,), self.dtype)
            for k, ion in enumerate(self.ions):
                u_star = u_star + (F * ion.z * ion.D[t]) * c_loc[t][k]
            # center u* on the true (global) mean over real dofs
            mask = self.owned_mask(t)
            tot = jax.lax.psum(jnp.vdot(mask, u_star), AXIS)
            u_star = (u_star - tot / p.n_dofs) * mask
            u_ext = halo_gather(u_star, p, self.n_dev)
            r_ext = -K.stiffness_apply(
                p.B + p.H, u_ext, lc["cells"], lc["grads"], lc["vols"]
            )
            rs[t] = halo_reduce(r_ext, p, self.n_dev)
        if not self.base.splitting_scheme and I_ch is not None:
            data = {
                m: (phi_M[m] - (1.0 / C_phi) * I_ch[m].sum(axis=0))[
                    sp["facet_dofs"]
                ]
                for m, sp in self.mem.items()
            }
        else:
            data = {
                m: phi_M[m][sp["facet_dofs"]] for m, sp in self.mem.items()
            }
        self._membrane_terms(None, rs, data=data)
        return self.flatten(rs)


# ---------------------------------------------------------------------------
# sharded KNP system (duck-types the KNPSolver surface)
# ---------------------------------------------------------------------------
class ShardedKNP:
    """KNPSystem equivalent over per-device dof blocks (knpWeakForm.py
    weak form; block-diagonal over (subdomain, ion))."""

    def __init__(self, knp_sys, parts: Dict[int, SubPartition],
                 local_parts: Dict[int, dict], mem_arrays: Dict[int, dict],
                 n_dev: int, blk: Optional[dict] = None,
                 interpret: bool = False):
        self.base = knp_sys
        self.parts = parts
        self.local = local_parts
        self.mem = mem_arrays
        self.n_dev = n_dev
        self.tags = knp_sys.tags
        self.params = knp_sys.params
        self.ions = knp_sys.ions
        self.n_solved = knp_sys.n_solved
        self.dtype = knp_sys.dtype
        self.D = knp_sys.D
        self.D_all = knp_sys.D_all
        self.z_solved = knp_sys.z_solved
        self.z_all = knp_sys.z_all
        # blocked per-device window kernels: turns on the ion-batched
        # GMRES in KNPSolver (all ions through one operator application)
        self.blk = blk or {}
        self.interpret = interpret
        self.use_pallas = bool(blk)
        self.mms = None
        self.splitting_scheme = knp_sys.splitting_scheme
        self.dim = knp_sys.dim

    def owned_mask(self, tag):
        p = self.parts[tag]
        d = jax.lax.axis_index(AXIS)
        gid = d * p.B + jnp.arange(p.B)
        return (gid < p.n_dofs).astype(self.dtype)

    def gradphi_cells(self, phi_loc):
        from ..ops import kernels as K

        out = {}
        for t in self.tags:
            p = self.parts[t]
            lc = self.local[t]
            phi_ext = halo_gather(phi_loc[t], p, self.n_dev)
            ctx = dict(
                cell=K.cell_gradients(phi_ext, lc["cells"], lc["grads"])
            )
            if self.blk:
                from ..ops import pallas_assembly as PA

                ctx["blocked"] = PA.prepare_knp_drift(
                    phi_ext, self.blk[t], self.blk[t].grads_lane
                )
            out[t] = ctx
        return out

    def matvec_batch(self, tag, X, gradphi):
        """All solved ions of one subdomain through ONE blocked kernel
        pass on the halo'd window (mirrors systems/knp.py::matvec_batch);
        X is (N_solved, B) local rows."""
        from ..ops import pallas_assembly as PA

        p = self.parts[tag]
        bk = self.blk[tag]
        X_ext = halo_gather(X, p, self.n_dev)  # (Ns, B+H), shared hops
        Y = PA.knp_apply_blocked_batch(
            X_ext, bk, bk.grads_lane, bk.vols_lane, gradphi["blocked"],
            1.0 / self.params.dt, self.D[tag], self.z_solved,
            self.params.psi, interpret=self.interpret,
        )
        return halo_reduce(Y, p, self.n_dev)

    def matvec_one(self, tag, x, gradphi, D, z):
        from ..ops import kernels as K

        p = self.parts[tag]
        lc = self.local[tag]
        dt, psi = self.params.dt, self.params.psi
        gp = gradphi["cell"] if isinstance(gradphi, dict) else gradphi
        x_ext = halo_gather(x, p, self.n_dev)
        nw = p.B + p.H
        y = K.mass_apply(nw, x_ext, lc["cells"], lc["vols"], 1.0 / dt)
        y += K.stiffness_apply(nw, x_ext, lc["cells"], lc["grads"],
                               lc["vols"], coef_cell=D)
        y += K.drift_apply(nw, x_ext, lc["cells"], lc["grads"], lc["vols"],
                           gp, coef=z * psi * D)
        return halo_reduce(y, p, self.n_dev)

    def diag(self, tag, gradphi):
        from ..ops import kernels as K

        p = self.parts[tag]
        lc = self.local[tag]
        dt, psi = self.params.dt, self.params.psi
        gp = gradphi["cell"] if isinstance(gradphi, dict) else gradphi
        nw = p.B + p.H
        md = halo_reduce(
            K.mass_diag(nw, lc["cells"], lc["vols"], 1.0 / dt), p, self.n_dev
        )
        sd = halo_reduce(
            K.stiffness_diag(nw, lc["cells"], lc["grads"], lc["vols"]),
            p, self.n_dev,
        )
        dd = halo_reduce(
            K.drift_diag(nw, lc["cells"], lc["grads"], lc["vols"], gp),
            p, self.n_dev,
        )
        D = self.D[tag][:, None]
        z = self.z_solved[:, None]
        out = md[None, :] + D * sd[None, :] + z * psi * D * dd[None, :]
        mask = self.owned_mask(tag)
        return out * mask[None, :] + (1.0 - mask)[None, :]

    def _alpha_q(self, tag, c_traces_q):
        Dz2 = self.D_all[tag] * self.z_all**2
        weighted = Dz2[:, None, None] * c_traces_q
        denom = weighted.sum(axis=0)
        return weighted[: self.n_solved] / denom

    def rhs(self, c_loc, phi_loc, phi_M, I_ch=None, source_gate=1.0):
        """c_loc/phi_loc sharded; phi_M/I_ch replicated membrane arrays.
        Robin terms follow knpWeakForm.py:146-216 with replicated
        membrane-sized traces."""
        from ..ops import kernels as K
        from ..ops import quadrature as quad

        p_ = self.params
        dt, F, C_M = p_.dt, p_.F, p_.C_M
        r = {}
        for t in self.tags:
            p = self.parts[t]
            lc = self.local[t]
            nw = p.B + p.H

            def mass_row(x, p=p, lc=lc, nw=nw):
                x_ext = halo_gather(x, p, self.n_dev)
                return halo_reduce(
                    K.mass_apply(nw, x_ext, lc["cells"], lc["vols"],
                                 1.0 / dt),
                    p, self.n_dev,
                )

            r_t = jax.vmap(mass_row)(c_loc[t][: self.n_solved])
            if lc.get("fsrc") is not None:
                cb, cw = quad.cell_rule(self.dim)
                cb = jnp.asarray(cb, self.dtype)
                cw = jnp.asarray(cw, self.dtype)

                def src_row(fq, p=p, lc=lc, nw=nw, cb=cb, cw=cw):
                    return halo_reduce(
                        K.source_rhs_quad(nw, fq, lc["cells"], lc["vols"],
                                          cb, cw),
                        p, self.n_dev,
                    )

                r_t = r_t + source_gate * jax.vmap(src_row)(
                    jnp.moveaxis(lc["fsrc"], -1, 0)
                )
            r[t] = r_t

        fb_np, fw_np = quad.facet_rule(self.dim)
        fb = jnp.asarray(fb_np, self.dtype)
        fw = jnp.asarray(fw_np, self.dtype)
        z = self.z_solved[:, None, None]
        for m, sp in self.mem.items():
            ct = sp["cell_tag"]
            pe, pi = self.parts[0], self.parts[ct]
            # replicated two-sided traces of ALL ions at membrane dofs
            tr_e = jax.vmap(
                lambda row: gather_replicated(row, sp["mem_to_ecs"], pe.B)
            )(c_loc[0])
            tr_i = jax.vmap(
                lambda row: gather_replicated(row, sp["mem_to_ics"], pi.B)
            )(c_loc[ct])
            c_e_q = jnp.einsum("Kfk,qk->Kfq", tr_e[:, sp["facet_dofs"]], fb)
            c_i_q = jnp.einsum("Kfk,qk->Kfq", tr_i[:, sp["facet_dofs"]], fb)
            alpha_e = self._alpha_q(0, c_e_q)
            alpha_i = self._alpha_q(ct, c_i_q)
            C_e = alpha_e * C_M / (F * z * dt)
            C_i = alpha_i * C_M / (F * z * dt)

            phiM_q = K.trace_at_quad(phi_M[m], sp["facet_dofs"], fb)
            phe = gather_replicated(phi_loc[0], sp["mem_to_ecs"], pe.B)
            phi_ = gather_replicated(phi_loc[ct], sp["mem_to_ics"], pi.B)
            dphi_q = K.trace_at_quad(
                phi_, sp["facet_dofs"], fb
            ) - K.trace_at_quad(phe, sp["facet_dofs"], fb)

            Ich = I_ch[m]
            Ich_q = jnp.einsum("Kfk,qk->Kfq", Ich[:, sp["facet_dofs"]], fb)
            Ich_tot_q = Ich_q.sum(axis=0)
            Ich_k_q = Ich_q[: self.n_solved]
            if self.splitting_scheme:
                g_e = (phiM_q[None] - dt / (C_M * alpha_e) * Ich_k_q
                       + (dt / C_M) * Ich_tot_q[None])
                g_i = (phiM_q[None] - dt / (C_M * alpha_i) * Ich_k_q
                       + (dt / C_M) * Ich_tot_q[None])
            else:
                g_e = phiM_q[None] - dt / (C_M * alpha_e) * Ich_k_q
                g_i = phiM_q[None] - dt / (C_M * alpha_i) * Ich_k_q

            nm = sp["n_mem"]

            def facet_to_mem(coeff_q):
                vals = jnp.einsum("fq,q,qk->fk", coeff_q, fw, fb) \
                    * sp["areas"][:, None]
                return jnp.zeros((nm,), vals.dtype).at[
                    sp["facet_dofs"].reshape(-1)
                ].add(vals.reshape(-1))

            s_e = jax.vmap(facet_to_mem)(C_e * (dphi_q[None] - g_e))
            s_i = jax.vmap(facet_to_mem)(C_i * (g_i - dphi_q[None]))
            r[0] = jax.vmap(
                lambda row, srow: scatter_owned(
                    row, sp["mem_to_ecs"], srow, pe.B
                )
            )(r[0], s_e)
            r[ct] = jax.vmap(
                lambda row, srow: scatter_owned(
                    row, sp["mem_to_ics"], srow, pi.B
                )
            )(r[ct], s_i)
        return r


# ---------------------------------------------------------------------------
# replicated-MG wrapper and layout conversion
# ---------------------------------------------------------------------------
class _GatheredMG:
    """Applies a (replicated) DeviceMG built on the GLOBAL dof layout to
    LOCAL sharded vectors: all_gather -> V-cycle -> slice own block.
    Also exposes the hierarchy's lagged fine diagonal re-laid-out to the
    local blocks (solvers read it as the equilibration scale)."""

    def __init__(self, mg, layout, fine_diag_local=None):
        self.mg = mg
        self.layout = layout  # (to_global, to_local) closures
        self.fine_diag = fine_diag_local

    def apply(self, A0, r_loc):
        to_global, to_local = self.layout
        z = self.mg.apply(lambda v: v, to_global(r_loc))
        return to_local(z)

    def apply_batch(self, A0b, R):
        """(B, n_loc) residual rows -> (B, n_loc); the replicated
        hierarchy's own batched V-cycle reads each level slab once."""
        to_global, to_local = self.layout
        Z = self.mg.apply_batch(lambda V: V, to_global(R))
        return to_local(Z)


def make_layout(parts: Dict[int, SubPartition], tags: List[int], n_dev: int):
    """(to_global, to_local) between the local flat concat of owned
    blocks and the true global flat concat of per-subdomain dofs."""
    offs_l = {}
    off = 0
    for t in tags:
        offs_l[t] = off
        off += parts[t].B
    offs_g = {}
    goff = 0
    for t in tags:
        offs_g[t] = goff
        goff += parts[t].n_dofs
    n_glob = goff

    def to_global(x_loc):
        segs = []
        for t in tags:
            p = parts[t]
            xt = jax.lax.dynamic_slice_in_dim(x_loc, offs_l[t], p.B)
            full = jax.lax.all_gather(xt, AXIS, tiled=True)
            segs.append(full[: p.n_dofs])
        return jnp.concatenate(segs)

    def to_local(xg):
        d = jax.lax.axis_index(AXIS)
        segs = []
        for t in tags:
            p = parts[t]
            seg = jax.lax.dynamic_slice_in_dim(xg, offs_g[t], p.n_dofs)
            seg = jnp.pad(seg, (0, n_dev * p.B - p.n_dofs))
            segs.append(jax.lax.dynamic_slice_in_dim(seg, d * p.B, p.B))
        return jnp.concatenate(segs)

    return to_global, to_local, n_glob


def make_tag_layout(part: SubPartition, n_dev: int):
    """Per-subdomain (to_global, to_local) for the KNP hierarchies.
    Both closures act on the LAST axis (leading axes, e.g. the ion
    batch, ride the same collective)."""

    def to_global(x_loc):
        g = jax.lax.all_gather(x_loc, AXIS, tiled=True, axis=x_loc.ndim - 1)
        return g[..., : part.n_dofs]

    def to_local(xg):
        d = jax.lax.axis_index(AXIS)
        pad = [(0, 0)] * (xg.ndim - 1) + [(0, n_dev * part.B - part.n_dofs)]
        seg = jnp.pad(xg, pad)
        return jax.lax.dynamic_slice_in_dim(
            seg, d * part.B, part.B, axis=-1
        )

    return to_global, to_local


# ---------------------------------------------------------------------------
# the sharded simulation driver
# ---------------------------------------------------------------------------
class ShardedSimulation:
    """Runs a Simulation's step with dof-sharded domain decomposition
    under shard_map.  State dof arrays are stored PADDED-GLOBAL and
    sharded along the dof axis (per-device memory n/N + halo);
    membrane-sized arrays (phi_M, ODE state) stay replicated."""

    def __init__(self, sim, devices=None, distributed_mg: bool = True):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        if devices is None:
            devices = jax.devices()
        self.sim = sim
        self.n_dev = len(devices)
        self.mesh = Mesh(np.array(devices), (AXIS,))
        n = self.n_dev

        self.parts: Dict[int, SubPartition] = {}
        for t, sub in sim.geom.subdomains.items():
            fsrc = sim.knp_sys.fsrc.get(t)
            self.parts[t] = partition_subdomain(
                sub, n, fsrc=None if fsrc is None else np.asarray(fsrc)
            )
        self.tags = sim.geom.sub_tags

        # device-stacked local cell arrays (sharded on axis 0); float
        # fields take the sim dtype so f32 runs don't promote through the
        # host-f64 partition arrays
        def _conv(k, a):
            return jnp.asarray(
                a, dtype=None if k == "cells" else sim.dtype
            )

        self.local_arrays = {
            t: {
                k: _conv(k, getattr(p, k))
                for k in ("cells", "grads", "vols")
                if getattr(p, k) is not None
            } | (
                {"fsrc": jnp.asarray(p.fsrc, dtype=sim.dtype)}
                if p.fsrc is not None else {}
            )
            for t, p in self.parts.items()
        }
        # per-device Pallas blockings of the halo'd windows: the blocked
        # one-hot kernels run inside shard_map with single-chip economics
        # instead of the XLA gather fallback (lane arrays ride
        # local_arrays as sharded operands; statics stay closure-side)
        self.blk_static = None
        self._spmd_interpret = getattr(
            sim.emi_sys, "pallas_interpret",
            devices[0].platform != "tpu",
        )
        if getattr(sim, "_use_pallas", False):
            blks = {t: partition_blocking(self.parts[t]) for t in self.tags}
            if all(b is not None for b in blks.values()):
                self.blk_static = {}
                for t, (arrays, static) in blks.items():
                    self.blk_static[t] = static
                    la = self.local_arrays[t]
                    la["blk_lidx"] = jnp.asarray(arrays["lidx"])
                    la["blk_grads"] = jnp.asarray(
                        arrays["grads"], dtype=sim.dtype
                    )
                    la["blk_vols"] = jnp.asarray(
                        arrays["vols"], dtype=sim.dtype
                    )
                    la["blk_cells"] = jnp.asarray(arrays["cells_chunk"])
            else:
                from ..utils.logging import warn

                warn(
                    "sharded Pallas blocking unavailable (window spill); "
                    "using the XLA kernels"
                )
        # replicated membrane arrays (static ints kept OUT of the pytree
        # so shard_map does not turn shapes into tracers)
        self.mem_arrays = {
            m: dict(
                facet_dofs=jnp.asarray(sp.facet_dofs),
                areas=jnp.asarray(sp.areas, sim.dtype),
                mem_to_ecs=jnp.asarray(sp.mem_to_ecs),
                mem_to_ics=jnp.asarray(sp.mem_to_ics),
            )
            for m, sp in sim.geom.membranes.items()
        }
        self.mem_static = {
            m: dict(cell_tag=sp.cell_tag, n_mem=sp.n_dofs)
            for m, sp in sim.geom.membranes.items()
        }
        self.ode_pad = {
            m: (-mm.n_dofs) % n for m, mm in sim.mem_models.items()
        }

        local_specs = jax.tree.map(
            lambda x: P(AXIS, *([None] * (x.ndim - 1))), self.local_arrays
        )
        mem_specs = jax.tree.map(lambda x: P(), self.mem_arrays)

        def state_spec(s):
            c = {t: P(None, AXIS) for t in s.c}
            phi = {t: P(AXIS) for t in s.phi}
            rep = jax.tree.map(
                lambda x: P(), (s.phi_M, s.ode_states, s.ode_params)
            )
            from knpemi_tpu.systems.types import SimState

            return SimState(
                c=c, phi=phi, phi_M=rep[0], ode_states=rep[1],
                ode_params=rep[2], t=P(), step=P(), emi_iters=P(),
                knp_iters=P(), emi_ok=P(), knp_ok=P(), emi_res=P(),
                knp_res=P(),
            )

        # distributed V-cycle (parallel/sharded_mg.py): per-device slab
        # memory n/N, neighbor-hop windows — replaces the replicated
        # _GatheredMG (all_gather per application) when available
        self.emi_smg = None
        self.emi_smg_meta = None
        self._emi_L = None
        self.knp_smg = None
        self.knp_smg_meta = {}
        self._knp_L = {}
        # the Pallas window kernel inside the sharded V-cycle (TPU only;
        # the XLA window-gather path serves the virtual CPU mesh)
        self._smg_pallas = (
            getattr(sim, "_use_pallas", False)
            and jax.devices()[0].platform == "tpu"
        )
        if distributed_mg and not sim.opts.direct:
            try:
                self._build_distributed_mg()
            except ValueError as e:
                from ..utils.logging import warn

                warn(
                    f"distributed V-cycle unavailable ({e}); using the "
                    "replicated hierarchy"
                )
                self.emi_smg = self.knp_smg = None

        s0 = self.init_state()
        sspec = state_spec(s0)
        from jax.sharding import NamedSharding

        self._state_shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec), sspec,
            is_leaf=lambda x: isinstance(x, P),
        )
        from .sharded_mg import smg_specs

        emi_smg_spec = P() if self.emi_smg is None else smg_specs(self.emi_smg)
        knp_smg_spec = (
            P() if self.knp_smg is None
            else {t: smg_specs(d) for t, d in self.knp_smg.items()}
        )
        # P() as a PREFIX spec for the whole DeviceMG subtrees (tree.map
        # over the custom pytree would misroute specs into its static aux)
        self._step_smapped = shard_map(
            self._step_body,
            mesh=self.mesh,
            in_specs=(sspec, local_specs, mem_specs, P(), P(),
                      emi_smg_spec, knp_smg_spec),
            out_specs=sspec,
            check_vma=False,
        )
        self._step_sharded = jax.jit(self._step_smapped)
        self._chunk_jit = {}

    # -- distributed hierarchy construction --------------------------------
    def _build_distributed_mg(self):
        """Build EMI/KNP hierarchies on the PERMUTED operators whose row
        order is the sharded local layout, then shard their banded
        layouts by row block (parallel/sharded_mg.py docstring)."""
        import scipy.sparse as sp

        from ..solvers import direct as direct_mod
        from ..solvers.mg import build_hierarchy_cached
        from ..systems.coupling import set_initial_conditions
        from .sharded_mg import (
            local_layout_gids, permute_operator, rcm_block_perm,
            shard_hierarchy,
        )

        sim = self.sim
        n = self.n_dev
        opts = sim.opts

        def build(A0, gids, L256):
            A_perm = permute_operator(A0, gids)
            d = A_perm.diagonal()
            d = np.where(d != 0, d, 1.0)
            # the hierarchy lives in a per-device RCM order (narrow
            # banded windows); the solver-facing fine_diag stays in the
            # solver layout — ShardedMG permutes residuals in/out
            perm = rcm_block_perm(A_perm, n, L256)
            A_mg = A_perm[perm][:, perm].tocsr()
            dm = d[perm]
            s = 1.0 / np.sqrt(np.abs(dm))
            A_hat = (sp.diags(s) @ A_mg @ sp.diags(s)).tocsr()
            hier = build_hierarchy_cached(
                A_hat, B=1.0 / s, theta=opts.mg_theta,
                coarse_max=opts.mg_coarse_max, nu=opts.mg_nu, banded=True,
                smoother=sim._smoother_for(A_hat.shape[0]),
                degree=opts.mg_degree,
                slab_dtype=(
                    np.float32 if sim.dtype == jnp.float32 else np.float64
                ),
                # shard_hierarchy slices the GLOBAL banded layout into
                # per-device row blocks (slab memory lands n/N per
                # device), so the single-chip slab budget does not
                # apply here: keep banding up to the old 4 GB global
                # bound rather than falling into windowed-ELL, which
                # the distributed V-cycle does not shard (yet)
                band_cap=4096 << 20, tband_cap=2048 << 20,
            )
            data, meta = shard_hierarchy(hier, n, sim.dtype)
            data["fine_diag"] = jnp.asarray(
                d.reshape(n, L256), sim.dtype
            )
            lperm = (
                perm.reshape(n, L256) - (np.arange(n) * L256)[:, None]
            ).astype(np.int32)
            data["perm"] = jnp.asarray(lperm)
            data["iperm"] = jnp.asarray(
                np.argsort(lperm, axis=1).astype(np.int32)
            )
            return data, meta

        if opts.emi_precond == "mg":
            c0 = set_initial_conditions(sim.geom, sim.ions, dtype=jnp.float64)
            kappa = {
                t: np.asarray(v) for t, v in sim.emi_sys.kappa(c0).items()
            }
            A0 = direct_mod.assemble_emi_csr(sim.emi_sys, kappa)
            gids, L256, L = local_layout_gids(self.parts, self.tags, n)
            self.emi_smg, self.emi_smg_meta = build(A0, gids, L256)
            self._emi_L = L

        from ..solvers.direct import _mass_coo, _stiffness_coo, _coo_accumulate

        knp = {}
        for t in self.tags:
            sub = sim.geom.subdomains[t]
            Dbar = float(np.mean([ion.D[t] for ion in sim.ions[:-1]]))
            r1, c1, v1 = _mass_coo(sub.cells, sub.vols, 1.0 / sim.params.dt)
            r2, c2, v2 = _stiffness_coo(sub.cells, sub.grads, sub.vols,
                                        coef_cell=Dbar)
            A0 = _coo_accumulate([r1, r2], [c1, c2], [v1, v2], sub.n_dofs)
            gids, L256, L = local_layout_gids(
                {t: self.parts[t]}, [t], n
            )
            knp[t] = build(A0, gids, L256)
            self._knp_L[t] = L
        self.knp_smg = {t: d for t, (d, m) in knp.items()}
        self.knp_smg_meta = {t: m for t, (d, m) in knp.items()}

    # -- state layout ------------------------------------------------------
    def init_state(self):
        return self.pad_state(self.sim.init_state())

    def pad_state(self, s):
        """Global SimState -> padded-global dof arrays (N*B per tag),
        placed with the step's OUTPUT shardings: otherwise the chunk's
        first call compiles for unsharded inputs, its output comes back
        mesh-sharded, and the SECOND call recompiles the whole step —
        ~50 s through the remote-TPU tunnel at res 1, misread as an
        83x per-step overhead until per-call timing isolated it."""
        c = {
            t: jnp.pad(
                s.c[t],
                ((0, 0), (0, self.n_dev * self.parts[t].B - self.parts[t].n_dofs)),
            )
            for t in s.c
        }
        phi = {
            t: jnp.pad(
                s.phi[t],
                (0, self.n_dev * self.parts[t].B - self.parts[t].n_dofs),
            )
            for t in s.phi
        }
        out = s._replace(c=c, phi=phi)
        if getattr(self, "_state_shardings", None) is not None:
            out = jax.device_put(out, self._state_shardings)
        return out

    def unpad_state(self, s):
        c = {t: s.c[t][:, : self.parts[t].n_dofs] for t in s.c}
        phi = {t: s.phi[t][: self.parts[t].n_dofs] for t in s.phi}
        return s._replace(c=c, phi=phi)

    # -- the sharded step ---------------------------------------------------
    def _step_body(self, state, local_arrays, mem_arrays, emi_mg, knp_mg,
                   emi_smg, knp_smg):
        from ..solvers.api import EMISolver, KNPSolver
        from ..systems.coupling import eliminated_concentration
        from knpemi_tpu.systems.types import SimState

        sim = self.sim
        p = sim.params
        dt = p.dt
        n = self.n_dev
        first = state.step == 0
        # inside shard_map the state dof arrays arrive as LOCAL blocks
        c_loc = state.c
        phi_loc = state.phi

        # shard_map delivers local shards with the size-1 device axis kept
        local_sq = jax.tree.map(lambda x: x[0], local_arrays)
        blk = None
        if self.blk_static is not None:
            blk = {
                t: local_blocking(
                    dict(
                        lidx=local_sq[t]["blk_lidx"],
                        grads=local_sq[t]["blk_grads"],
                        vols=local_sq[t]["blk_vols"],
                        cells_chunk=local_sq[t]["blk_cells"],
                    ),
                    self.blk_static[t],
                )
                for t in self.tags
            }
        esys = ShardedEMI(sim.emi_sys, self.parts, local_sq,
                          self._mem_with_static(mem_arrays), n,
                          blk=blk, interpret=self._spmd_interpret)
        ksys = ShardedKNP(sim.knp_sys, self.parts, local_sq,
                          self._mem_with_static(mem_arrays), n,
                          blk=blk, interpret=self._spmd_interpret)

        layout = make_layout(self.parts, self.tags, n)
        to_g, to_l = layout[0], layout[1]
        emi_mg_w = None
        if emi_smg is not None:
            from .sharded_mg import ShardedMG, squeeze_smg

            dsq = squeeze_smg(emi_smg)
            emi_mg_w = ShardedMG(
                dsq, self.emi_smg_meta, n,
                fine_diag=dsq["fine_diag"][: self._emi_L],
                solver_len=self._emi_L, use_pallas=self._smg_pallas,
            )
        elif emi_mg is not None:
            fd = getattr(emi_mg, "fine_diag", None)
            fd_loc = None if fd is None else to_l(fd)
            if fd_loc is not None:
                # padding rows: unit scale
                mask = jnp.concatenate(
                    [esys.owned_mask(t) for t in self.tags]
                )
                fd_loc = fd_loc * mask + (1.0 - mask)
            emi_mg_w = _GatheredMG(emi_mg, (to_g, to_l), fd_loc)
        knp_mg_w = {}
        if knp_smg is not None:
            from .sharded_mg import ShardedMG, squeeze_smg

            for t, smg_t in knp_smg.items():
                dsq = squeeze_smg(smg_t)
                knp_mg_w[t] = ShardedMG(
                    dsq, self.knp_smg_meta[t], n,
                    fine_diag=dsq["fine_diag"][: self._knp_L[t]],
                    solver_len=self._knp_L[t], use_pallas=self._smg_pallas,
                )
        else:
            for t in self.tags:
                mg_t = (knp_mg or {}).get(t)
                if mg_t is None:
                    continue
                tg, tl = make_tag_layout(self.parts[t], n)
                fd = getattr(mg_t, "fine_diag", None)
                fd_loc = None if fd is None else tl(fd)
                if fd_loc is not None:
                    mask = ksys.owned_mask(t)
                    fd_loc = fd_loc * mask + (1.0 - mask)
                knp_mg_w[t] = _GatheredMG(mg_t, (tg, tl), fd_loc)

        comp = sim.opts.compensated_dots
        if comp is None:
            comp = sim.dtype == jnp.float32
        if comp:
            from ..solvers.precision import make_pbdot2, make_pdot2

            dot_fn = make_pdot2(AXIS)
            bdot_fn = make_pbdot2(AXIS)
        else:
            from ..solvers.precision import make_pbdot

            dot_fn = pdot
            bdot_fn = make_pbdot(AXIS)
        emi_solver = EMISolver(
            esys, rtol=sim.opts.rtol_emi, atol=sim.opts.atol_emi,
            maxiter=sim.opts.maxiter, dot=dot_fn, mg=emi_mg_w,
        )
        knp_solver = KNPSolver(
            ksys, rtol=sim.opts.rtol_knp, atol=sim.opts.atol_knp,
            maxiter=sim.opts.maxiter, restart=sim.opts.restart,
            dot=dot_fn, bdot=bdot_fn, mg=knp_mg_w,
        )

        # [1] membrane ODEs: replicated traces, dof rows sharded over mesh
        idx = jax.lax.axis_index(AXIS)
        phi_M_new = dict(state.phi_M)
        ode_states = dict(state.ode_states)
        ode_params = dict(state.ode_params)
        I_ch: Dict[int, jnp.ndarray] = {}
        for m, mm in sim.mem_models.items():
            sp = mem_arrays[m]
            ct = sim.geom.membranes[m].cell_tag
            pe, pi = self.parts[0], self.parts[ct]
            prms, sts = state.ode_params[m], state.ode_states[m]
            for k, ion in enumerate(sim.ions):
                if f"{ion.name}_e" in mm._pidx:
                    tr_e = gather_replicated(
                        c_loc[0][k], sp["mem_to_ecs"], pe.B
                    )
                    tr_i = gather_replicated(
                        c_loc[ct][k], sp["mem_to_ics"], pi.B
                    )
                    prms = mm.set_param(prms, f"{ion.name}_e", tr_e)
                    prms = mm.set_param(prms, f"{ion.name}_i", tr_i)
            v_idx = mm.state_index("V")
            sts = sts.at[:, v_idx].set(
                jnp.where(first, sts[:, v_idx], state.phi_M[m])
            )
            nm = mm.n_dofs
            pad = self.ode_pad[m]
            blk = (nm + pad) // n
            sts_p = (
                jnp.concatenate([sts, sts[:1].repeat(pad, 0)], 0)
                if pad else sts
            )
            prms_p = (
                jnp.concatenate([prms, prms[:1].repeat(pad, 0)], 0)
                if pad else prms
            )
            lo = idx * blk
            sts_loc = jax.lax.dynamic_slice_in_dim(sts_p, lo, blk, 0)
            prms_loc = jax.lax.dynamic_slice_in_dim(prms_p, lo, blk, 0)
            sts_loc = mm.step(sts_loc, prms_loc, state.t, dt)
            sts_new = jax.lax.all_gather(sts_loc, AXIS, tiled=True)[:nm]
            ode_states[m] = sts_new
            ode_params[m] = prms
            phi_M_new[m] = mm.get_membrane_potential(sts_new)
            cur = mm.currents(sts_new, prms, state.t + dt)
            I_ch[m] = jnp.stack([cur[ion.name] for ion in sim.ions])

        # [2] EMI solve (sharded CG)
        phi_new, emi_info = emi_solver.solve(
            c_loc, phi_M_new, I_ch, x0=phi_loc
        )

        # [3] KNP solve (sharded GMRES per (tag, ion))
        c_solved, knp_info = knp_solver.solve(
            c_loc, phi_new, phi_M_new, I_ch,
            source_gate=sim.source_gate(state.t), x0=c_loc,
        )

        # [4] algebraic refresh: eliminated ion (pointwise, local) and
        # phi_M from PDE traces (replicated gathers)
        zs = np.array([ion.z for ion in sim.ions[:-1]])
        z_elim = sim.ions[-1].z
        c_new = {}
        for t in self.tags:
            rho = p.rho.get(t, 0.0)
            c_el = eliminated_concentration(
                c_solved[t], zs, z_elim, p.rho_z, rho
            )
            c_new[t] = jnp.concatenate([c_solved[t], c_el[None, :]], axis=0)
        phi_M_pde = {}
        for m, sp in mem_arrays.items():
            ct = sim.geom.membranes[m].cell_tag
            tr_e = gather_replicated(
                phi_new[0], sp["mem_to_ecs"], self.parts[0].B
            )
            tr_i = gather_replicated(
                phi_new[ct], sp["mem_to_ics"], self.parts[ct].B
            )
            phi_M_pde[m] = tr_i - tr_e

        return SimState(
            c=c_new, phi=phi_new, phi_M=phi_M_pde,
            ode_states=ode_states, ode_params=ode_params,
            t=state.t + dt, step=state.step + 1,
            emi_iters=emi_info.iters, knp_iters=knp_info.iters,
            emi_ok=emi_info.converged, knp_ok=knp_info.converged,
            emi_res=emi_info.resnorm, knp_res=knp_info.resnorm,
        )

    def _mem_with_static(self, mem_arrays):
        """Re-attach the static fields kept out of the shard_map pytree."""
        return {
            m: dict(d, **self.mem_static[m]) for m, d in mem_arrays.items()
        }

    # -- public API ----------------------------------------------------------
    def _mg_args(self):
        """(emi_mg, knp_mg, emi_smg, knp_smg): the replicated hierarchies
        are not shipped when the distributed ones are active."""
        emi_mg = None if self.emi_smg is not None else self.sim.emi_solver.mg
        knp_mg = None if self.knp_smg is not None else self.sim.knp_solver.mg
        return emi_mg, knp_mg, self.emi_smg, self.knp_smg

    def step(self, state):
        return self._step_sharded(
            state, self.local_arrays, self.mem_arrays, *self._mg_args()
        )

    def _chunk(self, n: int):
        """Jitted scan over n sharded steps (mirrors Simulation._chunk):
        the MG hierarchies travel as jit ARGUMENTS, and the host syncs
        once per chunk instead of once per step (each device->host pull
        costs a full tunnel roundtrip, ~100 ms on the remote-TPU setup —
        the per-step ``int(state.emi_iters)`` loop reintroduced exactly
        the pathology Simulation.run had already eliminated)."""
        if n not in self._chunk_jit:

            def chunk(s, la, ma, emi_mg, knp_mg, emi_smg, knp_smg):
                def body(ss, _):
                    s2 = self._step_smapped(ss, la, ma, emi_mg, knp_mg,
                                            emi_smg, knp_smg)
                    return s2, (s2.emi_iters, s2.knp_iters,
                                s2.emi_ok & s2.knp_ok)

                return jax.lax.scan(body, s, None, length=n)

            self._chunk_jit[n] = jax.jit(chunk)
        jitted = self._chunk_jit[n]
        return lambda s: jitted(
            s, self.local_arrays, self.mem_arrays, *self._mg_args()
        )

    def run(self, state, n_steps, observer=None, save_every=None,
            verbose: bool = False):
        """Advance n_steps in scan chunks with fail-fast health checks
        (reference parity: ksp_error_if_not_converged) — the sharded
        analog of Simulation.run."""
        chunk_n = save_every or n_steps
        chunk = self._chunk(chunk_n)
        it_e, it_k = [], []
        done = 0
        while done < n_steps:
            n = min(chunk_n, n_steps - done)
            if n != chunk_n:
                chunk = self._chunk(n)
            t0 = time.perf_counter()
            state, (ce, ck, ok) = chunk(state)
            if observer is not None:
                host_state, ce, ck, ok = jax.device_get(
                    (self.unpad_state(state), ce, ck, ok)
                )
            else:
                host_state = None
                ce, ck, ok = jax.device_get((ce, ck, ok))
            if verbose:
                dt_wall = time.perf_counter() - t0
                print(
                    f"  steps {done + 1}..{done + n}: "
                    f"{dt_wall / n * 1e3:.2f} ms/step, "
                    f"emi_it={int(ce[-1])} knp_it={int(ck[-1])}"
                )
            it_e.append(np.asarray(ce))
            it_k.append(np.asarray(ck))
            done += n
            # Simulation's fail-fast check (raise/warn per opts)
            self.sim._check_health(state, np.asarray(ok), done - n)
            if observer:
                observer(host_state)
        return state, np.concatenate(it_e), np.concatenate(it_k)
