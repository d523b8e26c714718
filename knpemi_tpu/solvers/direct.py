"""Explicit sparse assembly + direct solve (host, scipy).

The reference's small/MMS runs use MUMPS LU through PETSc
(pdeSolver.py:15-21, 88-96).  The TPU framework's production path is
matrix-free Krylov; this module provides the equivalent "exact" direct
path for verification and small problems, and doubles as an independent
check of the matrix-free kernels (``A_csr @ x == matvec(x)`` is asserted
in tests/test_kernels.py).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _coo_accumulate(rows, cols, vals, n):
    return sp.coo_matrix(
        (np.concatenate([v.ravel() for v in vals]),
         (np.concatenate([r.ravel() for r in rows]),
          np.concatenate([c.ravel() for c in cols]))),
        shape=(n, n),
    ).tocsr()


def _stiffness_coo(cells, grads, vols, coef_vertex=None, coef_cell=1.0):
    w = vols * coef_cell
    if coef_vertex is not None:
        w = w * coef_vertex[cells].mean(axis=1)
    Ke = np.einsum("ckd,cld->ckl", grads, grads) * w[:, None, None]
    k = cells.shape[1]
    rows = np.repeat(cells[:, :, None], k, axis=2)
    cols = np.repeat(cells[:, None, :], k, axis=1)
    return rows, cols, Ke


def _mass_coo(cells, vols, scale=1.0):
    k = cells.shape[1]
    denom = k * (k + 1)
    Me = (np.ones((k, k)) + np.eye(k))[None] * (vols * scale)[:, None, None] / denom
    rows = np.repeat(cells[:, :, None], k, axis=2)
    cols = np.repeat(cells[:, None, :], k, axis=1)
    return rows, cols, Me


def _drift_coo(cells, grads, vols, w_cell, coef=1.0):
    k = cells.shape[1]
    wg = np.einsum("cd,ckd->ck", w_cell, grads)  # rows (test i)
    Ke = (coef * vols / k)[:, None, None] * wg[:, :, None] * np.ones((1, 1, k))
    rows = np.repeat(cells[:, :, None], k, axis=2)
    cols = np.repeat(cells[:, None, :], k, axis=1)
    return rows, cols, Ke


def _drift_quad_coo(cells, grads, vols, w_q, bary, qw, coef=1.0):
    # A_ij = coef * vol * sum_q qw_q bary[q,j] (w_q . g_i)
    wg = np.einsum("cqd,ckd->cqk", w_q, grads)  # (nc, nq, k) rows
    Ke = coef * vols[:, None, None] * np.einsum("q,cqi,qj->cij", qw, wg, bary)
    k = cells.shape[1]
    rows = np.repeat(cells[:, :, None], k, axis=2)
    cols = np.repeat(cells[:, None, :], k, axis=1)
    return rows, cols, Ke


def _facet_mass_coo(dofs_row, dofs_col, areas, scale=1.0):
    k = dofs_row.shape[1]
    denom = k * (k + 1)
    Me = (np.ones((k, k)) + np.eye(k))[None] * (areas * scale)[:, None, None] / denom
    rows = np.repeat(dofs_row[:, :, None], k, axis=2)
    cols = np.repeat(dofs_col[:, None, :], k, axis=1)
    return rows, cols, Me


def assemble_emi_csr(system, kappa: dict) -> sp.csr_matrix:
    """Assemble the (unmasked) EMI block matrix on the host."""
    geom = system.geom
    off = system.offsets
    n = system.n
    rows, cols, vals = [], [], []
    for t in system.tags:
        s = geom.subdomains[t]
        r, c, v = _stiffness_coo(
            s.cells, s.grads, s.vols, coef_vertex=np.asarray(kappa[t])
        )
        rows.append(r + off[t])
        cols.append(c + off[t])
        vals.append(v)
    C_phi = system.params.C_phi
    for m, sp_ in geom.membranes.items():
        ct = sp_.cell_tag
        ii = sp_.facet_idofs + off[ct]
        ee = sp_.facet_edofs + off[0]
        for dr, dc, sgn in [(ii, ii, 1.0), (ii, ee, -1.0), (ee, ii, -1.0), (ee, ee, 1.0)]:
            r, c, v = _facet_mass_coo(dr, dc, sp_.areas, C_phi * sgn)
            rows.append(r)
            cols.append(c)
            vals.append(v)
    return _coo_accumulate(rows, cols, vals, n)


def assemble_knp_csr(system, tag: int, ion_idx: int, gradphi_cell=None) -> sp.csr_matrix:
    geom = system.geom
    s = geom.subdomains[tag]
    n = s.n_dofs
    p = system.params
    ion = system.ions[ion_idx]
    D, z = ion.D[tag], ion.z
    rows, cols, vals = [], [], []
    r, c, v = _mass_coo(s.cells, s.vols, 1.0 / p.dt)
    rows.append(r); cols.append(c); vals.append(v)
    r, c, v = _stiffness_coo(s.cells, s.grads, s.vols, coef_cell=D)
    rows.append(r); cols.append(c); vals.append(v)
    if system.mms is not None:
        r, c, v = _drift_quad_coo(
            s.cells, s.grads, s.vols,
            np.asarray(system.mms.gradphi_q[tag]),
            np.asarray(system.mms.cell_bary),
            np.asarray(system.mms.cell_qw),
            coef=z * p.psi * D,
        )
    else:
        r, c, v = _drift_coo(
            s.cells, s.grads, s.vols, np.asarray(gradphi_cell), coef=z * p.psi * D
        )
    rows.append(r); cols.append(c); vals.append(v)
    return _coo_accumulate(rows, cols, vals, n)


def solve_emi_direct(system, c, phi_M, I_ch=None):
    """MUMPS-analog EMI solve: assemble + LU on the host."""
    kappa = {t: np.asarray(v) for t, v in system.kappa(c).items()}
    A = assemble_emi_csr(system, kappa)
    b = np.asarray(system.rhs(c, phi_M, I_ch))
    if system.has_bc:
        mask = np.asarray(system.bc_mask)
        Dm = sp.diags(mask)
        A = Dm @ A @ Dm + sp.diags(1.0 - mask)
        # system.rhs already applied the masked/bc-lifted RHS
    else:
        # pure Neumann: project b onto range(A), pin dof 0, shift to zero mean
        b = b - b.mean()
        A = A.tolil()
        A[0, :] = 0.0
        A[:, 0] = 0.0
        A[0, 0] = 1.0
        A = A.tocsr()
        b = b.copy()
        b[0] = 0.0
    x = spla.spsolve(A.tocsc(), b)
    if not system.has_bc:
        x = x - x.mean()
    return x


def solve_knp_direct(system, c, phi, phi_M, I_ch=None, source_gate=1.0):
    """Direct KNP solve: one LU per (subdomain, ion) block."""
    rhs = system.rhs(c, phi, phi_M, I_ch, source_gate)
    gradphi = None if system.mms is not None else system.gradphi_cells(phi)
    out = {}
    for t in system.tags:
        b = np.asarray(rhs[t])
        X = np.zeros_like(b)
        for k in range(system.n_solved):
            gp = None
            if gradphi is not None:
                g = gradphi[t]
                gp = np.asarray(g["cell"] if isinstance(g, dict) else g)
            A = assemble_knp_csr(system, t, k, gp)
            X[k] = spla.spsolve(A.tocsc(), b[k])
        out[t] = X
    return out
