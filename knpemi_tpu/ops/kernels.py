"""Batched P1 element kernels (device side, JAX).

Hand-derived element kernels for the fixed KNP-EMI weak forms — the
TPU-native replacement for UFL/FFCx codegen + dolfinx assembly
(reference emiWeakForm.py:138-241, knpWeakForm.py:123-216).  Every kernel
is a pure function over flat jnp arrays:

    gather cell/facet dofs  ->  batched closed-form element op  ->
    scatter-add (XLA scatter)

All forms are P1-exact:

* stiffness with a P1 coefficient ``kappa``:  since grad(u), grad(v) are
  cellwise constant and kappa is linear, the integral is
  ``mean(kappa_vertices) * vol * (g_i . g_j)`` exactly,
* mass:  ``vol * (1 + delta_ij) / ((d+1)(d+2))``,
* drift ``coef * u * (w . grad v)`` with cellwise-constant vector w:
  ``coef * (w . g_i) * vol / (d+1)`` (independent of the trial index j),
* interface facet mass (d_f-simplex): ``area * (1 + delta_ab) /
  ((d_f+1)(d_f+2))``.

Nonlinear facet coefficients (the alpha-weighted KNP Robin data,
knpWeakForm.py:178-214) are integrated by quadrature: coefficients are
evaluated at facet quadrature points from P1 traces and contracted with
the barycentric basis values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# scatter helper
# ---------------------------------------------------------------------------
def scatter_add(n_dofs: int, idx: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Accumulate (..., k) values into a length-n vector at (..., k) indices."""
    out = jnp.zeros((n_dofs,), dtype=vals.dtype)
    return out.at[idx.reshape(-1)].add(vals.reshape(-1))


# ---------------------------------------------------------------------------
# volume kernels
# ---------------------------------------------------------------------------
def cell_gradients(x: jnp.ndarray, cells: jnp.ndarray, grads: jnp.ndarray):
    """Cellwise-constant gradient of a P1 field: (n_cells, dim)."""
    xe = x[cells]  # (nc, k)
    return jnp.einsum("ck,ckd->cd", xe, grads)


def stiffness_cell_values(
    x: jnp.ndarray,
    cells: jnp.ndarray,
    grads: jnp.ndarray,
    vols: jnp.ndarray,
    coef_vertex: jnp.ndarray | None = None,
    coef_cell: jnp.ndarray | float = 1.0,
):
    """Per-cell test-function values of ``integral coef * grad(x) . grad(v)``.

    Returns (n_cells, k); callers scatter-add into the dof vector.
    """
    gx = cell_gradients(x, cells, grads)  # (nc, dim)
    w = vols * coef_cell
    if coef_vertex is not None:
        w = w * coef_vertex[cells].mean(axis=1)
    return jnp.einsum("cd,ckd->ck", gx, grads) * w[:, None]


def stiffness_apply(n_dofs, x, cells, grads, vols, coef_vertex=None, coef_cell=1.0):
    vals = stiffness_cell_values(x, cells, grads, vols, coef_vertex, coef_cell)
    return scatter_add(n_dofs, cells, vals)


def stiffness_diag(n_dofs, cells, grads, vols, coef_vertex=None, coef_cell=1.0):
    w = vols * coef_cell
    if coef_vertex is not None:
        w = w * coef_vertex[cells].mean(axis=1)
    d = jnp.einsum("ckd,ckd->ck", grads, grads) * w[:, None]
    return scatter_add(n_dofs, cells, d)


def mass_cell_values(x, cells, vols, scale=1.0):
    """Per-cell values of ``integral scale * x * v`` (P1 consistent mass)."""
    k = cells.shape[1]
    denom = k * (k + 1)  # (d+1)(d+2)
    xe = x[cells]
    s = xe.sum(axis=1, keepdims=True)
    return (vols * scale)[..., None] * (s + xe) / denom


def mass_apply(n_dofs, x, cells, vols, scale=1.0):
    return scatter_add(n_dofs, cells, mass_cell_values(x, cells, vols, scale))


def mass_diag(n_dofs, cells, vols, scale=1.0):
    k = cells.shape[1]
    denom = k * (k + 1)
    d = jnp.broadcast_to(
        (2.0 * vols * scale / denom)[:, None], cells.shape
    )
    return scatter_add(n_dofs, cells, d)


def drift_cell_values(x, cells, grads, vols, w_cell, coef=1.0):
    """Per-cell values of ``integral coef * x * (w . grad v)`` with
    cellwise-constant vector field w (e.g. w = z*psi*D*grad(phi),
    knpWeakForm.py:141)."""
    k = cells.shape[1]
    xbar = x[cells].sum(axis=1) / k  # mean -> integral of x = vol * mean
    wg = jnp.einsum("cd,ckd->ck", w_cell, grads)  # (nc, k): w . g_i
    return (coef * vols * xbar)[:, None] * wg


def drift_apply(n_dofs, x, cells, grads, vols, w_cell, coef=1.0):
    return scatter_add(
        n_dofs, cells, drift_cell_values(x, cells, grads, vols, w_cell, coef)
    )


def drift_diag(n_dofs, cells, grads, vols, w_cell, coef=1.0):
    k = cells.shape[1]
    wg = jnp.einsum("cd,ckd->ck", w_cell, grads)
    d = (coef * vols / k)[:, None] * wg
    return scatter_add(n_dofs, cells, d)


def drift_cell_values_quad(x, cells, grads, vols, w_q, bary, qw, coef=1.0):
    """Quadrature variant of :func:`drift_cell_values` for a smooth (non-P0)
    vector field w given at cell quadrature points (used by the MMS tests
    where the drift uses the *exact* potential, run_mms.py:444 in the
    reference):  y_i = coef * vol * sum_q qw_q x(q) (w_q . g_i)."""
    xq = jnp.einsum("ck,qk->cq", x[cells], bary)
    wg = jnp.einsum("cqd,ckd->cqk", w_q, grads)
    vals = jnp.einsum("cq,q,cqk->ck", xq, qw, wg)
    return coef * vols[:, None] * vals


def drift_apply_quad(n_dofs, x, cells, grads, vols, w_q, bary, qw, coef=1.0):
    return scatter_add(
        n_dofs, cells, drift_cell_values_quad(x, cells, grads, vols, w_q, bary, qw, coef)
    )


def grad_inner_rhs(n_dofs, c, cells, grads, vols, coef=1.0):
    """RHS vector of ``integral coef * grad(c) . grad(v)`` for a known P1
    field c (the EMI diffusive driving term, emiWeakForm.py:217)."""
    vals = stiffness_cell_values(c, cells, grads, vols, None, coef)
    return scatter_add(n_dofs, cells, vals)


def mass_rhs(n_dofs, f, cells, vols, scale=1.0):
    """RHS of ``integral scale * f * v`` for P1 f."""
    return scatter_add(n_dofs, cells, mass_cell_values(f, cells, vols, scale))


def source_rhs_quad(n_dofs, f_at_q, cells, vols, bary, qw):
    """RHS of ``integral f * v`` with f given at cell quadrature points.

    f_at_q: (n_cells, n_q); bary: (n_q, k); qw: (n_q,).
    """
    vals = jnp.einsum("cq,q,qk->ck", f_at_q, qw, bary) * vols[:, None]
    return scatter_add(n_dofs, cells, vals)


# ---------------------------------------------------------------------------
# facet kernels
# ---------------------------------------------------------------------------
def facet_mass_values(xf, areas, scale=1.0):
    """Facet P1 (trace) mass action: per-facet values of
    ``integral scale * x * v`` over each facet; xf: (nf, k_f)."""
    k = xf.shape[1]
    denom = k * (k + 1)
    s = xf.sum(axis=1, keepdims=True)
    return (areas * scale)[..., None] * (s + xf) / denom


def facet_mass_diag_values(areas, k, scale=1.0):
    denom = k * (k + 1)
    return jnp.broadcast_to((2.0 * areas * scale / denom)[:, None], (len(areas), k))


def facet_rhs_quad(n_dofs, coeff_q, facet_dofs, areas, bary, qw):
    """Scatter ``integral coeff * v`` over facets, coefficient given at
    facet quadrature points; coeff_q: (nf, nq), bary: (nq, k_f)."""
    vals = jnp.einsum("fq,q,qk->fk", coeff_q, qw, bary) * areas[:, None]
    return scatter_add(n_dofs, facet_dofs, vals)


def trace_at_quad(x, facet_dofs, bary):
    """Evaluate the P1 trace of x at facet quadrature points: (nf, nq)."""
    return jnp.einsum("fk,qk->fq", x[facet_dofs], bary)
