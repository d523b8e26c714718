"""Method-of-manufactured-solutions machinery.

Reproduces the reference's MMS verification setup (tests/run_mms.py:252-382,
tests/run_mms_emi.py:165-250) but derives every source term by JAX
autodiff instead of UFL symbolic calculus:

    J_k_r   = -D grad(c_k_r) - z_k D psi c_k_r grad(phi_r)
    f_k_r   = div(J_k_r)
    f_phi_r = F sum_k z_k div(J_k_r)
    Im_i    =  (F sum_k z_k J_k_i) . n_i      (n_i outward from the ICS)
    Im_e    = -(F sum_k z_k J_k_e) . n_i
    f_phi_m = phi_M - Im_i / C_phi
    f_I_M   = Im_i + Im_e
    f_phi_m_k_r = phi_M - (J_k_r . n_i) / C_k_r

Everything is evaluated once at setup on cell/facet quadrature points and
stored as static arrays inside EMIMMSData / KNPMMSData.

Note on the Dirichlet data: the reference interpolates
sin(2 pi x) cos(2 pi y) as the EMI boundary value (emiWeakForm.py:359)
although its phi_e_exact = sin(2 pi x) sin(2 pi y) vanishes on the unit
square boundary; we use the mathematically consistent trace of
phi_e_exact (= 0) — the quantity the convergence study is meaningful for.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import quadrature as quad
from ..ops.geometry import DiscreteGeometry
from .types import Ion, PhysicalParams
from .emi import EMIMMSData
from .knp import KNPMMSData


@dataclasses.dataclass
class MMSCase:
    """Exact fields as JAX-differentiable callables of x (shape (dim,)).

    conc[(name, tag)] -> c(x); phi[tag] -> phi(x); ions: list of Ion with
    z/D per tag (the eliminated ion last, its concentration determined by
    electroneutrality).
    """

    ions: List[Ion]
    conc: Dict[tuple, Callable]
    phi: Dict[int, Callable]
    params: PhysicalParams


def reference_mms_case_3d(geom: DiscreteGeometry, shift: float = 2.0) -> MMSCase:
    """3-D extension of the reference's manufactured solution (trig
    products over x, y, z; same ion structure and unit coefficients)."""
    two_pi = 2.0 * jnp.pi

    def a_fn(x):
        return shift + jnp.sin(two_pi * x[1]) * jnp.cos(two_pi * x[0]) * jnp.cos(
            two_pi * x[2]
        )

    def b_fn(x):
        return shift + jnp.cos(two_pi * x[1]) * jnp.sin(two_pi * x[0]) * jnp.cos(
            two_pi * x[2]
        )

    z_a, z_b, z_c = 1.0, -1.0, 1.0

    def c_fn(x):
        return -(z_a * a_fn(x) + z_b * b_fn(x)) / z_c

    def phi_i(x):
        return (
            jnp.cos(two_pi * x[0]) * jnp.cos(two_pi * x[1]) * jnp.cos(two_pi * x[2])
        )

    def phi_e(x):
        return (
            jnp.sin(two_pi * x[0]) * jnp.sin(two_pi * x[1]) * jnp.sin(two_pi * x[2])
        )

    tags = geom.sub_tags
    ions = [
        Ion("a", z_a, {t: 1.0 for t in tags}),
        Ion("b", z_b, {t: 1.0 for t in tags}),
        Ion("c", z_c, {t: 1.0 for t in tags}),
    ]
    conc = {}
    for t in tags:
        conc[("a", t)] = a_fn
        conc[("b", t)] = b_fn
        conc[("c", t)] = c_fn
    params = PhysicalParams(
        dt=1.0, F=1.0, R=1.0, temperature=1.0, C_M=1.0,
        rho={t: 0.0 for t in tags},
    )
    return MMSCase(ions=ions, conc=conc, phi={0: phi_e, 1: phi_i}, params=params)


def reference_mms_case(geom: DiscreteGeometry, shift: float = 2.0) -> MMSCase:
    """The reference's 2-D trig case (run_mms.py:252-268): three ions
    a (z=+1), b (z=-1), c (z=+1, eliminated), unit coefficients.

    ``shift`` is added to the a/b concentrations.  The reference uses
    shift = 0, which makes its manufactured conductivity
    kappa = sum z^2 D c = 2*b(x) sign-indefinite — the EMI operator is
    then not coercive and the discrete errors do not converge
    monotonically (the reference never asserted its EMI rates,
    run_mms_emi.py:342-344 prints only).  With shift = 2, kappa = 2*(b+2)
    >= 2 > 0 and both subsystems converge at the expected O(h^2); the
    eliminated-ion field c = b - a is unchanged by the shift.
    """
    two_pi = 2.0 * jnp.pi

    def a_fn(x):
        return shift + jnp.sin(two_pi * x[1]) * jnp.cos(two_pi * x[0])

    def b_fn(x):
        return shift + jnp.cos(two_pi * x[1]) * jnp.sin(two_pi * x[0])

    z_a, z_b, z_c = 1.0, -1.0, 1.0

    def c_fn(x):
        return -(z_a * a_fn(x) + z_b * b_fn(x)) / z_c

    def phi_i(x):
        return jnp.cos(two_pi * x[0]) * jnp.cos(two_pi * x[1])

    def phi_e(x):
        return jnp.sin(two_pi * x[0]) * jnp.sin(two_pi * x[1])

    tags = geom.sub_tags
    ions = [
        Ion("a", z_a, {t: 1.0 for t in tags}),
        Ion("b", z_b, {t: 1.0 for t in tags}),
        Ion("c", z_c, {t: 1.0 for t in tags}),
    ]
    conc = {}
    for t in tags:
        conc[("a", t)] = a_fn
        conc[("b", t)] = b_fn
        conc[("c", t)] = c_fn
    params = PhysicalParams(
        dt=1.0, F=1.0, R=1.0, temperature=1.0, C_M=1.0, rho={t: 0.0 for t in tags}
    )
    return MMSCase(ions=ions, conc=conc, phi={0: phi_e, 1: phi_i}, params=params)


# ---------------------------------------------------------------------------
# pointwise derived fields (autodiff)
# ---------------------------------------------------------------------------
def _flux_fn(c_fn, phi_fn, D, z, psi):
    gc = jax.grad(c_fn)
    gp = jax.grad(phi_fn)

    def J(x):
        return -D * gc(x) - z * D * psi * c_fn(x) * gp(x)

    return J


def _div_fn(vec_fn):
    jac = jax.jacfwd(vec_fn)

    def div(x):
        return jnp.trace(jac(x))

    return div


def _eval_at(fn, pts):
    """vmap a pointwise callable over (..., dim) points.

    Always evaluated on the host CPU backend: MMS data is one-time setup
    and must not pay remote-TPU compile latency.
    """
    flat = pts.reshape(-1, pts.shape[-1])
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vals = np.asarray(jax.vmap(fn)(jnp.asarray(flat)))
    return vals.reshape(pts.shape[:-1] + vals.shape[1:])


def _cell_qpoints(geom, tag, bary):
    sub = geom.subdomains[tag]
    return np.einsum("qk,ckd->cqd", bary, sub.coords[sub.cells])


def _facet_qpoints(points, facet_verts, bary):
    return np.einsum("qk,fkd->fqd", bary, points[facet_verts])


def build_mms_data(geom: DiscreteGeometry, case: MMSCase):
    """Build (ions_with_ic, EMIMMSData, KNPMMSData) for a case."""
    p = case.params
    psi, F, C_phi = p.psi, p.F, p.C_phi
    ions = case.ions
    n_solved = len(ions) - 1
    dim = geom.dim

    cell_bary, cell_qw = quad.cell_rule(dim)
    facet_bary, facet_qw = quad.facet_rule_high(dim)

    # fluxes per (ion, tag)
    J = {
        (ion.name, t): _flux_fn(case.conc[(ion.name, t)], case.phi[t], ion.D[t], ion.z, psi)
        for ion in ions
        for t in geom.sub_tags
    }

    # ---- cell sources -------------------------------------------------------
    f_phi_q = {}
    f_k_q = {}
    gradphi_q = {}
    for t in geom.sub_tags:
        Xq = _cell_qpoints(geom, t, cell_bary)

        def f_phi(x, t=t):
            return F * sum(
                ion.z * _div_fn(J[(ion.name, t)])(x) for ion in ions
            )

        f_phi_q[t] = _eval_at(f_phi, Xq)
        f_k_q[t] = np.stack(
            [_eval_at(_div_fn(J[(ion.name, t)]), Xq) for ion in ions[:n_solved]]
        )
        gradphi_q[t] = _eval_at(jax.grad(case.phi[t]), Xq)

    # ---- membrane data -------------------------------------------------------
    f_phi_m_q, f_I_M_q = {}, {}
    g_robin_e_q, g_robin_i_q, dphi_q = {}, {}, {}
    for mtag, mem in geom.membranes.items():
        ct = mem.cell_tag
        Xq = _facet_qpoints(geom.mesh.points, mem.facet_verts, facet_bary)
        nrm = mem.normals  # (nf, dim), outward from the ICS = n_i

        def phiM(x):
            return case.phi[ct](x) - case.phi[0](x)

        phiM_q = _eval_at(phiM, Xq)
        dphi_q[mtag] = phiM_q

        def total_flux(x, t):
            return F * sum(ion.z * J[(ion.name, t)](x) for ion in ions)

        Ji_q = _eval_at(lambda x: total_flux(x, ct), Xq)  # (nf, nq, dim)
        Je_q = _eval_at(lambda x: total_flux(x, 0), Xq)
        Im_i = np.einsum("fqd,fd->fq", Ji_q, nrm)
        Im_e = -np.einsum("fqd,fd->fq", Je_q, nrm)
        f_phi_m_q[mtag] = phiM_q - Im_i / C_phi
        f_I_M_q[mtag] = Im_i + Im_e

        ge, gi = [], []
        for ion in ions[:n_solved]:
            Jke = _eval_at(J[(ion.name, 0)], Xq)
            Jki = _eval_at(J[(ion.name, ct)], Xq)
            # C_k_r = 1 in the reference MMS (run_mms.py:221-226)
            ge.append(phiM_q - np.einsum("fqd,fd->fq", Jke, nrm))
            gi.append(phiM_q - np.einsum("fqd,fd->fq", Jki, nrm))
        g_robin_e_q[mtag] = np.stack(ge)
        g_robin_i_q[mtag] = np.stack(gi)

    # ---- exterior boundary ----------------------------------------------------
    emi_neumann_q = {}
    knp_neumann_q = {}
    for btag, bs in geom.boundaries.items():
        Xq = _facet_qpoints(geom.mesh.points, bs.facet_verts, facet_bary)
        nrm = bs.normals

        def emi_flux(x):
            return sum(
                -F * ion.z * J[(ion.name, bs.sub_tag)](x) for ion in ions
            )

        Jq = _eval_at(emi_flux, Xq)
        emi_neumann_q[btag] = np.einsum("fqd,fd->fq", Jq, nrm)
        rows = []
        for ion in ions[:n_solved]:
            Jk = _eval_at(J[(ion.name, bs.sub_tag)], Xq)
            rows.append(-np.einsum("fqd,fd->fq", Jk, nrm))
        knp_neumann_q[btag] = np.stack(rows)

    # ---- Dirichlet BC for the EMI system (ECS exterior, tag 5) ---------------
    dirichlet_dofs = dirichlet_vals = None
    if 5 in geom.boundaries:
        bs = geom.boundaries[5]
        assert bs.sub_tag == 0
        coords = geom.subdomains[0].coords[bs.dofs]
        vals = _eval_at(case.phi[0], coords)
        dirichlet_dofs = bs.dofs
        dirichlet_vals = np.asarray(vals)

    emi_data = EMIMMSData(
        f_phi_q=f_phi_q,
        cell_bary=cell_bary,
        cell_qw=cell_qw,
        f_phi_m_q=f_phi_m_q,
        f_I_M_q=f_I_M_q,
        facet_bary=facet_bary,
        facet_qw=facet_qw,
        neumann_q=emi_neumann_q,
        dirichlet_dofs=dirichlet_dofs,
        dirichlet_vals=dirichlet_vals,
    )
    knp_data = KNPMMSData(
        f_k_q=f_k_q,
        cell_bary=cell_bary,
        cell_qw=cell_qw,
        gradphi_q=gradphi_q,
        g_robin_e_q=g_robin_e_q,
        g_robin_i_q=g_robin_i_q,
        dphi_q=dphi_q,
        facet_bary=facet_bary,
        facet_qw=facet_qw,
        neumann_q=knp_neumann_q,
    )

    # initial conditions = exact vertex interpolants (run_mms.py:392-419)
    for ion in ions:
        ion.c_init = {
            t: _eval_at(case.conc[(ion.name, t)], geom.subdomains[t].coords)
            for t in geom.sub_tags
        }

    return ions, emi_data, knp_data


# ---------------------------------------------------------------------------
# error norms
# ---------------------------------------------------------------------------
def l2_error(geom: DiscreteGeometry, tag: int, u_h, exact_fn) -> float:
    """L2 norm of (u_h - exact) over subdomain `tag` by quadrature
    (the analog of the reference's assembled error forms,
    run_mms.py:557-612)."""
    sub = geom.subdomains[tag]
    bary, qw = quad.cell_rule(geom.dim)
    Xq = _cell_qpoints(geom, tag, bary)
    ue = _eval_at(exact_fn, Xq)  # (nc, nq)
    uh = np.einsum("qk,ck->cq", bary, np.asarray(u_h)[sub.cells])
    err2 = np.einsum("cq,q->c", (uh - ue) ** 2, qw) * sub.vols
    return float(np.sqrt(err2.sum()))
