"""Smoothed-aggregation AMG preconditioner (Vanek/Mandel/Brezina).

The reference leans on hypre BoomerAMG for both solves
(pdeSolver.py:32,103); SURVEY.md section 7 ranks "AMG-class
preconditioning in JAX" as the hardest native-parity item.  This module
reaches BoomerAMG-class iteration counts (15-25 CG iterations on the 3-D
EMI systems vs ~650 for Jacobi) with a TPU-friendly division of labor:

* **setup on the host, once** (scipy): strength-of-connection filtering,
  Vanek root-node aggregation on the filtered graph, near-null-space-
  weighted tentative prolongators (the equilibrated operator's near-null
  vector is sqrt(diag A), NOT the constant), Jacobi-smoothed P, Galerkin
  RAP, dense pseudo-inverse of the coarsest level;
* **apply on the device, every iteration** (jit): symmetric V-cycle with
  damped-Jacobi smoothing; ALL level operators (including the finest,
  lagged) and transfer operators are applied in ELL form (fixed-width
  gathers), the coarsest inverse is a dense MXU matmul.  Smoothing with
  the lagged fine ELL instead of the caller's matrix-free matvec is
  preconditioner-internal, so the Krylov solve still targets the current
  operator exactly.

The hierarchy is *lagged*: built from the initial operator and reused as
the preconditioner while CG solves the current operator exactly (the
tissue conductivity kappa drifts <1% over a simulation; see
Simulation._setup_emi_mg).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side setup
# ---------------------------------------------------------------------------
def strength_filter(A: sp.csr_matrix, theta: float,
                    B: Optional[np.ndarray] = None) -> sp.csr_matrix:
    """Keep |a_ij| >= theta sqrt(a_ii a_jj); lump dropped entries onto
    the diagonal.

    Lumping is B-COMPATIBLE when the near-null vector is given:
    a_ii += a_ij * B_j / B_i, so that Af B = A B exactly.  Plain lumping
    (the B = constant special case) silently breaks near-null
    preservation for equilibrated operators — B = 1/sqrt(diag) varies by
    orders of magnitude at membrane rows, the Jacobi-smoothed P then
    fails to reproduce B, and every Galerkin level compounds the defect
    (measured: the level-1 EMI solve needed 43 CG iterations while the
    fine-level two-grid took 5)."""
    A = A.tocsr()
    d = np.abs(A.diagonal())
    C = A.tocoo()
    keep = (np.abs(C.data) >= theta * np.sqrt(d[C.row] * d[C.col])) | (
        C.row == C.col
    )
    Af = sp.csr_matrix((C.data[keep], (C.row[keep], C.col[keep])), shape=A.shape)
    drow, dcol, dval = C.row[~keep], C.col[~keep], C.data[~keep]
    if B is not None:
        Bs = np.where(B != 0, B, 1.0)
        dval = dval * (B[dcol] / Bs[drow])
    # bincount returns int64 when drow/dval are both empty (nothing
    # filtered); keep the diagonal float so sp.diags doesn't warn/cast
    lump = np.bincount(drow, weights=dval, minlength=A.shape[0])
    return (Af + sp.diags(lump.astype(A.data.dtype, copy=False))).tocsr()


def vanek_aggregate(Af: sp.csr_matrix):
    """Root-node aggregation on the strength graph (Vanek phases 1-3).

    Uses the native host toolkit when available (the Python sweep is
    O(n) interpreted; native/host_toolkit.cpp is ~100x faster at scale).
    """
    Af = Af.tocsr()
    n = Af.shape[0]
    from ..utils import native

    res = native.vanek_aggregate(Af.indptr, Af.indices, n)
    if res is not None:
        return res
    agg = np.full(n, -1, dtype=np.int64)
    nc = 0
    indptr, indices = Af.indptr, Af.indices
    for i in range(n):  # phase 1: roots with fully free neighborhoods
        if agg[i] >= 0:
            continue
        nb = indices[indptr[i] : indptr[i + 1]]
        if (agg[nb] == -1).all():
            agg[nb] = nc
            agg[i] = nc
            nc += 1
    for i in range(n):  # phase 2: attach stragglers
        if agg[i] >= 0:
            continue
        nb = indices[indptr[i] : indptr[i + 1]]
        cand = nb[agg[nb] >= 0]
        agg[i] = agg[cand[0]] if len(cand) else -2
    for i in range(n):  # phase 3: isolated nodes become singletons
        if agg[i] == -2:
            agg[i] = nc
            nc += 1
    return agg, nc


def _attach_singletons(agg: np.ndarray, nc: int, A: sp.csr_matrix):
    """Re-attach singleton aggregates to the aggregate of their
    largest-|a_ij| RAW-graph neighbor.

    Strength-isolated rows (every coupling below theta) come out of
    Vanek aggregation as singletons and stay singletons on every
    Galerkin level, so coarsening STALLS: measured on the flagship
    tissue's KNP operators (mass/dt-dominated after one coarsening),
    280k -> 32k -> ... -> 7.5k rows that never shrink, ending in a
    7509^2 dense eigh costing ~45 host-minutes.  Such rows are
    diagonally dominant — the smoother owns them — so folding them into
    a neighboring aggregate costs nothing in interpolation quality while
    restoring geometric coarsening.  Rows with agg == -1 (diagonal-only)
    stay excluded."""
    if nc == 0:
        return agg, nc
    sizes = np.bincount(agg[agg >= 0], minlength=nc)
    single = (agg >= 0) & (sizes[np.maximum(agg, 0)] == 1)
    if not single.any():
        return agg, nc
    A = A.tocsr()
    indptr, indices, adata = A.indptr, A.indices, np.abs(A.data)
    new_agg = agg.copy()
    still = []
    for i in np.flatnonzero(single):
        sl = slice(indptr[i], indptr[i + 1])
        nb, val = indices[sl], adata[sl]
        # one-shot attach to a NON-singleton neighbor's aggregate; a
        # singleton target would be a moving chain (with uniform weights
        # every node points at its first neighbor and nc barely drops)
        ok = (nb != i) & (agg[nb] >= 0) & (
            sizes[np.maximum(agg[nb], 0)] > 1
        )
        if ok.any():
            new_agg[i] = agg[nb[ok][np.argmax(val[ok])]]
        else:
            still.append(i)
    if still:
        # pure-singleton regions (e.g. an entirely mass-dominated
        # subdomain where EVERY row is strength-isolated): rows are
        # locality-ordered (RCM/Morton, ops/geometry.py), so packing
        # RUNS of consecutive singleton rows into fixed-size groups
        # yields compact spatial aggregates without any graph walk
        still = np.asarray(still)
        run_id = np.cumsum(np.r_[0, np.diff(still) != 1])
        # group size 8: within each run, chunk consecutive rows
        pos_in_run = np.arange(len(still)) - np.maximum.accumulate(
            np.where(np.r_[True, np.diff(still) != 1],
                     np.arange(len(still)), 0)
        )
        key = run_id * (len(still) + 1) + pos_in_run // 8
        _, packed = np.unique(key, return_inverse=True)
        new_agg[still] = nc + packed
        nc = nc + int(packed.max()) + 1
    used = np.zeros(nc, bool)
    used[new_agg[new_agg >= 0]] = True
    remap = np.full(nc, -1, np.int64)
    remap[used] = np.arange(int(used.sum()))
    new_agg = np.where(new_agg >= 0, remap[np.maximum(new_agg, 0)], -1)
    return new_agg, int(used.sum())


def _tentative_prolongator(agg: np.ndarray, nc: int, B: np.ndarray):
    """Multi-candidate SA tentative prolongator: per aggregate, an
    orthonormal basis (QR) of the near-null candidates restricted to the
    aggregate; returns (Pt, B_coarse).

    With B = [constant] this is classic single-vector SA.  Multi-
    candidate support exists for adaptive/bootstrap experiments; note
    that per-subdomain indicator candidates are redundant here
    (aggregates never cross the membrane, so an indicator restricted to
    any aggregate is proportional to the constant), and measured
    adaptive random-relaxed candidates did not help the EMI operator —
    the res-2 iteration growth was a cycle-recursion problem fixed by
    the W-cycle (MGHierarchy.gamma), not a coarse-space one.
    """
    n, m = B.shape
    # agg == -1 marks rows excluded from the coarse space (isolated
    # rows, see build_hierarchy): their P rows stay identically zero
    valid = np.flatnonzero(agg >= 0)
    order = valid[np.argsort(agg[valid], kind="stable")]
    counts = np.bincount(agg[valid], minlength=nc)
    starts = np.zeros(nc + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rows = []
    cols = []
    vals = []
    Bc = np.zeros((nc * m, m))
    # group aggregates by size so each group QRs as one batched einsum
    for size in np.unique(counts):
        if size == 0:
            continue
        aggs = np.flatnonzero(counts == size)
        idx = np.stack(
            [order[starts[a] : starts[a] + size] for a in aggs]
        )  # (na, size)
        Bb = B[idx]  # (na, size, m)
        Q, R = np.linalg.qr(Bb)  # (na, size, k), (na, k, m); k=min(size,m)
        k = Q.shape[2]
        # fix QR sign ambiguity (diag(R) >= 0) for determinism
        sign = np.sign(np.einsum("aii->ai", R[:, :k, :k]))
        sign = np.where(sign == 0, 1.0, sign)
        Q = Q * sign[:, None, :]
        R = R * sign[:, :, None]
        na = len(aggs)
        rows.append(np.repeat(idx.reshape(na, size), k, axis=1).ravel())
        cols.append(
            (aggs[:, None, None] * m
             + np.arange(k)[None, None, :]).repeat(size, axis=1).ravel()
        )
        vals.append(Q.reshape(-1))
        Bc[(aggs[:, None] * m + np.arange(k)[None, :]).ravel()] = (
            R.reshape(na * k, m)
        )
    Pt = sp.csr_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, nc * m),
    )
    # drop numerically-zero columns (aggregates smaller than m produce
    # rank-deficient blocks); keep shapes simple by keeping them — the
    # zero columns yield zero coarse rows/cols and a harmless singular
    # direction handled by the coarse eigenvalue cutoff.
    return Pt, Bc


def _lam_max_jacobi(A: sp.csr_matrix, iters: int = 30) -> float:
    d = A.diagonal()
    d = np.where(d != 0, d, 1.0)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    lam = 1.0
    for _ in range(iters):
        x = (A @ x) / d
        lam = np.linalg.norm(x)
        x /= max(lam, 1e-30)
    return float(max(lam, 1e-30))


def _csr_to_ell(A: sp.csr_matrix, pad_diag=True, K=None):
    """ELL layout; ``K`` forces the width (frozen-shape refreshes): rows
    wider than K drop their smallest-|value| entries."""
    A = A.tocsr()
    n = A.shape[0]
    Kmax = max(int(np.diff(A.indptr).max()), 1)
    cols = np.zeros((n, Kmax), dtype=np.int32)
    vals = np.zeros((n, Kmax))
    nnz_per_row = np.diff(A.indptr)
    # vectorized fill
    rows = np.repeat(np.arange(n), nnz_per_row)
    pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], nnz_per_row)
    cols[rows, pos] = A.indices
    vals[rows, pos] = A.data
    pos_mask = np.zeros((n, Kmax), dtype=bool)
    pos_mask[rows, pos] = True
    if K is not None and K != Kmax:
        if Kmax > K:
            order = np.argsort(-np.abs(vals), axis=1)[:, :K]
            r = np.arange(n)[:, None]
            cols, vals, pos_mask = (
                cols[r, order], vals[r, order], pos_mask[r, order]
            )
        else:
            pad = K - Kmax
            cols = np.pad(cols, ((0, 0), (0, pad)))
            vals = np.pad(vals, ((0, 0), (0, pad)))
            pos_mask = np.pad(pos_mask, ((0, 0), (0, pad)))
        Kmax = K
    if pad_diag:
        # unused slots point at the row itself with zero value
        cols[~pos_mask] = np.repeat(
            np.arange(n)[:, None], Kmax, 1
        )[~pos_mask]
    return cols, vals


def _cheb_steps(lam_max: float, degree: int, eig_ratio: float = 4.0):
    """Richardson step sizes 1/r_i at the Chebyshev points of
    [lam_max/eig_ratio, lam_max] for D^{-1}A — the standard
    hypre/PyAMG-style polynomial smoother that keeps V-cycle iteration
    counts mesh-independent where a single damped-Jacobi pass does not
    (measured here: EMI 19 -> 55 iterations from 3-D res 1 to res 2).
    degree=1 reduces to damped Jacobi with omega = 1/r_0."""
    lmin = lam_max / eig_ratio
    d = 0.5 * (lam_max + lmin)
    c = 0.5 * (lam_max - lmin)
    roots = d + c * np.cos(np.pi * (2 * np.arange(degree) + 1)
                           / (2.0 * degree))
    return (1.0 / roots).astype(np.float64)


@dataclasses.dataclass
class MGLevel:
    n: int
    diag: np.ndarray
    omega: float
    # polynomial-smoother step sizes (Richardson over 1/diag); length =
    # smoothing degree.  [omega] reproduces plain damped Jacobi.
    steps: Optional[np.ndarray] = None
    # operator in ELL form (None on the finest level: matrix-free there)
    a_cols: Optional[np.ndarray] = None
    a_vals: Optional[np.ndarray] = None
    # prolongator P (n x nc) and restriction P^T (nc x n) in ELL form
    p_cols: Optional[np.ndarray] = None
    p_vals: Optional[np.ndarray] = None
    pt_cols: Optional[np.ndarray] = None
    pt_vals: Optional[np.ndarray] = None
    # block-banded dense forms (see _csr_to_banded); None -> use ELL
    a_band: Optional[tuple] = None
    p_band: Optional[tuple] = None
    pt_band: Optional[tuple] = None
    # banded A@P product (n x nc): lets the post-smoothing residual be
    # computed as res1 - (AP) xc instead of res1 - A (P xc) — the same
    # arithmetic, but the slab read shrinks by ~the aggregate size
    # (nc ~ n/8), halving the V-cycle's per-level HBM floor of two
    # full-operator reads (the restriction residual still needs one)
    ap_band: Optional[tuple] = None
    # windowed-ELL forms (ops/pallas_ell.py): factored one-hot MXU
    # gather/scatter over per-chunk windows — used when the banded slab
    # would exceed its budget (flagship KNP fine operator: 4.7 GB slab,
    # 14.8 ms/apply -> ~60 MB lanes, ~4 ms) or banding is refused
    # outright (level-0 P/Pt: 13-15 ms ELL gathers -> ~3 ms roundtrip)
    a_ellw: Optional[object] = None
    ap_ellw: Optional[object] = None
    p_ellw: Optional[object] = None
    pt_ellw: Optional[object] = None
    # host-side prolongator (kept for value refresh: Galerkin RAP with
    # frozen P, see refresh_hierarchy); never shipped to the device
    P_csr: Optional[sp.csr_matrix] = None


def _csr_to_banded(A: sp.csr_matrix, R: int = 256, W_cap: int = 4096,
                   density_min: float = 0.002, mem_cap: int = 512 << 20,
                   n_windows: int = 2, dtype=np.float64):
    """Multi-window block-banded dense layout of a sparse matrix whose
    rows are locality-ordered (Morton dofs): rows are grouped into
    blocks of R; each block stores up to ``n_windows`` dense slabs
    ``A[r0:r0+R, w0_s[b]:w0_s[b]+W_s]`` (e.g. the diagonal Morton window
    plus the membrane cross-subdomain cluster) and a COO list of the few
    entries outside every window.  A banded matvec is then streamed MXU
    slab work (ops/pallas_banded.py) instead of the TPU's slow random
    gathers.

    Returns ``(windows, far_rows, far_cols, far_vals, n, m)`` with
    ``windows = [(slabT (NB*W, R), w0 (NB,), W), ...]``, or None when
    the layout is unprofitable (windows too wide / slabs too empty).
    """
    A = A.tocsr()
    n, m = A.shape
    NB = -(-n // R)
    indptr, indices, data = A.indptr, A.indices, A.data
    rows = np.repeat(np.arange(n), np.diff(indptr))
    blk = rows // R
    m128 = -(-m // 128) * 128
    mem_left = mem_cap

    remaining = np.ones(A.nnz, bool)
    windows = []
    for _ in range(n_windows):
        rem_nnz = int(remaining.sum())
        if rem_nnz == 0 or (windows and rem_nnz < 0.02 * A.nnz):
            break  # leftover is cheap enough as a COO remainder
        # split remaining entries by row-block in one pass (blk is
        # nondecreasing in CSR order; a per-block boolean scan is
        # O(NB * nnz) and dominated setup at res 2: ~3e9 ops)
        rem_idx = np.flatnonzero(remaining)
        bounds = np.searchsorted(blk[rem_idx], np.arange(1, NB))
        block_cols = [
            np.sort(part) for part in np.split(indices[rem_idx], bounds)
        ]

        def coverage(W):
            near = 0
            for c in block_cols:
                if len(c):
                    near += int(
                        (np.searchsorted(c, c + W) - np.arange(len(c))).max()
                    )
            return near

        # smallest ladder W capturing >= 85% of the remaining entries —
        # but keep scanning (to <= 2x that width) for FULL coverage:
        # every entry left out pays ~28 ns/apply as COO gather/scatter
        # (e.g. 47k far at the flagship KNP level 1 = ~1.3 ms of a
        # 2.5 ms apply), while a wider streamed slab costs only its
        # extra bandwidth (same rationale as build_ellw's spill-free
        # widening)
        W = W85 = best_W = None
        best_near = -1
        for Wc in (128, 256, 512, 1024, 1536, 2048, 3072, 4096):
            if Wc > min(W_cap, m128) or NB * R * Wc * 4 > mem_left:
                break
            near = coverage(Wc)
            if near > best_near:
                best_near, best_W = near, Wc
            if W85 is None and near >= 0.85 * rem_nnz:
                W85 = Wc
            if near >= rem_nnz:
                W = Wc if (W85 is None or Wc <= 2 * W85) else W85
                break
            if W85 is not None and Wc >= 2 * W85:
                W = W85
                break
        if W is None:
            W = W85
        if W is None:
            # a follow-up window pays for itself at lower coverage: it
            # replaces COO gather/scatter (~0.03 us/entry) with a cheap
            # streamed slab, so accept down to 35% of the remainder
            accept = 0.5 if not windows else 0.35
            if best_W is None or best_near < accept * rem_nnz:
                break  # this window wouldn't pay for itself
            W = best_W
        if not windows and m128 <= min(W_cap, mem_left // (4 * NB * R)) \
                and m128 < 2 * W:
            W = m128  # window can cover everything: store dense
        # densest width-W window per block (two-pointer on sorted cols),
        # start aligned down to 128 lanes (+1 lane-tile of width) so the
        # Pallas kernel reads whole (1, 128) rows
        w0 = np.zeros(NB, np.int32)
        for b, c in enumerate(block_cols):
            if len(c) == 0:
                continue
            cover = np.searchsorted(c, c + W) - np.arange(len(c))
            w0[b] = c[int(np.argmax(cover))]
        w0 = (w0 // 128 * 128).astype(np.int32)
        W = W + 128
        if NB * R * W * 4 > mem_left:
            break
        loc = indices - w0[blk]
        inside = remaining & (loc >= 0) & (loc < W)
        nnz_in = int(inside.sum())
        # break-even density: slab streaming (~320 GB/s) vs COO
        # gather/scatter (~28 ns/entry) crosses near 0.05% fill, so
        # follow-up windows accept much sparser slabs than the first
        dmin = density_min if not windows else density_min / 4
        if nnz_in < dmin * NB * R * W and n > 2048:
            break  # slab nearly empty: leftovers stay COO
        slabT = np.zeros((NB * W, R), dtype)
        slabT[blk[inside] * W + loc[inside], rows[inside] % R] = data[inside]
        windows.append((slabT, w0, W))
        remaining = remaining & ~inside
        mem_left -= NB * R * W * 4

    if not windows:
        return None
    if int(remaining.sum()) > 0.25 * A.nnz:
        return None  # windows miss too much: layout not applicable
    far_rows = rows[remaining].astype(np.int32)
    far_cols = indices[remaining].astype(np.int32)
    far_vals = data[remaining]
    return windows, far_rows, far_cols, far_vals, n, m


@dataclasses.dataclass
class MGHierarchy:
    """Eigenfactored coarse solve: C^-1 = V diag(1/lam) V^T.  A plain
    dense pseudo-inverse mixes O(1e6) and O(1) entries inside one matmul
    accumulation and loses the near-null corrections to f32 cancellation
    (observed as CG stalling at ~1e-4 relative residual); the factored
    form keeps the large numbers in an exact diagonal scale.

    ``gamma`` is the cycle index: 1 = V-cycle (default), 2 = W-cycle.
    History on the 3-D res-2 EMI operator: plain lumping + V-cycle
    needed ~55 CG iterations (two-grid: 5-6; recursion was the weak
    link) and the W-cycle recovered ~30; B-COMPATIBLE lumping
    (strength_filter) fixed the root cause — near-null preservation
    through every level — bringing the V-cycle to ~20 iterations.
    On the B-lumped hierarchy the W-cycle OVER-corrects (lambda(CA)
    exceeds 2 on some modes, the double pass turns indefinite and CG
    diverges), so gamma stays 1 by default."""

    levels: List[MGLevel]
    coarse_V: np.ndarray
    coarse_ilam: np.ndarray
    nu: int = 1
    gamma: int = 1
    # optional row/col permutation applied to the operator BEFORE the
    # hierarchy was built (global RCM of the solver-layout graph): the
    # EMI solver layout concatenates per-tag blocks, so membrane
    # coupling spans block-distant ids and the banded window layout
    # degrades (4 GB fine slabs at 3-D res 2) or fails outright into
    # the ELL random-gather fallback (150 ms/apply on the flagship
    # tissue operator).  Global RCM interleaves the coupled dofs
    # (measured bandwidth 22069 -> 428 in the sharded analog,
    # parallel/sharded_mg.py); DeviceMG gathers residuals in/out.
    perm: Optional[np.ndarray] = None

    def device(self, dtype, band_dtype=None, band_pallas=False):
        """``band_dtype`` is the STORAGE dtype of the FINE-level
        smoothing slab (default: ``dtype``).  bf16 halves the V-cycle's
        dominant HBM read; the contraction upcasts to the run dtype
        after the read, so the preconditioner stays a fixed linear
        operator (the original bf16-COMPUTE variant rounded x and
        stalled CG 19->137 iterations).  The cast applies ONLY to
        levels[0].a_band: the Galerkin coarse operators and P/Pt are
        cancellation-sensitive — B-compatible lumping annihilates the
        near-null exactly, and a 0.4% entry rounding of the coarse
        hierarchy measurably destroys it (EMI 9 -> cap at 3-D res 2
        with all-level bf16; fine-only perturbs the SMOOTHER, which is
        harmless).  ``band_pallas`` applies the slabs with the Pallas
        window kernel (TPU only)."""

        # host->device transfers ride a slow tunnel in this environment
        # (measured 60-77 MB/s up, uncontended): a multi-GB dense slab
        # costs minutes to upload, while its ~nnz payload is ~1%.  On
        # accelerators, ship the nonzeros and SCATTER into device zeros
        # — but only for LARGE slabs: each scatter is its own remote
        # compile (~4 s through the tunnel), so sparse-uploading every
        # small slab cost 36 s per KNP hierarchy at 3-D res 1 while the
        # dense bytes would have moved in under a second.
        sparse_upload = jax.devices()[0].platform != "cpu"
        _SPARSE_MIN_BYTES = 192 << 20

        def dev_slab(sT, dt):
            if not sparse_upload or sT.nbytes < _SPARSE_MIN_BYTES:
                return jnp.asarray(sT, dtype=dt)
            flat = np.flatnonzero(sT)
            vals = sT.ravel()[flat]
            z = jnp.zeros(sT.size, dtype=dt)
            if len(vals) == 0:
                return z.reshape(sT.shape)
            assert sT.size < 2**31
            return z.at[jnp.asarray(flat, dtype=jnp.int32)].set(
                jnp.asarray(vals, dtype=dt)
            ).reshape(sT.shape)

        def dev_band(band, slab_dt=None):
            if band is None:
                return None
            windows, fr, fc, fv, n, m = band
            return dict(
                windows=[
                    dict(
                        slabT=dev_slab(sT, slab_dt or dtype),
                        w0=jnp.asarray(w0),
                        w0_rows=jnp.asarray(w0 // 128, dtype=jnp.int32),
                        W=W,
                    )
                    for sT, w0, W in windows
                ],
                far_rows=jnp.asarray(fr),
                far_cols=jnp.asarray(fc),
                far_vals=jnp.asarray(fv, dtype=dtype),
                n=n, m=m, pallas=bool(band_pallas),
            )

        iperm_np = (
            np.argsort(self.perm) if self.perm is not None else None
        )
        out = []
        for ilv, lv in enumerate(self.levels):
            fine_dt = band_dtype if ilv == 0 else None
            steps = (
                lv.steps if lv.steps is not None
                else np.array([lv.omega])
            )
            # matrix-free permuted fine level: pre-gather the smoothing
            # diagonal into SOLVER layout once, so the cycle can smooth
            # level 0 with the caller's A0 directly — zero per-apply
            # permutation gathers (random gathers run ~140M elem/s on
            # TPU; wrapping A0 in perm/iperm costs two full-vector
            # gathers per smoothing application, ~6x2 per V-cycle)
            dinv_solver = None
            if (ilv == 0 and iperm_np is not None
                    and lv.a_cols is None and lv.a_band is None
                    and getattr(lv, "a_ellw", None) is None):
                dinv_solver = jnp.asarray(
                    (1.0 / lv.diag)[iperm_np], dtype=dtype
                )

            def dev_ellw(e):
                return None if e is None else e.device(dtype)
            out.append(
                dict(
                    n=lv.n,
                    dinv=jnp.asarray(1.0 / lv.diag, dtype=dtype),
                    dinv_solver=dinv_solver,
                    steps=jnp.asarray(steps, dtype=dtype),
                    a_cols=None if lv.a_cols is None else jnp.asarray(lv.a_cols),
                    a_vals=None
                    if lv.a_vals is None
                    else jnp.asarray(lv.a_vals, dtype=dtype),
                    p_cols=jnp.asarray(lv.p_cols),
                    p_vals=jnp.asarray(lv.p_vals, dtype=dtype),
                    pt_cols=jnp.asarray(lv.pt_cols),
                    pt_vals=jnp.asarray(lv.pt_vals, dtype=dtype),
                    a_band=dev_band(lv.a_band, slab_dt=fine_dt),
                    ap_band=dev_band(getattr(lv, "ap_band", None)),
                    p_band=dev_band(lv.p_band),
                    pt_band=dev_band(lv.pt_band),
                    a_ellw=dev_ellw(getattr(lv, "a_ellw", None)),
                    ap_ellw=dev_ellw(getattr(lv, "ap_ellw", None)),
                    p_ellw=dev_ellw(getattr(lv, "p_ellw", None)),
                    pt_ellw=dev_ellw(getattr(lv, "pt_ellw", None)),
                )
            )
        perm = iperm = None
        if self.perm is not None:
            perm = jnp.asarray(self.perm, dtype=jnp.int32)
            iperm = jnp.asarray(
                np.argsort(self.perm).astype(np.int32)
            )
        return DeviceMG(
            out,
            jnp.asarray(self.coarse_V, dtype=dtype),
            jnp.asarray(self.coarse_ilam, dtype=dtype),
            self.nu,
            gamma=self.gamma,
            perm=perm,
            iperm=iperm,
        )


# cache-key version of the hierarchy builder: bump whenever
# build_hierarchy's ALGORITHM changes so stale cached hierarchies are
# never loaded (v2: isolated-row dropping)
_BUILD_VERSION = "v10"  # v9: build_ellw widens to a spill-free window
# (zero far entries) when one exists within 2x the first-acceptable
# width; v10 extends the same rule to _csr_to_banded window ladders


def _cast_band_dtype(hier: "MGHierarchy", slab_dtype) -> "MGHierarchy":
    """Cast a loaded hierarchy's banded slabs to ``slab_dtype`` in place
    (cache entries are reused across run dtypes; the slabs are
    preconditioner-internal, so the cast is convergence-neutral —
    verified identical EMI/KNP iteration counts f32 vs f64)."""
    for lv in hier.levels:
        for attr in ("a_band", "ap_band", "p_band", "pt_band"):
            band = getattr(lv, attr, None)
            if band is None:
                continue
            windows, fr, fc, fv, n, m = band
            if windows and windows[0][0].dtype != np.dtype(slab_dtype):
                windows = [
                    (sT.astype(slab_dtype), w0, W) for sT, w0, W in windows
                ]
                setattr(lv, attr, (windows, fr, fc, fv, n, m))
    return hier


def build_hierarchy_cached(
    A0: sp.csr_matrix,
    B: Optional[np.ndarray] = None,
    cache_dir: Optional[str] = None,
    **kw,
) -> MGHierarchy:
    """Disk-cached :func:`build_hierarchy`, keyed by the operator's exact
    CSR content, the near-null vector and every build parameter.

    The setup cost at 3-D res 2 (blocking scans + Galerkin RAP sweeps)
    is tens of seconds per invocation; the reference amortizes hypre's
    setup across a long-lived MPI job, so repeated bench/driver runs
    here should amortize through this cache instead.  Default location
    ``<repo>/.mg_cache`` (gitignored); override with the
    ``KNPEMI_MG_CACHE`` env var, set it to the empty string to disable."""
    import hashlib
    import os
    import pickle

    if cache_dir is None:
        default = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".mg_cache",
        )
        cache_dir = os.environ.get("KNPEMI_MG_CACHE", default)
    if not cache_dir:
        return build_hierarchy(A0, B=B, **kw)
    A = A0.tocsr()
    h = hashlib.sha256()
    h.update(_BUILD_VERSION.encode())  # bump on builder algorithm changes
    h.update(np.asarray(A.shape, np.int64).tobytes())
    h.update(A.indptr.tobytes())
    h.update(A.indices.tobytes())
    h.update(np.ascontiguousarray(A.data, np.float64).tobytes())
    if B is not None:
        h.update(np.ascontiguousarray(B, np.float64).tobytes())
    # slab_dtype is storage-only (the device casts anyway): keep it OUT
    # of the key and cast on load, so f32 runs reuse entries built f64
    # and vice versa instead of repaying a multi-minute build
    slab_dtype = kw.get("slab_dtype", np.float64)
    h.update(repr(sorted(
        (k, v) for k, v in kw.items() if k != "slab_dtype"
    )).encode())
    path = os.path.join(cache_dir, h.hexdigest()[:32] + ".pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                hier = _cast_band_dtype(pickle.load(f), slab_dtype)
            # LRU touch: eviction below is by mtime, so a hit must
            # refresh the entry or hot hierarchies age out first
            try:
                os.utime(path)
            except OSError:
                pass
            return hier
        except Exception:
            pass  # corrupt/stale cache entry: rebuild below
    hier = build_hierarchy(A, B=B, **kw)
    tmp = f"{path}.tmp{os.getpid()}"
    try:
        # A watchdog timeout (bench.py arms signal.alarm around each
        # case) landing mid-dump used to abandon a multi-minute build as
        # an orphan .tmp; cooperating handlers (utils/critical.py) defer
        # until the entry is safely on disk.
        from ..utils.critical import critical_section

        with critical_section():
            os.makedirs(cache_dir, exist_ok=True)
            with open(tmp, "wb") as f:
                pickle.dump(hier, f, protocol=4)
            os.replace(tmp, path)
    except BaseException as exc:
        try:
            os.remove(tmp)
        except OSError:
            pass
        # caching is best-effort — but re-raise non-IO interruptions
        # (KeyboardInterrupt, a watchdog TimeoutError) to the caller
        if not isinstance(exc, OSError):
            raise
    _evict_lru(cache_dir, keep=path)
    return hier


def _evict_lru(cache_dir: str, keep: str = "") -> None:
    """Bound the on-disk hierarchy cache: evict oldest-mtime entries
    until the directory is under ``KNPEMI_MG_CACHE_MAX_GB`` (default
    24 GiB).  Entries are content-keyed with the builder version folded
    into the hash, so every ``_BUILD_VERSION`` bump strands the previous
    round's multi-GB flagship pickles as unreachable files — LRU by
    mtime (reads touch) reclaims them while keeping everything hot.
    Best-effort: races with concurrent processes are tolerated."""
    import os

    try:
        cap = float(os.environ.get("KNPEMI_MG_CACHE_MAX_GB", "24"))
    except ValueError:
        cap = 24.0
    if cap <= 0:  # 0 / negative disables eviction
        return
    cap_bytes = int(cap * (1 << 30))
    try:
        entries = []
        with os.scandir(cache_dir) as it:
            for d in it:
                if not d.name.endswith(".pkl"):
                    continue
                try:
                    st = d.stat()
                except OSError:
                    continue
                entries.append((st.st_mtime, st.st_size, d.path))
        total = sum(s for _, s, _ in entries)
        if total <= cap_bytes:
            return
        for _, size, p in sorted(entries):
            if p == keep:
                continue
            try:
                os.remove(p)
                total -= size
            except OSError:
                continue
            if total <= cap_bytes:
                break
    except OSError:
        return


def build_hierarchy(
    A0: sp.csr_matrix,
    B: Optional[np.ndarray] = None,
    theta: float = 0.08,
    coarse_max: int = 800,
    max_levels: int = 10,
    nu: int = 1,
    omega_p: float = 4.0 / 3.0,
    fine_ell="auto",
    banded: bool = True,
    smoother: str = "cheby",
    degree: int = 3,
    gamma: int = 1,
    slab_dtype=np.float64,
    band_cap: int = 1024 << 20,
    tband_cap: int = 512 << 20,
) -> MGHierarchy:
    """Build the SA hierarchy.  ``B`` is the near-null-space vector of A0
    (sqrt of the original diagonal for equilibrated operators; ones for
    raw operators).

    With ``fine_ell`` the finest operator is also stored in ELL form and
    the V-cycle smooths with it instead of the caller's matrix-free
    operator: the hierarchy is lagged anyway, the smoother is
    preconditioner-internal (CG/GMRES compute true residuals with the
    current operator), and one fixed-width row gather is much cheaper
    than re-assembling cell contributions per application.  The default
    ``"auto"`` keeps the stored fine operator ONLY when its banded
    layout succeeds: on cube-shaped domains the minimum graph bandwidth
    (~n^(2/3)) exceeds any affordable window, banding fails, and the
    ELL fallback's random gathers (~140M elem/s on TPU) cost ~5x the
    caller's blocked-Pallas exact matvec — measured 44 ms vs 8.3 ms per
    apply on the 280k-dof flagship EMI operator.  Matrix-free fine
    smoothing with the CURRENT operator is the standard lagged-AMG
    regime (the transfers are stale either way; measured
    iteration-neutral in the staleness stress, RESULTS.md).

    With ``banded`` every level/transfer operator additionally gets a
    block-banded dense layout (:func:`_csr_to_banded`) so the device
    V-cycle runs on batched dense matmuls instead of random gathers
    (TPU gathers move ~140M elem/s; slab matmul reads ride HBM at full
    bandwidth).  Levels where the layout is unprofitable keep ELL."""
    A = A0.tocsr()
    import os as _os
    import time as _time

    _timing = _os.environ.get("KNPEMI_SETUP_TIMING") == "1"
    _tl = [_time.perf_counter()]

    def _mark(stage):
        if _timing:
            t1 = _time.perf_counter()
            print(f"[mg] {stage}: {t1 - _tl[0]:.1f}s", flush=True)
            _tl[0] = t1

    if B is None:
        B = np.ones(A.shape[0])
    B = np.asarray(B)
    if B.ndim == 1:
        B = B[:, None]
    m_cand = B.shape[1]
    node_size = 1  # coarse levels carry m_cand dofs per supernode
    levels: List[MGLevel] = []
    while A.shape[0] > coarse_max * m_cand and len(levels) < max_levels:
        n = A.shape[0]
        diag = A.diagonal()
        diag = np.where(np.abs(diag) > 0, diag, 1.0)
        if node_size == 1:
            Af = strength_filter(A, theta, B=B[:, 0])
            agg, nc = vanek_aggregate(Af)
        else:
            # multi-candidate coarse levels: aggregate m-dof SUPERNODES
            # on the condensed |A| graph (running Vanek on the raw
            # 2x2-blocked operator stalls: phase-1 neighborhoods are
            # never fully free and coarsening stops)
            Co = sp.coo_matrix(abs(A))
            cond = sp.csr_matrix(
                (Co.data, (Co.row // node_size, Co.col // node_size)),
                shape=(n // node_size, n // node_size),
            )
            cond.sum_duplicates()
            agg_nodes, nc = vanek_aggregate(strength_filter(cond, theta))
            agg = np.repeat(agg_nodes, node_size)
            # dof-level filtered matrix for P smoothing (B-compatible)
            Af = strength_filter(A, theta, B=B[:, 0])
        # drop ISOLATED (diagonal-only) rows from the coarse space: their
        # error is handled by the smoother alone (standard SA practice
        # for Dirichlet-eliminated dofs), and keeping them as singleton
        # aggregates would carry them through every coarse level — the
        # sharded permuted-layout operators (parallel/sharded_mg.py)
        # carry O(N * R) identity padding rows that would otherwise stall
        # coarsening entirely.  Isolated rows have no strength-graph
        # neighbors, so their aggregates are always pure singletons.
        nnz_row = np.diff(A.indptr)
        iso = nnz_row <= 1
        if iso.any():
            keep_agg = np.ones(nc, bool)
            keep_agg[agg[iso]] = False
            remap = np.full(nc, -1, np.int64)
            remap[keep_agg] = np.arange(int(keep_agg.sum()))
            agg = np.where(iso, -1, remap[agg])
            nc = int(keep_agg.sum())
        if node_size == 1:
            # fold strength-isolated singletons into raw-graph neighbors
            # (coarsening stalls otherwise; see _attach_singletons)
            agg, nc = _attach_singletons(agg, nc, A)
        # relabel aggregates by their minimum fine index: fine dofs are
        # Morton-ordered, so this keeps coarse levels locality-ordered
        # too — without it the level-1 banded windows balloon ~4x
        # (measured 893 MB at 3-D res 2) because Vanek emits aggregates
        # in sweep order, not spatial order
        valid = agg >= 0
        first = np.full(nc, n, np.int64)
        np.minimum.at(first, agg[valid], np.flatnonzero(valid))
        ranks = np.empty(nc, np.int64)
        ranks[np.argsort(first, kind="stable")] = np.arange(nc)
        agg = np.where(valid, ranks[np.maximum(agg, 0)], -1)
        _mark(f"level {len(levels)} n={n}: aggregate")
        if nc * m_cand > 0.7 * n:
            break  # coarsening stalled: further levels cannot shrink
            # the coarse solve (the 20*coarse_max guard below refuses a
            # pathological dense eigh loudly instead of hanging)
        Pt, B = _tentative_prolongator(agg, nc, B)
        lam_f = _lam_max_jacobi(Af)
        df = Af.diagonal()
        df = np.where(df != 0, df, 1.0)
        P = (Pt - (omega_p / lam_f) * (sp.diags(1.0 / df) @ (Af @ Pt))).tocsr()

        lam = _lam_max_jacobi(A)
        _mark(f"level {len(levels)}: prolongator+lam")
        lv = MGLevel(
            n=n, diag=diag, omega=4.0 / (3.0 * lam), P_csr=P,
            steps=(
                _cheb_steps(lam, degree) if smoother == "cheby"
                else np.array([4.0 / (3.0 * lam)])
            ),
        )
        if levels or fine_ell:  # store the (lagged) operator in ELL form
            lv.a_cols, lv.a_vals = _csr_to_ell(A)
        lv.p_cols, lv.p_vals = _csr_to_ell(P, pad_diag=False)
        lv.pt_cols, lv.pt_vals = _csr_to_ell(P.T.tocsr(), pad_diag=False)
        _mark(f"level {len(levels)}: ELL")
        AP = (A @ P).tocsr()  # reused below for the Galerkin RAP
        if banded:
            # the finest level dominates V-cycle cost: give it a larger
            # slab budget (ELL fallback there means ~30x slower random
            # gathers per smoothing pass — the res-2 9 s/step failure).
            # Level 1 gets 1 GB: at the 840k-dof flagship its Galerkin
            # operator needs a ~550 MB f32 slab, and the ELL fallback
            # cost 19.8 ms/apply (~30% of the V-cycle) vs ~1.4 ms
            # banded.  Fine-level TRANSFERS get their own budget for
            # the same reason: level-0 P/Pt in ELL were 13+15 ms of
            # random gathers per cycle (~40% of the measured 68.5 ms
            # EMI V-cycle) where a ~0.7 GB slab read is ~1 ms; their
            # column span (~8x the RCM bandwidth for Pt) also needs a
            # wider window cap than operators do.
            from ..ops.pallas_ell import build_ellw

            # slab budgets: beyond these the dense-slab HBM read costs
            # more than the windowed-ELL kernel (measured crossover
            # ~1 GB: the 3.9 GB flagship KNP fine slab ran 14.8 ms vs
            # ~4 ms ellw; the 0.95 GB EMI level-1 slab 2.5 ms vs 4.2)
            cap = band_cap
            tcap = tband_cap
            if lv.a_cols is not None:
                lv.a_band = _csr_to_banded(A, mem_cap=cap, dtype=slab_dtype)
                if lv.a_band is None:
                    lv.a_ellw = build_ellw(A)
                # fused post-smooth operand (see MGLevel.ap_band); only
                # meaningful where the level smooths with its own lagged
                # operator — with the caller's matrix-free fine operator
                # a lagged AP would break the cycle's symmetry
                lv.ap_band = _csr_to_banded(
                    AP, mem_cap=tcap, dtype=slab_dtype
                )
                if lv.ap_band is None:
                    lv.ap_ellw = build_ellw(AP)
            lv.p_band = _csr_to_banded(P, mem_cap=tcap, dtype=slab_dtype)
            if lv.p_band is None:
                # one windowed-ELL layout of P serves BOTH directions
                # (gather = P, scatter = P^T) — see ops/pallas_ell.py
                lv.p_ellw = build_ellw(P)
                lv.pt_ellw = lv.p_ellw
            else:
                lv.pt_band = _csr_to_banded(
                    P.T.tocsr(), mem_cap=tcap, dtype=slab_dtype
                )
                if lv.pt_band is None:
                    lv.pt_ellw = build_ellw(P)
            _mark(f"level {len(levels)}: banded/ellw layout")
        if (not levels and fine_ell == "auto" and banded
                and lv.a_band is None and lv.a_ellw is None):
            # no storable fine layout (cube-bandwidth domain, wide and
            # unwindowable): drop the stored operator so DeviceMG
            # smooths level 0 with the caller's blocked-Pallas matvec
            # instead of ELL gathers
            lv.a_cols = lv.a_vals = None
            lv.ap_band = lv.ap_ellw = None
            _mark("level 0: banding failed -> matrix-free fine smoothing")
        levels.append(lv)

        A = (P.T @ AP).tocsr()
        _mark(f"level {len(levels) - 1}: Galerkin RAP")
        node_size = m_cand
    if A.shape[0] > 20 * coarse_max:
        raise RuntimeError(
            f"AMG coarsening stalled at n={A.shape[0]} "
            f"(coarse_max={coarse_max}); dense coarse solve refused"
        )
    lam, V = np.linalg.eigh(A.toarray())
    lmax = np.abs(lam).max() if len(lam) else 1.0
    ilam = np.where(np.abs(lam) > 1e-10 * lmax, 1.0 / lam, 0.0)
    return MGHierarchy(levels=levels, coarse_V=V, coarse_ilam=ilam, nu=nu,
                       gamma=gamma)


# ---------------------------------------------------------------------------
# device-side application
# ---------------------------------------------------------------------------
def _ell_mv(cols, vals, x):
    return (vals * x[cols]).sum(axis=1)


def _banded_mv(band, x):
    """y = A x with A in multi-window block-banded dense form (plus the
    sparse 'far' remainder).  On TPU each window runs in the Pallas
    kernel (ops/pallas_banded.py); elsewhere as a window gather +
    batched matmul."""
    n = band["n"]
    y = None
    for win in band["windows"]:
        W = win["W"]
        slabT = win["slabT"]
        R = slabT.shape[1]
        NB = slabT.shape[0] // W
        if band.get("pallas"):
            from ..ops.pallas_banded import banded_matvec

            ys = banded_matvec(
                slabT, win["w0_rows"], x, n, W
            ).astype(x.dtype)
        else:
            xp = jnp.pad(x, (0, W))
            idx = (
                win["w0"][:, None]
                + jnp.arange(W, dtype=win["w0"].dtype)[None, :]
            )
            xw = xp[idx]  # (NB, W) window gather
            # bf16 slabs are a STORAGE dtype: upcast after the (bf16)
            # HBM read and contract in x's dtype — rounding x instead
            # makes the preconditioner nonlinear and stalls CG
            ys = jax.lax.dot_general(
                slabT.reshape(NB, W, R).astype(x.dtype), xw[:, :, None],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=x.dtype,
            ).reshape(NB * R)[:n].astype(x.dtype)
        y = ys if y is None else y + ys
    if band["far_rows"].shape[0]:
        y = y.at[band["far_rows"]].add(
            band["far_vals"] * x[band["far_cols"]]
        )
    return y


def _banded_mv_batch(band, X):
    """Y = A X^T for X (B, n): the batched analog of :func:`_banded_mv`.
    On TPU each window's slab is read ONCE for all B vectors
    (ops/pallas_banded.py::banded_matvec_batch) — the KNP ion batch's
    V-cycle levels cost ~1x the single-vector apply instead of Bx."""
    n = band["n"]
    y = None
    for win in band["windows"]:
        W = win["W"]
        slabT = win["slabT"]
        R = slabT.shape[1]
        NB = slabT.shape[0] // W
        if band.get("pallas"):
            from ..ops.pallas_banded import banded_matvec_batch

            ys = banded_matvec_batch(
                slabT, win["w0_rows"], X, n, W
            ).astype(X.dtype)
        else:
            xp = jnp.pad(X, ((0, 0), (0, W)))
            idx = (
                win["w0"][:, None]
                + jnp.arange(W, dtype=win["w0"].dtype)[None, :]
            )
            xw = xp[:, idx]  # (B, NB, W)
            ys = jnp.einsum(
                "nwr,bnw->bnr", slabT.reshape(NB, W, R).astype(X.dtype), xw,
                precision=jax.lax.Precision.DEFAULT,
            ).reshape(X.shape[0], NB * R)[:, :n].astype(X.dtype)
        y = ys if y is None else y + ys
    if band["far_rows"].shape[0]:
        y = y.at[:, band["far_rows"]].add(
            band["far_vals"] * X[:, band["far_cols"]]
        )
    return y


def _csr_fill_banded(A: sp.csr_matrix, band):
    """Refill a block-banded layout with the values of ``A``, keeping the
    window geometry (w0, W) and therefore every array shape IDENTICAL to
    ``band``.  Requires A to have the same sparsity pattern as the matrix
    the layout was built from (true for operator value refreshes: the
    mesh and the weak form's structure are static)."""
    windows, fr, fc, fv, n, m = band
    A = A.tocsr()
    assert A.shape == (n, m)
    indptr, indices, data = A.indptr, A.indices, A.data
    rows = np.repeat(np.arange(n), np.diff(indptr))
    R = windows[0][0].shape[1]
    blk = rows // R
    remaining = np.ones(A.nnz, bool)
    new_windows = []
    for slabT_old, w0, W in windows:
        loc = indices - w0[blk]
        inside = remaining & (loc >= 0) & (loc < W)
        slabT = np.zeros_like(slabT_old)
        slabT[blk[inside] * W + loc[inside], rows[inside] % R] = data[inside]
        new_windows.append((slabT, w0, W))
        remaining = remaining & ~inside
    far_rows = rows[remaining].astype(np.int32)
    far_cols = indices[remaining].astype(np.int32)
    far_vals = data[remaining]
    # tolerate small pattern drift (f32 kappa rounding creates/destroys
    # exact zeros in the assembled CSR): the device layout's shape is
    # FROZEN, so pad missing entries with zeros and drop the smallest
    # extras (preconditioner-internal; values are near roundoff)
    target = len(fr)
    if len(far_rows) < target:
        pad = target - len(far_rows)
        far_rows = np.concatenate([far_rows, np.zeros(pad, np.int32)])
        far_cols = np.concatenate([far_cols, np.zeros(pad, np.int32)])
        far_vals = np.concatenate([far_vals, np.zeros(pad, far_vals.dtype)])
    elif len(far_rows) > target:
        keep = np.argsort(np.abs(far_vals))[::-1][:target]
        far_rows, far_cols, far_vals = (
            far_rows[keep], far_cols[keep], far_vals[keep]
        )
    return new_windows, far_rows, far_cols, far_vals, n, m


def refresh_hierarchy(hier: MGHierarchy, A_hat_new: sp.csr_matrix,
                      max_drop_frac: float = 1e-5) -> MGHierarchy:
    """Value-refresh of a lagged hierarchy for the CURRENT operator,
    keeping every array shape fixed so the refreshed DeviceMG can be
    swapped into a compiled step without recompilation (DeviceMG travels
    as a jit argument, sim/stepper.py::_chunk).

    Transfer operators are FROZEN at their setup-time values (standard
    practice for modest coefficient drift — the reference's hypre setup
    is likewise reused across solves within a step); level operators are
    recomputed by Galerkin products A_{l+1} = P_l^T A_l P_l with the
    frozen P_l, so smoothers and coarse corrections track the current
    coefficients.

    Pattern-drift contract: SMALL drift is tolerated — the frozen-shape
    ELL/banded refills zero-pad entries that disappeared and drop the
    smallest new ones (f32 kappa rounding creates/destroys exact zeros
    in the assembled CSR; dropped values are near roundoff).  Raises
    ValueError when the refill would discard more than ``max_drop_frac``
    of a level's total |A| mass, or on a level-size mismatch — genuine
    structural drift; the caller should fall back to a full
    build_hierarchy + recompile.  The default tolerates 1e-5: the 300 ms
    flagship campaign measured 3.66e-6 drift at its K_e excursion peak
    (f32-rounding entry migration, smoother-level only), and a 1e-6
    guard refused every one of its 14 in-run refreshes — harmless there
    (staleness is measured neutral, RESULTS.md "MG staleness stress")
    but it silently turns mg_refresh_every into dead work.  A drop of
    1e-5 of |A| mass perturbs only the SMOOTHER + coarse correction (the
    Krylov solve uses the exact fine operator), far below the V-cycle's
    own approximation error.  (sim/stepper.py warns and keeps the
    stale hierarchy).
    """
    A = A_hat_new.tocsr()
    new_levels: List[MGLevel] = []
    for ilev, lv in enumerate(hier.levels):
        if A.shape[0] != lv.n:
            raise ValueError("level size mismatch during refresh")
        diag = A.diagonal()
        diag = np.where(np.abs(diag) > 0, diag, 1.0)
        lam = _lam_max_jacobi(A)
        deg = 1 if lv.steps is None else len(lv.steps)
        nl = MGLevel(
            n=lv.n, diag=diag, omega=4.0 / (3.0 * lam),
            steps=(
                _cheb_steps(lam, deg) if deg > 1
                else np.array([4.0 / (3.0 * lam)])
            ),
            p_cols=lv.p_cols, p_vals=lv.p_vals,
            pt_cols=lv.pt_cols, pt_vals=lv.pt_vals,
            p_band=lv.p_band, pt_band=lv.pt_band,
            # transfer ellw layouts are frozen with P itself
            p_ellw=getattr(lv, "p_ellw", None),
            pt_ellw=getattr(lv, "pt_ellw", None),
            P_csr=lv.P_csr,
        )
        total_mass = float(np.abs(A.data).sum())
        if lv.a_cols is not None:
            nl.a_cols, nl.a_vals = _csr_to_ell(A, K=lv.a_vals.shape[1])
            kept = float(np.abs(nl.a_vals).sum())
            if total_mass > 0 and (total_mass - kept) > max_drop_frac * total_mass:
                raise ValueError(
                    f"ELL refill at level {ilev} dropped "
                    f"{(total_mass - kept) / total_mass:.2e} of |A| mass "
                    f"(> {max_drop_frac:.0e}): sparsity pattern drifted"
                )
        if lv.a_band is not None:
            nl.a_band = _csr_fill_banded(A, lv.a_band)
            windows, _, _, fv, _, _ = nl.a_band
            kept = float(
                sum(np.abs(w[0]).sum() for w in windows) + np.abs(fv).sum()
            )
            if total_mass > 0 and (total_mass - kept) > max_drop_frac * total_mass:
                raise ValueError(
                    f"banded refill at level {ilev} dropped "
                    f"{(total_mass - kept) / total_mass:.2e} of |A| mass "
                    f"(> {max_drop_frac:.0e}): sparsity pattern drifted"
                )
        if getattr(lv, "a_ellw", None) is not None:
            # frozen-shape windowed-ELL refill: build_ellw(force_shape)
            # raises ValueError itself on structural drift
            from ..ops.pallas_ell import build_ellw

            e = lv.a_ellw
            nl.a_ellw = build_ellw(
                A, force_shape=(e.C, e.K, e.Wr, e.G, e.far_cap)
            )
        AP = (A @ lv.P_csr).tocsr()  # reused for the Galerkin RAP below
        if getattr(lv, "ap_ellw", None) is not None:
            from ..ops.pallas_ell import build_ellw

            e = lv.ap_ellw
            nl.ap_ellw = build_ellw(
                AP, force_shape=(e.C, e.K, e.Wr, e.G, e.far_cap)
            )
        if getattr(lv, "ap_band", None) is not None:
            # frozen P + value-refreshed A: AP's sparsity is static up to
            # the same f32-rounding drift the a_band refill tolerates
            nl.ap_band = _csr_fill_banded(AP, lv.ap_band)
            windows, _, _, fv, _, _ = nl.ap_band
            kept = float(
                sum(np.abs(w[0]).sum() for w in windows) + np.abs(fv).sum()
            )
            ap_mass = float(np.abs(AP.data).sum())
            if ap_mass > 0 and (ap_mass - kept) > max_drop_frac * ap_mass:
                raise ValueError(
                    f"AP banded refill at level {ilev} dropped "
                    f"{(ap_mass - kept) / ap_mass:.2e} of |AP| mass "
                    f"(> {max_drop_frac:.0e}): sparsity pattern drifted"
                )
        new_levels.append(nl)
        A = (lv.P_csr.T @ AP).tocsr()
    lam, V = np.linalg.eigh(A.toarray())
    lmax = np.abs(lam).max() if len(lam) else 1.0
    ilam = np.where(np.abs(lam) > 1e-10 * lmax, 1.0 / lam, 0.0)
    # NB: when hier.perm is set, A_hat_new must arrive ALREADY permuted
    # (the caller permutes with the same stored perm — sim/stepper.py)
    return MGHierarchy(levels=new_levels, coarse_V=V, coarse_ilam=ilam,
                       nu=hier.nu, gamma=hier.gamma,
                       perm=getattr(hier, "perm", None))


@jax.tree_util.register_pytree_node_class
class DeviceMG:
    """Jit-safe symmetric V-cycle; the finest operator is supplied at call
    time (matrix-free with current coefficients), coarser operators are
    the lagged ELL/banded matrices.

    Registered as a pytree (arrays dynamic, scaffolding static) so the
    hierarchy can be passed as a jit ARGUMENT: the slabs then travel as
    runtime buffers instead of HLO constants — mandatory for remote-
    compile setups with bounded request sizes, and the basis for
    refreshing the lagged hierarchy without recompiling the step."""

    def __init__(self, levels, coarse_V, coarse_ilam, nu, fine_diag=None,
                 gamma: int = 1, perm=None, iperm=None,
                 post_smooth: bool = True):
        self.levels = levels
        self.coarse_V = coarse_V
        self.coarse_ilam = coarse_ilam
        self.nu = nu
        self.gamma = gamma
        # post_smooth=False gives the asymmetric V(1,0) cycle: legal as
        # a flexible-GMRES preconditioner (the KNP path stores Z[j] =
        # M(V[j]), solvers/gmres.py), NOT for CG (EMI), which needs a
        # symmetric M.  Skips the post pass on every level — at the
        # flagship the fine post apply is the V-cycle's largest single
        # op.
        self.post_smooth = post_smooth
        # raw (unequilibrated) diagonal of the fine operator this
        # hierarchy was built from.  Solvers use it as a LAGGED
        # equilibration scale, skipping the per-solve diag assembly:
        # the scale only normalizes (any positive s gives the exact
        # null direction S^-1 1), and it refreshes with the hierarchy.
        self.fine_diag = fine_diag
        # optional global-RCM permutation (MGHierarchy.perm): the cycle
        # runs in permuted space; apply() gathers the residual in and
        # the correction out (fine_diag stays in SOLVER layout)
        self.perm = perm
        self.iperm = iperm

    def tree_flatten(self):
        flat, treedef = jax.tree_util.tree_flatten(
            (self.levels, self.coarse_V, self.coarse_ilam, self.fine_diag,
             self.perm, self.iperm)
        )
        dyn = [x if isinstance(x, jax.Array) else None for x in flat]
        static = tuple(None if isinstance(x, jax.Array) else x for x in flat)
        return dyn, (treedef, static, self.nu, self.gamma, self.post_smooth)

    @classmethod
    def tree_unflatten(cls, aux, dyn):
        treedef, static, nu, gamma, post_smooth = aux
        flat = [d if s is None else s for d, s in zip(dyn, static)]
        levels, V, ilam, fine_diag, perm, iperm = (
            jax.tree_util.tree_unflatten(treedef, flat)
        )
        return cls(levels, V, ilam, nu, fine_diag, gamma, perm, iperm,
                   post_smooth)

    @staticmethod
    def _ellw_interpret() -> bool:
        return jax.devices()[0].platform != "tpu"

    def _op(self, i: int, A0: Callable):
        lv = self.levels[i]
        if lv.get("a_band") is not None:
            return lambda x: _banded_mv(lv["a_band"], x)
        if lv.get("a_ellw") is not None:
            from ..ops.pallas_ell import ellw_matvec

            interp = self._ellw_interpret()
            return lambda x: ellw_matvec(lv["a_ellw"], x, interp)
        if i == 0 and lv["a_cols"] is None:
            return A0
        return lambda x: _ell_mv(lv["a_cols"], lv["a_vals"], x)

    @classmethod
    def _transfer(cls, lv, which, x):
        band = lv.get(which + "_band")
        if band is not None:
            return _banded_mv(band, x)
        ellw = lv.get(which + "_ellw")
        if ellw is not None:
            # the stored layout is always of P; restriction applies it
            # transposed (ops/pallas_ell.py one-layout-two-directions)
            from ..ops.pallas_ell import ellw_matvec, ellw_rmatvec

            fn = ellw_rmatvec if which == "pt" else ellw_matvec
            return fn(ellw, x, cls._ellw_interpret())
        return _ell_mv(lv[which + "_cols"], lv[which + "_vals"], x)

    def _op_batch(self, i: int, A0b: Callable):
        lv = self.levels[i]
        if lv.get("a_band") is not None:
            return lambda X: _banded_mv_batch(lv["a_band"], X)
        if lv.get("a_ellw") is not None:
            from ..ops.pallas_ell import ellw_matvec_batch

            interp = self._ellw_interpret()
            return lambda X: ellw_matvec_batch(lv["a_ellw"], X, interp)
        if i == 0 and lv["a_cols"] is None:
            return A0b
        return lambda X: jax.vmap(
            lambda x: _ell_mv(lv["a_cols"], lv["a_vals"], x)
        )(X)

    @classmethod
    def _transfer_batch(cls, lv, which, X):
        band = lv.get(which + "_band")
        if band is not None:
            return _banded_mv_batch(band, X)
        ellw = lv.get(which + "_ellw")
        if ellw is not None:
            from ..ops.pallas_ell import (
                ellw_matvec_batch, ellw_rmatvec_batch,
            )

            fn = ellw_rmatvec_batch if which == "pt" else ellw_matvec_batch
            return fn(ellw, X, cls._ellw_interpret())
        return jax.vmap(
            lambda x: _ell_mv(lv[which + "_cols"], lv[which + "_vals"], x)
        )(X)

    def _fused_post(self, i: int, lv, k: int) -> bool:
        """Use the AP-product layout for the post-smoothing residual
        (res1 - AP xc) instead of a second full-operator apply.  Valid
        only for the plain V(1,1) Jacobi cycle (k = nu = 1) on a level
        whose smoother runs the LAGGED operator — AP is lagged, so
        pairing it with the caller's matrix-free current-coefficient
        fine operator would break the cycle's symmetry for CG.

        Fusing must also be CHEAPER: for a banded AP it reads ~1/8 the
        slab of a second operator apply, but a windowed-ELL AP pays the
        one-hot MXU cost of its own density — AP = A@P is denser than A
        (measured at the flagship KNP fine level: AP-ellw ~9.5 ms vs
        A-ellw 5.1), so ellw-AP fuses only when its static kernel-work
        product NCH*Wr*K*C is below the operator's own."""
        if k != 1 or self.nu != 1:
            return False
        lagged = (
            lv.get("a_band") is not None
            or lv.get("a_ellw") is not None
            or lv.get("a_cols") is not None
        )
        if not (lagged or i > 0):
            return False
        if lv.get("ap_band") is not None:
            return True
        ap = lv.get("ap_ellw")
        if ap is None:
            return False
        a = lv.get("a_ellw")
        if a is not None:
            return ap.NCH * ap.Wr * ap.K * ap.C <= a.NCH * a.Wr * a.K * a.C
        if lv.get("a_band") is not None:
            return False  # banded operator applies ride HBM; ellw AP loses
        return True  # plain-ELL operator: random gathers lose to ellw AP

    def _ap_apply(self, lv, xc):
        if lv.get("ap_band") is not None:
            return _banded_mv(lv["ap_band"], xc)
        from ..ops.pallas_ell import ellw_matvec

        return ellw_matvec(lv["ap_ellw"], xc, self._ellw_interpret())

    def _ap_apply_batch(self, lv, Xc):
        if lv.get("ap_band") is not None:
            return _banded_mv_batch(lv["ap_band"], Xc)
        from ..ops.pallas_ell import ellw_matvec_batch

        return ellw_matvec_batch(lv["ap_ellw"], Xc, self._ellw_interpret())

    def apply(self, A0: Callable, r: jnp.ndarray) -> jnp.ndarray:
        if self.perm is not None:
            if self.levels and self.levels[0].get("dinv_solver") is not None:
                # matrix-free permuted fine level: smooth in SOLVER
                # layout with A0 directly; permute only at the
                # level-0/1 transfer boundary (2 gathers per cycle
                # instead of 2 per fine operator application)
                return self._fine_solver_cycle(
                    A0, r,
                    gather=lambda v: v[self.perm],
                    scatter=lambda v: v[self.iperm],
                    transfer=self._transfer, cycle=self._cycle,
                    op=self._op,
                )
            # the hierarchy lives in globally-RCM-permuted space; A0 is
            # only consulted when level 0 has no lagged operator, so
            # wrap it back through the permutation for that case
            A0p = lambda x: A0(x[self.iperm])[self.perm]
            return self._cycle(0, A0p, r[self.perm])[self.iperm]
        return self._cycle(0, A0, r)

    def apply_batch(self, A0b: Callable, R: jnp.ndarray) -> jnp.ndarray:
        """V-cycle on B residuals at once (R is (B, n)).  Identical
        arithmetic to `apply` per row, but every banded level reads its
        slab once for the whole batch — the KNP ion-batched GMRES path's
        preconditioner.  ``A0b`` is the batched fine operator (unused
        when level 0 carries a lagged banded/ELL operator)."""
        if self.perm is not None:
            if self.levels and self.levels[0].get("dinv_solver") is not None:
                return self._fine_solver_cycle(
                    A0b, R,
                    gather=lambda V: V[:, self.perm],
                    scatter=lambda V: V[:, self.iperm],
                    transfer=self._transfer_batch, cycle=self._cycle_batch,
                    op=self._op_batch,
                )
            A0p = lambda X: A0b(X[:, self.iperm])[:, self.perm]
            return self._cycle_batch(0, A0p, R[:, self.perm])[:, self.iperm]
        return self._cycle_batch(0, A0b, R)

    def _fine_solver_cycle(self, A0, r, *, gather, scatter, transfer,
                           cycle, op):
        """Level-0 smoothing in the caller's (solver) dof layout; the
        coarse sub-cycle runs in the hierarchy's RCM-permuted layout.
        Arithmetic is identical to `_cycle` with the perm-wrapped A0 —
        D^-1 commutes with the permutation — minus 2 full-vector
        gathers per fine operator application."""
        lv = self.levels[0]
        dinv = lv["dinv_solver"]
        steps = lv["steps"]
        k = steps.shape[0]
        x = steps[0] * (dinv * r)
        for j in range(1, k):
            x = x + steps[j] * (dinv * (r - A0(x)))
        for _ in range(self.nu - 1):
            for j in range(k):
                x = x + steps[j] * (dinv * (r - A0(x)))
        res1 = r - A0(x)
        rc = transfer(lv, "pt", gather(res1))
        xc = cycle(1, None, rc)  # coarse levels are lagged: A0 unused
        if len(self.levels) > 1:
            Ac = op(1, None)
            for _ in range(self.gamma - 1):
                xc = xc + cycle(1, None, rc - Ac(xc))
        x = x + scatter(transfer(lv, "p", xc))
        if self.post_smooth:
            for _ in range(self.nu):
                for j in range(k - 1, -1, -1):
                    x = x + steps[j] * (dinv * (r - A0(x)))
        return x

    def _cycle_batch(self, i: int, A0b: Callable, r: jnp.ndarray):
        if i == len(self.levels):
            return ((r @ self.coarse_V) * self.coarse_ilam) @ self.coarse_V.T
        lv = self.levels[i]
        A = self._op_batch(i, A0b)
        dinv = lv["dinv"]
        steps = lv["steps"]
        k = steps.shape[0]
        x = steps[0] * (dinv * r)
        for j in range(1, k):
            x = x + steps[j] * (dinv * (r - A(x)))
        for _ in range(self.nu - 1):
            for j in range(k):
                x = x + steps[j] * (dinv * (r - A(x)))
        res1 = r - A(x)
        rc = self._transfer_batch(lv, "pt", res1)
        xc = self._cycle_batch(i + 1, A0b, rc)
        if i + 1 < len(self.levels):
            Ac = self._op_batch(i + 1, A0b)
            for _ in range(self.gamma - 1):
                xc = xc + self._cycle_batch(i + 1, A0b, rc - Ac(xc))
        x = x + self._transfer_batch(lv, "p", xc)
        if not self.post_smooth:
            return x
        if self._fused_post(i, lv, k):
            # res(x + P xc) = res1 - (AP) xc: same arithmetic, ~1/8 the
            # slab read of a second full-operator apply (see MGLevel)
            res2 = res1 - self._ap_apply_batch(lv, xc)
            return x + steps[0] * (dinv * res2)
        for _ in range(self.nu):
            for j in range(k - 1, -1, -1):
                x = x + steps[j] * (dinv * (r - A(x)))
        return x

    def _cycle(self, i: int, A0: Callable, r: jnp.ndarray) -> jnp.ndarray:
        if i == len(self.levels):
            return self.coarse_V @ (self.coarse_ilam * (self.coarse_V.T @ r))
        lv = self.levels[i]
        A = self._op(i, A0)
        dinv = lv["dinv"]
        steps = lv["steps"]
        k = steps.shape[0]
        # polynomial (Chebyshev-Richardson) pre-smoothing; step values
        # are runtime scalars so a refreshed hierarchy swaps in without
        # recompiling.  Post-smoothing reverses the step order to keep
        # the V-cycle symmetric for CG.
        x = steps[0] * (dinv * r)
        for j in range(1, k):
            x = x + steps[j] * (dinv * (r - A(x)))
        for _ in range(self.nu - 1):
            for j in range(k):
                x = x + steps[j] * (dinv * (r - A(x)))
        res1 = r - A(x)
        rc = self._transfer(lv, "pt", res1)
        xc = self._cycle(i + 1, A0, rc)
        # W-cycle (gamma=2): re-solve the coarse problem on its own
        # residual — the recursion, not the interpolation, limits the
        # V-cycle here (see MGHierarchy docstring)
        if i + 1 < len(self.levels):
            Ac = self._op(i + 1, A0)
            for _ in range(self.gamma - 1):
                xc = xc + self._cycle(i + 1, A0, rc - Ac(xc))
        x = x + self._transfer(lv, "p", xc)
        if not self.post_smooth:
            return x
        if self._fused_post(i, lv, k):
            # res(x + P xc) = res1 - (AP) xc: same arithmetic, ~1/8 the
            # slab read of a second full-operator apply (see MGLevel)
            res2 = res1 - self._ap_apply(lv, xc)
            return x + steps[0] * (dinv * res2)
        for _ in range(self.nu):
            for j in range(k - 1, -1, -1):
                x = x + steps[j] * (dinv * (r - A(x)))
        return x
