"""The coupled KNP-EMI time stepper: one jitted, scan-able step.

The reference's 5-phase time loop lives in every driver script
(run_2D.py:341-372):

  [1] solve ODEs (per membrane dof, serial LSODA)
  [2] EMI solve (reassemble + PETSc CG/AMG)
  [3] KNP solve (reassemble + PETSc GMRES/AMG)
  [4] algebraic update (c_prev <- c, eliminated ion, Nernst, phi_M)
  [5] write output

Here phases 1-4 are a single pure function ``Simulation.step(state) ->
state`` (SURVEY.md section 7, design delta 4) executed under ``jax.jit``
and batched into ``lax.scan`` chunks of ``save_every`` steps; host
callbacks happen only between chunks (checkpoint/trace recording).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.geometry import DiscreteGeometry
from ..systems.types import Ion, PhysicalParams, SimState
from ..systems.emi import EMISystem
from ..systems.knp import KNPSystem
from ..systems.coupling import (
    set_initial_conditions,
    update_pde_variables,
)
from ..solvers.api import EMISolver, KNPSolver
from ..models.engine import MembraneModel, update_ode_variables


@dataclasses.dataclass
class SolverOptions:
    direct: bool = False
    rtol_emi: float = 1e-5
    atol_emi: float = 1e-40
    rtol_knp: float = 1e-7
    atol_knp: float = 2e-40
    maxiter: int = 1000
    restart: int = 30
    # minimum KNP GMRES iterations before the convergence test may stop
    # the solve.  5 is PETSc ksp_min_it parity (reference
    # pdeSolver.py:100); performance-tuned drivers set 2 (certified —
    # see RESULTS.md "KNP solver-option campaigns").
    min_iter_knp: int = 5
    # KNP V-cycle post-smoothing.  False gives the asymmetric V(1,0)
    # cycle — legal as a flexible-GMRES preconditioner (the KNP solve
    # stores Z[j] = M(V[j]); solvers/gmres.py), NOT for the EMI CG,
    # whose hierarchy always keeps the symmetric V(1,1).  Skipping the
    # post pass drops the V-cycle's largest single op; whether the
    # extra Krylov iterations eat the saving is workload-dependent —
    # measure with tools/profile_knp.py before flipping.
    knp_post_smooth: bool = True
    # EMI preconditioner: 'mg' (smoothed-aggregation AMG, the BoomerAMG
    # analog, solvers/mg.py) or 'jacobi' (deflated Jacobi fallback)
    emi_precond: str = "mg"
    # what Simulation.run does when a Krylov solve fails to converge:
    # 'raise' (reference parity: ksp_error_if_not_converged,
    # pdeSolver.py:20,27,95), 'warn', or 'ignore'
    on_divergence: str = "raise"
    # refresh the lagged EMI hierarchy's values from the current
    # concentrations every N steps (0 = never).  Shapes are frozen, so
    # the refresh swaps into the compiled chunk without recompiling
    # (refresh_mg docstring); the cost is one host assembly + RAP sweep.
    mg_refresh_every: int = 0
    # run that rebuild on a background host thread (pure numpy/scipy —
    # no jax in the worker) and swap the refreshed hierarchy in at a
    # later chunk boundary: the ~1 s rebuild then overlaps device
    # compute instead of stalling the loop (~20% of the flagship's
    # wall time at mg_refresh_every=100).
    mg_refresh_async: bool = True
    # compensated (double-single) Krylov inner products: closes most of
    # the f32-vs-f64 dot-product gap on TPU at ~6 VPU flops/element
    # (solvers/precision.py).  None -> auto: on for f32 runs.
    compensated_dots: Optional[bool] = None
    # SA strength threshold.  0.04, not the textbook 0.25/0.08: larger
    # thetas lose mesh-independence on the tortuosity-contrasted tissue
    # operator (measured sweep: RESULTS.md "Flagship EMI iterations").
    mg_theta: float = 0.04
    mg_coarse_max: int = 800
    mg_nu: int = 1
    # V-cycle smoother: 'jacobi' (1 damped pass, default) or 'cheby'
    # (Chebyshev-Richardson polynomial of mg_degree).  With B-compatible
    # lumping (solvers/mg.py::strength_filter) iteration counts are
    # mesh-independent under plain Jacobi (EMI 19/23 at 3-D res 1/2)
    # and Chebyshev's small iteration gain (18 at res 2) never repays
    # its 3.5x smoothing cost.  'auto' = 'jacobi' (kept for config
    # compatibility).
    mg_smoother: str = "auto"
    mg_degree: int = 3
    # block-banded dense V-cycle operators: a TPU-only win (dense slab
    # matmuls ride HBM at full bandwidth vs ~140M elem/s random gathers;
    # on CPU the ~100x FLOP inflation is compute-bound and loses to ELL).
    # None -> auto by platform; KNPEMI_BANDED=0/1 overrides.
    mg_banded: Optional[bool] = None
    # store the FINE-level smoothing slab in bfloat16 (storage dtype
    # only: the contraction upcasts after the HBM read, so the
    # preconditioner stays a fixed linear map — rounding x instead
    # stalled CG 19 -> 137; rounding the COARSE Galerkin levels breaks
    # B-compatible near-null annihilation and stalls outright).
    # Measured on TPU: the halved fine-slab read does NOT pay for the
    # extra EMI iterations the 0.4% operator perturbation costs
    # (res 1: 64.8 ms/step EMI 10 vs f32 ~55/EMI 8; res 2: 636 ms
    # EMI 12 vs 585/EMI 9).  Default OFF; KNPEMI_BAND_BF16=1 or this
    # flag opts in.
    mg_band_bf16: Optional[bool] = None


class Simulation:
    """Owns the systems, solvers and membrane models for one scenario."""

    def __init__(
        self,
        geom: DiscreteGeometry,
        ions: List[Ion],
        params: PhysicalParams,
        mem_models: List[MembraneModel],
        solver_options: Optional[SolverOptions] = None,
        source_gate: Optional[Callable] = None,
        splitting_scheme: bool = True,
        dtype=jnp.float64,
        use_pallas: Optional[bool] = None,
    ):
        self.geom = geom
        self.ions = ions
        self.params = params
        self.dtype = dtype
        self.mem_models = {mm.tag: mm for mm in mem_models}
        opts = solver_options or SolverOptions()
        self.opts = opts
        if use_pallas is None:
            # the blocked one-hot-matmul assembly targets the TPU MXU;
            # XLA kernels are faster on CPU
            import os

            env = os.environ.get("KNPEMI_PALLAS")
            if env is not None:
                use_pallas = env == "1"
            else:
                # Mosaic cannot lower Pallas kernels with global x64 on:
                # require TPU AND x64 disabled (see knpemi_tpu.__init__)
                use_pallas = (
                    jax.devices()[0].platform == "tpu"
                    and not jax.config.jax_enable_x64
                )
        self._use_pallas = use_pallas

        # stage timing for slow hosts (KNPEMI_SETUP_TIMING=1): flagship-
        # scale setup is minutes even warm; this says where they go
        import os as _os

        _timing = _os.environ.get("KNPEMI_SETUP_TIMING") == "1"
        _t0 = time.perf_counter()

        def _mark(stage):
            nonlocal _t0
            if _timing:
                t1 = time.perf_counter()
                print(f"[setup] {stage}: {t1 - _t0:.1f}s", flush=True)
                _t0 = t1

        self.emi_sys = EMISystem(
            geom, ions, params, splitting_scheme, dtype=dtype,
            use_pallas=use_pallas,
        )
        _mark("EMISystem (kernels+blocking)")
        self.knp_sys = KNPSystem(
            geom, ions, params, splitting_scheme, dtype=dtype,
            use_pallas=use_pallas,
        )
        _mark("KNPSystem (kernels+blocking)")
        comp = opts.compensated_dots
        if comp is None:
            comp = dtype == jnp.float32
        if comp:
            from ..solvers.precision import dot2 as _dot
        else:
            _dot = jnp.vdot
        self.emi_solver = EMISolver(
            self.emi_sys, direct=opts.direct, rtol=opts.rtol_emi,
            atol=opts.atol_emi, maxiter=opts.maxiter, dot=_dot,
        )
        self.knp_solver = KNPSolver(
            self.knp_sys, direct=opts.direct, rtol=opts.rtol_knp,
            atol=opts.atol_knp, maxiter=opts.maxiter, restart=opts.restart,
            min_iter=opts.min_iter_knp, dot=_dot,
        )
        # time gate for the ECS source term (pulsed K+/Na- injection in the
        # benchmark/astrocyte drivers); must be jax-traceable t -> scalar
        self.source_gate = source_gate or (lambda t: 1.0)
        if opts.mg_banded is None:
            import os

            env = os.environ.get("KNPEMI_BANDED")
            if env is not None:
                self._mg_banded = env == "1"
            else:
                self._mg_banded = jax.devices()[0].platform == "tpu"
        else:
            self._mg_banded = opts.mg_banded
        if opts.mg_band_bf16 is None:
            import os

            env = os.environ.get("KNPEMI_BAND_BF16")
            self._band_dtype = jnp.bfloat16 if env == "1" else None
        else:
            self._band_dtype = jnp.bfloat16 if opts.mg_band_bf16 else None
        if not opts.direct and opts.emi_precond == "mg":
            self._setup_emi_mg()
            _mark("EMI MG hierarchy")
            self._setup_knp_mg()
            _mark("KNP MG hierarchies")
        self._step_jit = None
        self._chunk_jit = {}

    # ------------------------------------------------------------------

    def _smoother_for(self, n: int):
        sm = self.opts.mg_smoother
        if sm == "auto":
            sm = "jacobi"
        return sm

    def _emi_Ahat(self, c):
        """Assemble the equilibrated EMI operator for concentrations c
        (host scipy); returns (A_hat, s) with A_hat = S A S, S=diag(s)."""
        import scipy.sparse as sp
        from ..solvers import direct as direct_mod

        kappa = {t: np.asarray(v) for t, v in self.emi_sys.kappa(c).items()}
        A0 = self._assemble_emi_cached(kappa)
        d = A0.diagonal()
        self._emi_diag0 = np.where(d != 0, d, 1.0)
        s = 1.0 / np.sqrt(np.abs(self._emi_diag0))
        S = sp.diags(s)
        return (S @ A0 @ S).tocsr(), s

    def _assemble_emi_cached(self, kappa: dict):
        """Disk-cached t=0 EMI assembly, keyed by the geometry arrays,
        C_phi and the kappa values.  The single-core host pays several
        minutes of COO accumulation at flagship scale (~1.6M tets) on
        EVERY invocation — bench re-runs, profiling, drivers — while the
        operator is a pure function of this content.  Uses the MG cache
        directory (KNPEMI_MG_CACHE; empty string disables)."""
        import hashlib
        import os
        import scipy.sparse as sp
        from ..solvers import direct as direct_mod

        cache_dir = os.environ.get(
            "KNPEMI_MG_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".mg_cache"),
        )
        if not cache_dir:
            return direct_mod.assemble_emi_csr(self.emi_sys, kappa)
        h = hashlib.sha256()
        h.update(b"emi_csr_v1")
        h.update(np.float64(self.params.C_phi).tobytes())
        for t in self.emi_sys.tags:
            s_ = self.geom.subdomains[t]
            for arr in (s_.cells, s_.grads, s_.vols, kappa[t]):
                a = np.ascontiguousarray(np.asarray(arr))
                h.update(str(a.shape).encode())
                h.update(a.tobytes())
        for m, mem in sorted(self.geom.membranes.items()):
            for arr in (mem.facet_idofs, mem.facet_edofs, mem.areas,
                        np.int64(mem.cell_tag)):
                a = np.ascontiguousarray(np.asarray(arr))
                h.update(a.tobytes())
        path = os.path.join(cache_dir, "emi_" + h.hexdigest()[:32] + ".npz")
        if os.path.exists(path):
            try:
                z = np.load(path)
                return sp.csr_matrix(
                    (z["data"], z["indices"], z["indptr"]),
                    shape=tuple(z["shape"]),
                )
            except Exception:
                pass  # corrupt entry: reassemble below
        A0 = direct_mod.assemble_emi_csr(self.emi_sys, kappa)
        # np.savez appends ".npz" unless the name already ends with it
        tmp = f"{path}.{os.getpid()}.tmp.npz"
        try:
            from ..utils.critical import critical_section

            with critical_section():
                os.makedirs(cache_dir, exist_ok=True)
                np.savez(tmp, data=A0.data, indices=A0.indices,
                         indptr=A0.indptr, shape=np.asarray(A0.shape))
                os.replace(tmp, path)
        except BaseException as exc:
            try:
                os.remove(tmp)
            except OSError:
                pass
            if not isinstance(exc, OSError):
                raise
        return A0

    def _setup_emi_mg(self):
        """Build the lagged EMI multigrid hierarchy from the initial
        conductivity (host, once; see solvers/mg.py docstring)."""
        from ..solvers.mg import build_hierarchy_cached
        from ..utils.logging import setup_mark as _smark

        c0 = set_initial_conditions(self.geom, self.ions, dtype=jnp.float64)
        _smark("emi_mg: initial conditions")
        A_hat, s = self._emi_Ahat(c0)
        _smark("emi_mg: assemble+equilibrate")
        # Global RCM over the COUPLED solver-layout graph: the per-tag
        # concatenation puts membrane-coupled ECS/ICS dofs ~n/3 apart,
        # which defeats the banded window layout (the flagship tissue
        # operator fell back to fine-level ELL random gathers at
        # 150 ms/apply; res-2 idealized carried a 4 GB fine slab with
        # 574k far-COO entries).  Building the hierarchy on the
        # permuted operator interleaves the coupled dofs; DeviceMG
        # gathers residuals through hier.perm at the apply boundary.
        import os

        perm = None
        if os.environ.get("KNPEMI_MG_GLOBAL_RCM", "1") == "1":
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            perm = np.asarray(
                reverse_cuthill_mckee(A_hat, symmetric_mode=True),
                dtype=np.int64,
            )
            A_hat = A_hat[perm][:, perm].tocsr()
            s = s[perm]
            _smark("emi_mg: global RCM permutation")
        hier = build_hierarchy_cached(
            A_hat,
            B=1.0 / s,
            theta=self.opts.mg_theta,
            coarse_max=self.opts.mg_coarse_max,
            nu=self.opts.mg_nu,
            banded=self._mg_banded,
            smoother=self._smoother_for(A_hat.shape[0]),
            degree=self.opts.mg_degree,
            slab_dtype=(
                np.float32 if self.dtype == jnp.float32 else np.float64
            ),
        )
        _smark("emi_mg: hierarchy (build or cache hit)")
        hier.perm = perm
        self._emi_hier = hier
        self.emi_solver.mg = hier.device(
            self.dtype, band_dtype=self._band_dtype,
            band_pallas=self._use_pallas,
        )
        self.emi_solver.mg.fine_diag = jnp.asarray(
            self._emi_diag0, self.dtype
        )
        _smark("emi_mg: device upload")

    def _refresh_payload(self, c_host):
        """Host-side hierarchy value refresh — PURE numpy/scipy (no jax),
        so it can run on a worker thread while the device computes.
        Returns ((hier, raw_diag), None) or (None, reason)."""
        import scipy.sparse as sp
        from ..solvers import direct as direct_mod
        from ..solvers.mg import refresh_hierarchy

        F, psi = self.params.F, self.params.psi
        kappa = {}
        for t in self.emi_sys.tags:
            acc = 0.0
            for k, ion in enumerate(self.ions):
                acc = acc + (ion.z**2) * ion.D[t] * np.asarray(c_host[t][k])
            kappa[t] = F * psi * acc
        A0 = direct_mod.assemble_emi_csr(self.emi_sys, kappa)
        # equilibrate with the FROZEN setup-time scale, not a fresh one.
        # The frozen transfer operators were smoothed to reproduce
        # B_old = 1/s_old; the raw operator's null space is the constant
        # vector for ANY kappa, so S_old A_new S_old still has exactly
        # B_old as its near-null and the frozen P keeps annihilating it.
        # Re-equilibrating with s_new moves the near-null to 1/s_new,
        # which the frozen P does NOT reproduce — the refreshed V-cycle
        # then degrades below the fully STALE hierarchy (measured on the
        # flagship staleness stress: EMI 7 -> a maxiter-capped step
        # right after the first refresh install; mesh_n 32 showed the
        # mild version, 6 -> 7 after each install).  The solver
        # equilibrates each solve with the same lagged fine_diag, so
        # hierarchy and system stay in one scaled space.
        diag0 = self._emi_diag0
        s = 1.0 / np.sqrt(np.abs(diag0))
        A_hat = (sp.diags(s) @ A0 @ sp.diags(s)).tocsr()
        perm = getattr(self._emi_hier, "perm", None)
        if perm is not None:
            # the hierarchy lives in globally-RCM-permuted space: refill
            # it from the operator in the SAME order (see _setup_emi_mg)
            A_hat = A_hat[perm][:, perm].tocsr()
        try:
            hier = refresh_hierarchy(self._emi_hier, A_hat)
        except ValueError as e:
            return None, str(e)
        return (hier, diag0), None

    def _install_refreshed(self, hier, diag0):
        """Swap a refreshed hierarchy in (main thread: creates device
        arrays).  Shapes are frozen, so the compiled chunk is reused."""
        self._emi_hier = hier
        self._emi_diag0 = diag0
        self.emi_solver.mg = hier.device(
            self.dtype, band_dtype=self._band_dtype,
            band_pallas=self._use_pallas,
        )
        self.emi_solver.mg.fine_diag = jnp.asarray(diag0, self.dtype)

    def refresh_mg(self, state: SimState):
        """Rebuild the EMI hierarchy VALUES from the current concentrations
        with frozen transfer operators and sparsity (solvers/mg.py::
        refresh_hierarchy) — every array keeps its shape, so the refreshed
        DeviceMG swaps into the compiled chunk with NO recompilation (it is
        a jit argument).  The KNP hierarchies never need refreshing: their
        setup operator (mass + mean-D stiffness) is time-constant.

        Structure must NEVER change mid-run: a rebuilt hierarchy with a
        different pytree forces a chunk retrace (measured: the astrocyte
        run crashed at its first refresh when f32 kappa rounding
        perturbed the assembled sparsity) — an irrecoverable layout
        drift keeps the stale hierarchy with a warning instead.

        The reference re-runs hypre's setup implicitly whenever PETSc
        reassembles (pdeSolver.py:32); this is the TPU-native analog,
        amortized to every ``SolverOptions.mg_refresh_every`` steps."""
        from ..utils.logging import warn

        c_host = jax.device_get(state.c)
        res, err = self._refresh_payload(c_host)
        if res is None:
            warn(f"MG refresh skipped (layout drift: {err}); "
                 "keeping the stale hierarchy")
            return
        hier, diag0 = res
        self._install_refreshed(hier, diag0)

    def _setup_knp_mg(self):
        """Lagged SA-AMG per subdomain for the KNP blocks: built once from
        the t=0 operator (zero drift) with the solved ions' mean diffusion
        coefficient; the K/Cl diffusivities differ by ~3 percent, so one
        hierarchy per tag serves every ion in the scan."""
        import scipy.sparse as sp
        from ..solvers import direct as direct_mod
        from ..solvers.mg import build_hierarchy_cached
        from ..utils.logging import setup_mark as _smark

        mg = {}
        for t in self.knp_sys.tags:
            _smark(f"knp_mg tag start")
            sub = self.geom.subdomains[t]
            n = sub.n_dofs
            Dbar = float(np.mean([ion.D[t] for ion in self.ions[:-1]]))
            from ..solvers.direct import _mass_coo, _stiffness_coo, _coo_accumulate

            r1, c1, v1 = _mass_coo(sub.cells, sub.vols, 1.0 / self.params.dt)
            r2, c2, v2 = _stiffness_coo(sub.cells, sub.grads, sub.vols,
                                        coef_cell=Dbar)
            A0 = _coo_accumulate([r1, r2], [c1, c2], [v1, v2], n)
            d = A0.diagonal()
            d = np.where(d != 0, d, 1.0)
            s_ = 1.0 / np.sqrt(np.abs(d))
            A_hat = (sp.diags(s_) @ A0 @ sp.diags(s_)).tocsr()
            # same global-RCM treatment as the EMI hierarchy: the tissue
            # ECS submesh inherits parent-mesh numbering with holes, and
            # its banded windows ballooned to a 4 GB fine slab + 574k
            # far-COO entries on the flagship (see _setup_emi_mg)
            import os

            perm_t = None
            if os.environ.get("KNPEMI_MG_GLOBAL_RCM", "1") == "1":
                from scipy.sparse.csgraph import reverse_cuthill_mckee

                perm_t = np.asarray(
                    reverse_cuthill_mckee(A_hat, symmetric_mode=True),
                    dtype=np.int64,
                )
                A_hat = A_hat[perm_t][:, perm_t].tocsr()
                s_ = s_[perm_t]
            hier = build_hierarchy_cached(
                A_hat, B=1.0 / s_, theta=self.opts.mg_theta,
                coarse_max=self.opts.mg_coarse_max, nu=self.opts.mg_nu,
                banded=self._mg_banded,
                smoother=self._smoother_for(A_hat.shape[0]),
                degree=self.opts.mg_degree,
                slab_dtype=(
                    np.float32 if self.dtype == jnp.float32 else np.float64
                ),
            )
            _smark(f"knp_mg[{t}]: assemble+hierarchy")
            hier.perm = perm_t
            mg[t] = hier.device(
                self.dtype, band_dtype=self._band_dtype,
                band_pallas=self._use_pallas,
            )
            mg[t].post_smooth = bool(
                getattr(self.opts, "knp_post_smooth", True))
            _smark(f"knp_mg[{t}]: device upload")
            # lagged equilibration scale: the drift contribution to the
            # diagonal is negligible next to the 1/dt mass term, so the
            # setup operator's diagonal serves every ion/step
            mg[t].fine_diag = jnp.asarray(d, self.dtype)
        self.knp_solver.mg = mg

    def init_state(self) -> SimState:
        c = set_initial_conditions(self.geom, self.ions, dtype=self.dtype)
        phi = {
            t: jnp.zeros((s.n_dofs,), self.dtype)
            for t, s in self.geom.subdomains.items()
        }
        phi_M = {}
        ode_states = {}
        ode_params = {}
        for m, mm in self.mem_models.items():
            states0 = getattr(mm, "states0", mm.init_states())
            params0 = getattr(mm, "params0", mm.init_params())
            ode_states[m] = jnp.asarray(states0, dtype=self.dtype)
            ode_params[m] = jnp.asarray(params0, dtype=self.dtype)
            # initial phi_M from the ODE file's resting V (run_2D.py: the
            # first EMI solve uses the ODE-provided membrane potential)
            phi_M[m] = jnp.asarray(states0[:, mm.state_index("V")], dtype=self.dtype)
        return SimState(
            c=c,
            phi=phi,
            phi_M=phi_M,
            ode_states=ode_states,
            ode_params=ode_params,
            t=jnp.asarray(
                0.0,
                jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
            ),
            step=jnp.asarray(0, jnp.int32),
            emi_iters=jnp.asarray(0, jnp.int32),
            knp_iters=jnp.asarray(0, jnp.int32),
            # committed dtypes matching what step() produces, so the
            # second chunk call does not retrace on weak->strong drift
            emi_ok=jnp.asarray(True),
            knp_ok=jnp.asarray(True),
            emi_res=jnp.asarray(0.0, self.dtype),
            knp_res=jnp.asarray(0.0, self.dtype),
        )

    # ------------------------------------------------------------------
    def step(self, state: SimState) -> SimState:
        """One full splitting step (pure; jit/scan-safe)."""
        p = self.params
        dt = p.dt
        first = state.step == 0

        # [1] membrane ODEs (vmapped over all dofs at once)
        phi_M_new = dict(state.phi_M)
        ode_states = dict(state.ode_states)
        ode_params = dict(state.ode_params)
        I_ch: Dict[int, jnp.ndarray] = {}
        for m, mm in self.mem_models.items():
            prms, sts = update_ode_variables(
                mm, state.ode_params[m], state.ode_states[m],
                state.c, state.phi_M[m], self.ions, first,
            )
            sts = mm.step(sts, prms, state.t, dt)
            ode_states[m] = sts
            ode_params[m] = prms
            phi_M_new[m] = mm.get_membrane_potential(sts)
            cur = mm.currents(sts, prms, state.t + dt)
            I_ch[m] = jnp.stack([cur[ion.name] for ion in self.ions])

        # [2] EMI solve (kappa rebuilt from previous concentrations)
        phi, emi_info = self.emi_solver.solve(
            state.c, phi_M_new, I_ch, x0=state.phi
        )

        # [3] KNP solve (drift linearized around the fresh phi)
        c_solved, knp_info = self.knp_solver.solve(
            state.c, phi, phi_M_new, I_ch,
            source_gate=self.source_gate(state.t),
            x0=state.c,
        )

        # [4] algebraic refresh: eliminated ion + phi_M from PDE traces
        c_new, phi_M_pde = update_pde_variables(
            self.geom, self.ions, p, c_solved, phi
        )

        return SimState(
            c=c_new,
            phi=phi,
            phi_M=phi_M_pde,
            ode_states=ode_states,
            ode_params=ode_params,
            t=state.t + dt,
            step=state.step + 1,
            emi_iters=emi_info.iters,
            knp_iters=knp_info.iters,
            emi_ok=emi_info.converged,
            knp_ok=knp_info.converged,
            emi_res=emi_info.resnorm,
            knp_res=knp_info.resnorm,
        )

    # ------------------------------------------------------------------
    def _chunk(self, n: int):
        """Jitted scan over n steps.  The MG hierarchies are passed as
        ARGUMENTS (DeviceMG is a pytree): their slabs travel as runtime
        buffers rather than HLO constants (remote-compile payloads are
        size-bounded), and a refreshed hierarchy of identical shape can
        be swapped in without recompiling."""
        if n not in self._chunk_jit:

            def body(s, _):
                s2 = self.step(s)
                return s2, (s2.emi_iters, s2.knp_iters,
                            s2.emi_ok & s2.knp_ok)

            def chunk(s, emi_mg, knp_mg, payload):
                # hierarchies AND the Pallas blocking lane arrays travel
                # as jit arguments: closure-captured device arrays become
                # HLO constants and the remote-compile payload exceeds
                # the tunnel's request bound at flagship scale (HTTP 413
                # at ~250 MB of lane constants)
                old = (
                    self.emi_solver.mg, self.knp_solver.mg,
                    self.emi_sys.blocked, self.emi_sys.mem_blocked,
                    self.knp_sys.blocked, self.knp_sys.mem_blocked,
                )
                self.emi_solver.mg = emi_mg
                self.knp_solver.mg = knp_mg
                (self.emi_sys.blocked, self.emi_sys.mem_blocked,
                 self.knp_sys.blocked, self.knp_sys.mem_blocked) = payload
                try:
                    return jax.lax.scan(body, s, None, length=n)
                finally:
                    (self.emi_solver.mg, self.knp_solver.mg,
                     self.emi_sys.blocked, self.emi_sys.mem_blocked,
                     self.knp_sys.blocked, self.knp_sys.mem_blocked) = old

            self._chunk_jit[n] = jax.jit(chunk)
        jitted = self._chunk_jit[n]
        return lambda s: jitted(
            s, self.emi_solver.mg, self.knp_solver.mg,
            (self.emi_sys.blocked, self.emi_sys.mem_blocked,
             self.knp_sys.blocked, self.knp_sys.mem_blocked),
        )

    def run(
        self,
        state: SimState,
        n_steps: int,
        save_every: Optional[int] = None,
        observer: Optional[Callable[[SimState], None]] = None,
        verbose: bool = False,
        checkpoint_every: int = 0,
        checkpoint_cb: Optional[Callable[[SimState], None]] = None,
    ):
        """Advance n_steps; call ``observer(state)`` every ``save_every``
        steps (and once at the end).  Returns (state, emi_iters[], knp_iters[]).

        ``checkpoint_cb(host_state)`` is invoked every ``checkpoint_every``
        steps (aligned to chunk boundaries on the device path) with the
        device-fetched state pytree, for driver-level crash recovery — the
        reference writes per-step .bp output but has no restartable
        checkpoint at all (SURVEY.md §5).
        """
        ckpt_on = bool(checkpoint_cb) and checkpoint_every > 0
        if self.opts.direct:
            # host LU path: plain python loop (tests/small runs only)
            it_e, it_k = [], []
            for k in range(n_steps):
                state = self.step(state)
                it_e.append(int(state.emi_iters))
                it_k.append(int(state.knp_iters))
                if observer and save_every and (k + 1) % save_every == 0:
                    observer(state)
                if ckpt_on and (k + 1) % checkpoint_every == 0 and k + 1 < n_steps:
                    checkpoint_cb(jax.device_get(state))
            return state, np.array(it_e), np.array(it_k)

        chunk_n = save_every or n_steps
        chunk = self._chunk(chunk_n)
        it_e, it_k = [], []
        done = 0
        last_ckpt = 0
        self._last_refresh = 0
        while done < n_steps:
            n = min(chunk_n, n_steps - done)
            if n != chunk_n:
                chunk = self._chunk(n)
            t0 = time.perf_counter()
            state, (ce, ck, ok) = chunk(state)
            # ONE host sync per chunk: each device->host pull costs a
            # full tunnel roundtrip (~100 ms on the remote-TPU setup —
            # scattered np.asarray/block_until_ready calls dominated the
            # flagship's wall time).  The observer receives the host
            # (numpy) state pytree.
            if observer is not None:
                host_state, ce, ck, ok = jax.device_get(
                    (state, ce, ck, ok)
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
            self._check_health(state, np.asarray(ok), done - n)
            self._maybe_refresh(state, host_state, done, n_steps)
            if observer:
                observer(host_state)
            if ckpt_on and done < n_steps and done - last_ckpt >= checkpoint_every:
                checkpoint_cb(
                    host_state if host_state is not None
                    else jax.device_get(state)
                )
                last_ckpt = done
        self._harvest_refresh(block=False)
        return state, np.concatenate(it_e), np.concatenate(it_k)

    # -- lagged-hierarchy refresh orchestration ------------------------
    def _maybe_refresh(self, state, host_state, done, n_steps):
        every = getattr(self.opts, "mg_refresh_every", 0)
        if not every or getattr(self, "_emi_hier", None) is None:
            return
        self._harvest_refresh(block=False)
        # trigger on steps elapsed since the LAST refresh, not on
        # divisibility: the chunk size (save_every) need not divide
        # mg_refresh_every, and `done % every` would then never hit
        if done >= n_steps or (
            done - getattr(self, "_last_refresh", 0) < every
        ):
            return
        if not getattr(self.opts, "mg_refresh_async", True):
            self._last_refresh = done
            self.refresh_mg(state)
            return
        if getattr(self, "_refresh_future", None) is not None:
            return  # previous rebuild still running; retry next chunk
        import concurrent.futures

        if getattr(self, "_refresh_pool", None) is None:
            self._refresh_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mg-refresh"
            )
        c_host = (
            host_state.c if host_state is not None
            else jax.device_get(state.c)
        )
        # the worker is PURE numpy/scipy (no jax): safe off-thread
        self._last_refresh = done
        self._refresh_future = self._refresh_pool.submit(
            self._refresh_payload, c_host
        )

    def _harvest_refresh(self, block: bool):
        fut = getattr(self, "_refresh_future", None)
        if fut is None or (not block and not fut.done()):
            return
        self._refresh_future = None
        res, err = fut.result()
        if res is None:
            from ..utils.logging import warn

            warn(f"MG refresh skipped (layout drift: {err}); "
                 "keeping the stale hierarchy")
            return
        hier, diag0 = res
        self._install_refreshed(hier, diag0)

    def _check_health(self, state, ok_steps: np.ndarray, offset: int = 0):
        """Fail fast on Krylov non-convergence (reference parity:
        ksp_error_if_not_converged aborts the run, pdeSolver.py:20)."""
        mode = getattr(self.opts, "on_divergence", "raise")
        if mode == "ignore" or bool(ok_steps.all()):
            return
        bad = int(np.flatnonzero(~ok_steps)[0]) + offset + 1
        msg = (
            f"Krylov solve did NOT converge at step {bad}. "
            "Residuals of the chunk's LAST step (the failing step may be "
            f"earlier in the chunk): emi_ok={bool(state.emi_ok)} "
            f"(res {float(state.emi_res):.3e}), knp_ok={bool(state.knp_ok)} "
            f"(res {float(state.knp_res):.3e}). "
            "Increase maxiter, refresh the MG hierarchy, or relax rtol."
        )
        if mode == "warn":
            from ..utils.logging import warn

            warn(msg)
        else:
            raise RuntimeError(msg)
