"""Krylov solver unit tests against scipy dense references."""

import numpy as np
import jax.numpy as jnp

from knpemi_tpu.solvers.cg import cg
from knpemi_tpu.solvers.gmres import gmres


def test_cg_spd():
    rng = np.random.default_rng(0)
    n = 60
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = cg(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-12, maxiter=300)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-10)


def test_cg_jacobi_preconditioned():
    rng = np.random.default_rng(3)
    n = 80
    d = rng.uniform(1, 1e4, n)
    A = np.diag(d) + np.eye(n, k=1) + np.eye(n, k=-1)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    Minv = jnp.asarray(1.0 / d)
    res_p = cg(lambda x: Aj @ x, jnp.asarray(b), M=lambda r: Minv * r,
               rtol=1e-12, maxiter=500)
    res_n = cg(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-12, maxiter=500)
    assert int(res_p.iters) < int(res_n.iters)
    np.testing.assert_allclose(np.asarray(res_p.x), np.linalg.solve(A, b),
                               rtol=1e-8, atol=1e-8)


def test_cg_singular_nullspace():
    """Pure-Neumann analog: singular SPD system with constant nullspace
    (PETSc setNullSpace parity, reference pdeSolver.py:72-78)."""
    n = 50
    L = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    L[0, 0] = L[-1, -1] = 1.0  # 1-D Neumann laplacian
    rng = np.random.default_rng(1)
    x_ex = rng.standard_normal(n)
    x_ex -= x_ex.mean()
    b = L @ x_ex
    null = jnp.ones(n) / np.sqrt(n)
    Lj = jnp.asarray(L)
    res = cg(lambda x: Lj @ x, jnp.asarray(b), rtol=1e-12, maxiter=2000,
             nullspace=null)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ex, atol=1e-8)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(2)
    n = 70
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n) + 5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = gmres(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-12, maxiter=400,
                restart=25)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-8)


def test_gmres_restart_and_min_iter():
    rng = np.random.default_rng(4)
    n = 40
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = gmres(lambda x: Aj @ x, jnp.asarray(b), rtol=1e-10, restart=7,
                maxiter=300, min_iter=5)
    assert int(res.iters) >= 5
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-7)


def test_gmres_with_x0():
    rng = np.random.default_rng(5)
    n = 30
    A = np.diag(rng.uniform(1, 10, n)) + 0.3 * rng.standard_normal((n, n))
    x_ex = rng.standard_normal(n)
    b = A @ x_ex
    Aj = jnp.asarray(A)
    x0 = jnp.asarray(x_ex + 1e-3 * rng.standard_normal(n))
    res = gmres(lambda x: Aj @ x, jnp.asarray(b), x0=x0, rtol=1e-12, restart=20)
    np.testing.assert_allclose(np.asarray(res.x), x_ex, atol=1e-9)
