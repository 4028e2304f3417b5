"""GMRES: SPD agreement with CG, nonsymmetric systems, preconditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.solver import cg, gmres


def test_gmres_spd_matches_direct():
    rng = np.random.default_rng(0)
    n = 40
    A = rng.normal(size=(n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    res = gmres.gmres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-12, restart=20)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-8
    )


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(1)
    n = 50
    A = rng.normal(size=(n, n)) + n * np.eye(n)  # diagonally dominant
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    res = gmres.gmres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-12, restart=25)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-7
    )
    assert float(res.resnorm) <= 1e-12 * np.linalg.norm(b) * 1.01


def test_gmres_preconditioned_converges_faster():
    rng = np.random.default_rng(2)
    n = 60
    d = np.linspace(1, 1e4, n)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = Q @ np.diag(d) @ Q.T
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    Minv = jnp.asarray(Q @ np.diag(1 / d) @ Q.T)  # perfect preconditioner
    res_p = gmres.gmres(lambda v: Aj @ v, jnp.asarray(b),
                        precond=lambda v: Minv @ v, rtol=1e-10, restart=5)
    res_n = gmres.gmres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-10,
                        restart=5, maxiter=10)
    assert int(res_p.iters) <= 5
    assert float(res_p.resnorm) < float(res_n.resnorm)


def test_gmres_inside_jit():
    rng = np.random.default_rng(3)
    n = 30
    A = jnp.asarray(rng.normal(size=(n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))

    @jax.jit
    def solve(A, b):
        return gmres.gmres(lambda v: A @ v, b, rtol=1e-10, restart=15)

    res = solve(A, b)
    np.testing.assert_allclose(
        np.asarray(A @ res.x), np.asarray(b), atol=1e-8 * float(jnp.linalg.norm(b))
    )


def test_gmres_float32_breakdown_no_nan():
    """Arnoldi happy breakdown in float32: A = 2I converges in ONE inner
    iteration; the rest of the cycle must be masked, not poison x with NaNs
    (the old normal-equations ridge underflowed in f32 — ADVICE r1)."""
    n = 16
    b = jnp.asarray(np.random.default_rng(4).normal(size=n), jnp.float32)
    res = gmres.gmres(lambda v: 2.0 * v, b, rtol=1e-6, restart=8)
    assert bool(jnp.all(jnp.isfinite(res.x)))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b) / 2.0,
                               rtol=1e-6)
    assert int(res.iters) == 1


def test_gmres_iters_counts_actual_inner_iterations():
    """iters must report the true inner-iteration count, not cycles*restart
    (ADVICE r1)."""
    rng = np.random.default_rng(5)
    n = 40
    A = jnp.asarray(rng.normal(size=(n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    res = gmres.gmres(lambda v: A @ v, b, rtol=1e-4, restart=30)
    # diagonally dominant: converges to 1e-4 well inside one 30-dim cycle
    assert 0 < int(res.iters) < 30


def test_gmres_on_fem_operator():
    from fem_tpu.io import meshgen
    from fem_tpu.models.system import System
    from fem_tpu.ops import operator as op_mod

    problem = meshgen.quad_grid_problem(6, 4, E=100.0, nu=0.3,
                                        tip_force=(0.0, -1.0))
    system = System(problem)
    op = system.fused_operator()
    bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
    A = cg.masked_operator(lambda v: op_mod.matvec(op, v), bc_mask)
    b = jnp.where(bc_mask, 0.0, system.rhs(0.0))
    res_g = gmres.gmres(A, b, rtol=1e-11, restart=40, maxiter=2000)
    res_c = cg.pcg(A, b, diag=jnp.where(bc_mask, 1.0, op_mod.diag(op)),
                   rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res_g.x), np.asarray(res_c.x),
        atol=1e-7 * float(jnp.abs(res_c.x).max()),
    )
