"""Geometric multigrid: convergence, adjointness, heterogeneity, 2D, and the
sharded stencil matvec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.ops import structured
from fem_tpu.ops.stiffness import lame
from fem_tpu.solver import cg, multigrid

pytestmark = pytest.mark.slow  # ~157s on this host (round-4 module timing); the fast gate runs -m 'not slow'



def _setup3d(n, E=200e9, nu=0.3):
    problem = meshgen.hex_box_problem(
        n, n, n, lx=1.0, ly=1.0, lz=1.0, E=E, nu=nu, tip_load=-1e6
    )
    system = System(problem, dtype=jnp.float64)
    lam, mu = lame(jnp.asarray(E), jnp.asarray(nu))
    op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu)
    bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
    A = cg.masked_operator(lambda v: structured.matvec(op, v), bc_mask)
    b = jnp.where(bc_mask, 0.0, system.rhs(0.0))
    return system, op, A, b, bc_mask


def test_mg_mesh_independent_iterations():
    iters = []
    for n in (8, 16):
        system, op, A, b, _ = _setup3d(n)
        h = multigrid.build(op, system.bc_dofs)
        res = cg.pcg(A, b, rtol=1e-9, maxiter=200,
                     precond=multigrid.preconditioner(h))
        assert float(res.resnorm) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
        iters.append(int(res.iters))
    # doubling the mesh should NOT double the iterations (Jacobi does)
    assert iters[1] <= iters[0] + 10


def test_mg_matches_jacobi_solution():
    system, op, A, b, _ = _setup3d(8)
    h = multigrid.build(op, system.bc_dofs)
    x_mg = cg.pcg(A, b, rtol=1e-11, maxiter=300,
                  precond=multigrid.preconditioner(h)).x
    x_j = cg.pcg(A, b, diag=jnp.where(
        jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True), 1.0,
        structured.diag(op)), rtol=1e-11, maxiter=20000).x
    np.testing.assert_allclose(
        np.asarray(x_mg), np.asarray(x_j), atol=1e-8 * float(jnp.abs(x_j).max())
    )


def test_mg_chebyshev_smoother():
    """Chebyshev smoothing (the solver/amg.py smoother on the geometric
    hierarchy) converges, matches the Jacobi solution, and needs fewer
    MG-CG iterations than V(2,2) damped Jacobi."""
    system, op, A, b, _ = _setup3d(12)
    hj = multigrid.build(op, system.bc_dofs)
    hc = multigrid.build(op, system.bc_dofs, smoother="chebyshev")
    tol = 1e-9 * float(jnp.linalg.norm(b))
    rj = cg.pcg(A, b, rtol=1e-9, maxiter=300,
                precond=multigrid.preconditioner(hj))
    rc = cg.pcg(A, b, rtol=1e-9, maxiter=300,
                precond=multigrid.preconditioner(hc))
    assert float(rj.resnorm) <= tol * 1.01
    assert float(rc.resnorm) <= tol * 1.01
    assert int(rc.iters) < int(rj.iters)
    np.testing.assert_allclose(np.asarray(rc.x), np.asarray(rj.x),
                               atol=1e-8 * float(jnp.abs(rj.x).max()))


def test_mg_chebyshev_host_matches_fused():
    system, op, _, b, _ = _setup3d(8)
    h = multigrid.build(op, system.bc_dofs, smoother="chebyshev")
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.normal(size=op.ndof))
    fused = multigrid.v_cycle(h, r)
    host = multigrid.v_cycle_host(h, r)
    np.testing.assert_allclose(np.asarray(host), np.asarray(fused),
                               rtol=1e-12, atol=1e-12 * float(jnp.abs(fused).max()))


def test_prolong_restrict_adjoint():
    rng = np.random.default_rng(0)
    fine_shape = (9, 7, 5)
    coarse_shape = tuple((s + 1) // 2 for s in fine_shape)
    xc = jnp.asarray(rng.normal(size=int(np.prod(coarse_shape)) * 3))
    rf = jnp.asarray(rng.normal(size=int(np.prod(fine_shape)) * 3))
    lhs = float(jnp.vdot(multigrid.prolong(xc, fine_shape, 3), rf))
    rhs = float(jnp.vdot(xc, multigrid.restrict(rf, fine_shape, 3)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_prolong_preserves_linears():
    # trilinear interpolation reproduces a linear field exactly
    cs = (5, 4, 3)
    fs = tuple(2 * s - 1 for s in cs)
    gx, gy, gz = np.meshgrid(
        np.linspace(0, 1, cs[0]), np.linspace(0, 1, cs[1]),
        np.linspace(0, 1, cs[2]), indexing="ij",
    )
    field = (2 * gx - 3 * gy + 0.5 * gz)[..., None] * np.ones(3)
    fine = multigrid.prolong(jnp.asarray(field.reshape(-1)), fs, 3)
    fx, fy, fz = np.meshgrid(
        np.linspace(0, 1, fs[0]), np.linspace(0, 1, fs[1]),
        np.linspace(0, 1, fs[2]), indexing="ij",
    )
    expect = (2 * fx - 3 * fy + 0.5 * fz)[..., None] * np.ones(3)
    np.testing.assert_allclose(
        np.asarray(fine).reshape(expect.shape), expect, atol=1e-12
    )


def test_mg_coarse_smooth_fallback():
    # n=12 coarsens 12 -> 6 -> 3 (odd): hierarchy stops; force the fallback
    # by building with a tiny dense limit via monkeypatching is overkill —
    # instead check a hierarchy whose coarsest is odd still solves.
    system, op, A, b, _ = _setup3d(12)
    h = multigrid.build(op, system.bc_dofs)
    res = cg.pcg(A, b, rtol=1e-8, maxiter=300,
                 precond=multigrid.preconditioner(h))
    assert float(res.resnorm) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.01


def test_mg_heterogeneous():
    n = 8
    problem = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                      tip_load=-1.0)
    system = System(problem, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    lam_f = jnp.asarray(rng.uniform(50, 500, size=(n, n, n)))
    mu_f = jnp.asarray(rng.uniform(30, 300, size=(n, n, n)))
    op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam_f, mu_f)
    bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
    A = cg.masked_operator(lambda v: structured.matvec(op, v), bc_mask)
    b = jnp.where(bc_mask, 0.0, system.rhs(0.0))
    h = multigrid.build(op, system.bc_dofs)
    res = cg.pcg(A, b, rtol=1e-9, maxiter=300,
                 precond=multigrid.preconditioner(h))
    assert float(res.resnorm) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01


def test_mg_2d():
    n = 16
    problem = meshgen.quad_grid_problem(n, n, E=100.0, nu=0.3,
                                        tip_force=(0.0, -1.0))
    system = System(problem, dtype=jnp.float64)
    lam, mu = lame(jnp.asarray(100.0), jnp.asarray(0.3))
    op = structured.build((1.0 / n, 1.0 / n), (n + 1, n + 1), lam, mu)
    bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
    A = cg.masked_operator(lambda v: structured.matvec(op, v), bc_mask)
    b = jnp.where(bc_mask, 0.0, system.rhs(0.0))
    h = multigrid.build(op, system.bc_dofs)
    res = cg.pcg(A, b, rtol=1e-10, maxiter=200,
                 precond=multigrid.preconditioner(h))
    assert float(res.resnorm) <= 1e-10 * float(jnp.linalg.norm(b)) * 1.01
    assert int(res.iters) < 40


def test_sharded_stencil_matvec():
    from fem_tpu.parallel import make_mesh

    n = 8
    lam, mu = lame(jnp.asarray(70.0), jnp.asarray(0.25))
    op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=op.ndof))
    mesh = make_mesh(4)
    a = np.asarray(structured.matvec(op, u))
    b = np.asarray(structured.matvec_sharded(op, u, mesh))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12 * np.abs(a).max())


def test_sharded_stencil_matvec_heterogeneous():
    from fem_tpu.parallel import make_mesh

    n = 8
    rng = np.random.default_rng(3)
    lam_f = jnp.asarray(rng.uniform(1, 2, size=(n, n, n)))
    mu_f = jnp.asarray(rng.uniform(1, 2, size=(n, n, n)))
    op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam_f, mu_f)
    u = jnp.asarray(rng.normal(size=op.ndof))
    mesh = make_mesh(8)
    a = np.asarray(structured.matvec(op, u))
    b = np.asarray(structured.matvec_sharded(op, u, mesh))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12 * np.abs(a).max())


def test_host_vcycle_matches_fused():
    n = 8
    lam, mu = lame(jnp.asarray(200e9), jnp.asarray(0.3))
    op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu)
    problem = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0)
    system = System(problem)
    h = multigrid.build(op, system.bc_dofs)
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.normal(size=op.ndof))
    a = np.asarray(multigrid.v_cycle(h, r))
    b = np.asarray(multigrid.v_cycle_host(h, r))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12 * np.abs(a).max())


def test_pcg_host_split_solves():
    from fem_tpu.solver.cg import pcg_host_split, masked_operator

    n = 8
    problem = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                      E=200e9, nu=0.3, tip_load=-1e6)
    system = System(problem)
    lam, mu = lame(jnp.asarray(200e9), jnp.asarray(0.3))
    op = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu)
    h = multigrid.build(op, system.bc_dofs)
    bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
    b = jnp.where(bc_mask, 0.0, system.rhs(0.0))
    mf = bc_mask.astype(b.dtype)

    def A(ops, v):
        o, _ = ops
        keep = 1.0 - mf
        return structured.matvec(o, v * keep) * keep + v * mf

    def M(ops, r):
        _, hh = ops
        return multigrid.v_cycle_host(hh, r)

    res = pcg_host_split(A, b, M, (op, h), rtol=1e-9, maxiter=100)
    assert float(res.resnorm) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
    assert int(res.iters) < 40


def test_mg_wcycle_and_narrow_cheb_converge_faster():
    """Round-4 cycle-shape levers (VERDICT r3 #5): the narrow Chebyshev
    interval (lambda/4 — damp only what the coarse grid can't fix) and the
    gamma=2 W-cycle must (a) stay valid CG preconditioners (converge to
    the same solution) and (b) not need more iterations than the
    production V(Cheb-3, lambda/30) cycle."""
    system, op, A, b, _ = _setup3d(8)
    base = multigrid.build(op, system.bc_dofs, smoother="chebyshev",
                           degree=3)
    res0 = cg.pcg(A, b, rtol=1e-9, maxiter=200,
                  precond=multigrid.preconditioner(base))
    it0 = int(res0.iters)
    for kwargs in (dict(lb_frac=4.0), dict(gamma=2),
                   dict(lb_frac=4.0, gamma=2)):
        h = multigrid.build(op, system.bc_dofs, smoother="chebyshev",
                            degree=3, **kwargs)
        res = cg.pcg(A, b, rtol=1e-9, maxiter=200,
                     precond=multigrid.preconditioner(h))
        nb = float(jnp.linalg.norm(b))
        assert float(res.resnorm) <= 1e-9 * nb * 1.01, kwargs
        assert int(res.iters) <= it0 + 1, (kwargs, int(res.iters), it0)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(res0.x),
                                   atol=1e-8 * np.abs(res0.x).max())


def test_mg_wcycle_host_matches_fused():
    """v_cycle_host must stay numerically identical to v_cycle for
    W-cycles too (the host-driven form is the big-solve fallback)."""
    system, op, A, b, _ = _setup3d(8)
    h = multigrid.build(op, system.bc_dofs, smoother="chebyshev",
                        degree=3, gamma=2)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(op.ndof))
    z_fused = multigrid.v_cycle(h, r)
    z_host = multigrid.v_cycle_host(h, r)
    np.testing.assert_allclose(np.asarray(z_host), np.asarray(z_fused),
                               rtol=1e-12, atol=1e-12)
