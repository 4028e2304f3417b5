"""Mixed-precision iterative refinement (solver/mixed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.ops import operator as op_mod
from fem_tpu.ops import structured
from fem_tpu.ops.stiffness import lame
from fem_tpu.solver import mixed, multigrid


def test_ir_solve_fused_operator():
    p = meshgen.hex_box_problem(8, 8, 8, lx=1.0, ly=1.0, lz=1.0,
                                E=200e9, nu=0.3, tip_load=-1e6)
    s = System(p, dtype=jnp.float64)
    op64 = s.fused_operator()
    op32 = op64.astype(jnp.float32)
    F = s.rhs(0.0)
    res = mixed.ir_solve(op64, op32, F, op_mod.diag(op32), s.bc_dofs,
                         s.bc_step_vals(), rtol=1e-10)
    bn = float(jnp.linalg.norm(F))
    assert float(res.resnorm) <= 1e-10 * bn * 1.01
    # f64 accuracy despite f32 inner solves: compare against pure f64 CG
    from fem_tpu.solver import cg

    bc_mask = jnp.zeros(s.ndof, bool).at[s.bc_dofs].set(True)
    A = cg.masked_operator(lambda v: op_mod.matvec(op64, v), bc_mask)
    ubc = jnp.zeros(s.ndof).at[s.bc_dofs].set(s.bc_step_vals())
    b = cg.constrained_rhs(lambda v: op_mod.matvec(op64, v), F, bc_mask, ubc)
    ref = cg.pcg(A, b, diag=jnp.where(bc_mask, 1.0, op_mod.diag(op64)),
                 rtol=1e-12, maxiter=20000)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x),
        atol=1e-9 * float(jnp.abs(ref.x).max()),
    )
    # the inner work really happened in f32
    assert int(res.inner_iters) > 0 and int(res.outer_iters) >= 2


def test_ir_solve_with_multigrid_precond():
    n = 16
    p = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                E=200e9, nu=0.3, tip_load=-1e6)
    s = System(p, dtype=jnp.float64)
    lam, mu = lame(jnp.asarray(200e9), jnp.asarray(0.3))
    op64 = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu)
    op32 = op64.astype(jnp.float32)
    h32 = multigrid.build(op32, s.bc_dofs)
    F = s.rhs(0.0)
    res = mixed.ir_solve(
        op64, op32, F, structured.diag(op32), s.bc_dofs, s.bc_step_vals(),
        rtol=1e-9, inner_rtol=1e-4, apply=structured.matvec,
        precond32=multigrid.preconditioner(h32),
    )
    bn = float(jnp.linalg.norm(F))
    assert float(res.resnorm) <= 1e-9 * bn * 1.01
    # MG inner: far fewer iterations than Jacobi would need at this size
    assert int(res.inner_iters) < 150
