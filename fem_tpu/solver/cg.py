"""Matrix-free preconditioned conjugate gradient inside jit.

Replaces the MUMPS direct factorization (main.F90:354-390) for large SPD
elastic systems: the assembled elastic K is symmetric positive definite once
constrained dofs are eliminated, so Jacobi-preconditioned CG with the
matrix-free gather/batched-k_e/scatter operator (System.matvec) is the
TPU-idiomatic solve. Everything is a lax.while_loop — one compiled kernel,
no host round-trips per iteration.

BC handling uses the elimination form (fem_tpu/solver/direct.eliminate_bcs
semantics, expressed operator-side): the operator maps constrained dofs
through the identity and masks their coupling, keeping the system SPD and
well-conditioned (the 1e30 penalty would destroy CG convergence —
SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray


def masked_operator(matvec: Callable, bc_mask):
    """Wrap an SPD operator so constrained dofs (bc_mask True) act as
    identity rows/cols: A' = P A P + (I - P), with P the free-dof projector."""

    def op(v):
        pv = jnp.where(bc_mask, 0.0, v)
        av = matvec(pv)
        return jnp.where(bc_mask, v, av)

    return op


def constrained_rhs(matvec: Callable, F, bc_mask, ubc):
    """RHS for the masked operator: b = P(F - A ubc) + ubc on constrained."""
    F = F - matvec(ubc)
    return jnp.where(bc_mask, ubc, F)


def pcg(
    matvec: Callable,
    b,
    x0=None,
    diag=None,
    rtol: float = 1e-9,
    atol: float = 0.0,
    maxiter: int = 0,
    precond: Callable = None,
) -> CGResult:
    """Preconditioned CG as a lax.while_loop.

    Preconditioner: `precond(r)` if given (e.g. a multigrid V-cycle), else
    Jacobi from `diag`, else identity. Convergence:
    ||r|| <= max(rtol * ||b||, atol) (PETSc KSP default test with the
    reference's rtol=1e-9, main.F90:349-351).
    """
    n = b.shape[0]
    if maxiter <= 0:
        maxiter = 10 * n
    x0 = jnp.zeros_like(b) if x0 is None else x0
    if precond is None:
        minv_d = 1.0 / diag if diag is not None else jnp.ones_like(b)
        precond = lambda r: minv_d * r  # noqa: E731

    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        x, r, p, rz, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > tol, k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        ap = matvec(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return CGResult(x=x, iters=k, resnorm=jnp.linalg.norm(r))


def solve_eliminated(matvec, F, diag, bc_dofs, bc_step_vals, x0=None,
                     rtol=1e-9, atol=0.0, maxiter=0) -> CGResult:
    """One elastic solve with eliminated BCs, fully matrix-free."""
    n = F.shape[0]
    bc_mask = jnp.zeros(n, dtype=bool).at[bc_dofs].set(True)
    ubc = jnp.zeros(n, dtype=F.dtype).at[bc_dofs].set(bc_step_vals)
    op = masked_operator(matvec, bc_mask)
    b = constrained_rhs(matvec, F, bc_mask, ubc)
    d = jnp.where(bc_mask, 1.0, diag)
    if x0 is not None:
        x0 = jnp.where(bc_mask, ubc, x0)
    return pcg(op, b, x0=x0, diag=d, rtol=rtol, atol=atol, maxiter=maxiter)
