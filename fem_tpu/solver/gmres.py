"""Restarted GMRES inside jit.

Completes the Krylov family next to CG (fem_tpu/solver/cg.py): the
reference's KSP defaults to GMRES when not forced to MUMPS (the commented
alternative in main.F90:392-394 is literally gmres+asm), and the cohesive
tangent loses symmetry under `quirks` mode and definiteness past the
traction peak — cases CG cannot handle.

GMRES(m) with modified Gram-Schmidt, fixed-size Krylov basis buffers (static
shapes for XLA), Givens-free least squares via a small dense solve of the
Hessenberg system at each restart.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # total inner iterations
    resnorm: jnp.ndarray


def gmres(
    matvec: Callable,
    b,
    x0=None,
    precond: Optional[Callable] = None,
    rtol: float = 1e-9,
    atol: float = 0.0,
    restart: int = 30,
    maxiter: int = 0,
) -> GMRESResult:
    """Left-unpreconditioned, right-preconditioned GMRES(m):
    solves A M z = b with x = M z, so the residual norm is the TRUE residual.
    """
    n = b.shape[0]
    if maxiter <= 0:
        maxiter = 10 * n
    x0 = jnp.zeros_like(b) if x0 is None else x0
    if precond is None:
        precond = lambda v: v  # noqa: E731
    m = min(restart, n)
    max_restarts = -(-maxiter // m)

    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)
    dtype = b.dtype

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype=dtype)
        H = jnp.zeros((m + 1, m), dtype=dtype)
        V = V.at[0].set(jnp.where(beta > 0, r / jnp.where(beta > 0, beta, 1.0), 0.0))

        def body(j, carry):
            V, H = carry
            w = matvec(precond(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked to <= j)
            def mgs(i, wh):
                w, H = wh
                hij = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
                w = w - hij * V[i]
                H = H.at[i, j].set(hij)
                return (w, H)

            w, H = jax.lax.fori_loop(0, m, mgs, (w, H))
            hnext = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hnext)
            V = V.at[j + 1].set(
                jnp.where(hnext > 1e-30, w / jnp.where(hnext > 0, hnext, 1.0), 0.0)
            )
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, body, (V, H))
        # least squares: min || beta e1 - H y ||, solved via normal equations
        # on the small (m+1, m) Hessenberg (regularized for early breakdown)
        e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        HtH = H.T @ H + 1e-300 * jnp.eye(m, dtype=dtype)
        y = jnp.linalg.solve(HtH, H.T @ e1)
        dx = precond(V[:m].T @ y)
        x = x + dx
        return x, jnp.linalg.norm(b - matvec(x))

    def cond(state):
        x, rnorm, k = state
        return jnp.logical_and(rnorm > tol, k < max_restarts)

    def body(state):
        x, _, k = state
        x, rnorm = arnoldi_cycle(x)
        return (x, rnorm, k + 1)

    r0 = jnp.linalg.norm(b - matvec(x0))
    x, rnorm, k = jax.lax.while_loop(cond, body, (x0, r0, 0))
    return GMRESResult(x=x, iters=k * m, resnorm=rnorm)
