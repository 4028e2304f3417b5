"""Restarted GMRES inside jit.

Completes the Krylov family next to CG (fem_tpu/solver/cg.py): the
reference's KSP defaults to GMRES when not forced to MUMPS (the commented
alternative in main.F90:392-394 is literally gmres+asm), and the cohesive
tangent loses symmetry under `quirks` mode and definiteness past the
traction peak — cases CG cannot handle.

GMRES(m) with modified Gram-Schmidt and GIVENS-rotation least squares:
the Hessenberg system is reduced to upper-triangular one column at a time,
giving (a) a per-iteration residual estimate so converged/broken-down
iterations inside a cycle are masked out (static shapes for XLA, no wasted
updates), (b) an exact actual-inner-iteration count, and (c) no
normal-equations ridge (the old 1e-300 ridge underflowed to 0.0 in float32
and produced NaNs on Arnoldi breakdown — ADVICE r1).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # total ACTUAL inner iterations across restarts
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
    eps = jnp.finfo(dtype).tiny

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype=dtype)
        R = jnp.zeros((m + 1, m), dtype=dtype)  # triangularized Hessenberg
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)
        V = V.at[0].set(jnp.where(beta > eps, r / jnp.maximum(beta, eps), 0.0))

        def body(j, carry):
            V, R, g, cs, sn, res, k = carry
            active = res > tol

            w = matvec(precond(V[j]))

            # modified Gram-Schmidt against basis vectors 0..j (masked)
            def mgs(i, wh):
                w, h = wh
                hij = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
                w = w - hij * V[i]
                return (w, h.at[i].set(hij))

            w, h = jax.lax.fori_loop(0, m, mgs, (w, jnp.zeros(m + 1, dtype)))
            hnext = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hnext)
            vnext = jnp.where(hnext > eps, w / jnp.maximum(hnext, eps), 0.0)

            # apply previous Givens rotations to the new column (masked i<j)
            def rot(i, h):
                on = i < j
                hi = jnp.where(on, cs[i] * h[i] + sn[i] * h[i + 1], h[i])
                hi1 = jnp.where(on, -sn[i] * h[i] + cs[i] * h[i + 1], h[i + 1])
                return h.at[i].set(hi).at[i + 1].set(hi1)

            h = jax.lax.fori_loop(0, m, rot, h)

            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c_j = jnp.where(denom > eps, h[j] / jnp.maximum(denom, eps), 1.0)
            s_j = jnp.where(denom > eps, h[j + 1] / jnp.maximum(denom, eps), 0.0)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            g_j1 = -s_j * g[j]
            g_j = c_j * g[j]
            res_new = jnp.abs(g_j1)

            # commit only while unconverged (happy breakdown drives res ~ 0,
            # masking all later iterations of this cycle)
            V = jnp.where(active, V.at[j + 1].set(vnext), V)
            R = jnp.where(active, R.at[:, j].set(h), R)
            g = jnp.where(active, g.at[j].set(g_j).at[j + 1].set(g_j1), g)
            cs = jnp.where(active, cs.at[j].set(c_j), cs)
            sn = jnp.where(active, sn.at[j].set(s_j), sn)
            res = jnp.where(active, res_new, res)
            k = k + jnp.where(active, 1, 0)
            return (V, R, g, cs, sn, res, k)

        V, R, g, cs, sn, res, k = jax.lax.fori_loop(
            0, m, body, (V, R, g, cs, sn, beta, 0)
        )

        # back-substitution over the processed columns: unprocessed columns
        # get unit diagonal + zero rhs -> y_j = 0 exactly.
        cols = jnp.arange(m)
        processed = cols < k
        Rm = R[:m, :m]
        Rm = Rm.at[cols, cols].set(jnp.where(processed, Rm[cols, cols], 1.0))
        # a processed column with an exactly-zero pivot (lucky breakdown with
        # denom == 0) also gets a unit pivot; its rhs entry is already 0.
        dg = Rm[cols, cols]
        Rm = Rm.at[cols, cols].set(jnp.where(jnp.abs(dg) > eps, dg, 1.0))
        gm = jnp.where(processed, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        x = x + precond(V[:m].T @ y)
        return x, jnp.linalg.norm(b - matvec(x)), k

    def cond(state):
        x, rnorm, it, c = state
        return jnp.logical_and(rnorm > tol, c < max_restarts)

    def body(state):
        x, _, it, c = state
        x, rnorm, k = arnoldi_cycle(x)
        return (x, rnorm, it + k, c + 1)

    r0 = jnp.linalg.norm(b - matvec(x0))
    x, rnorm, iters, _ = jax.lax.while_loop(cond, body, (x0, r0, 0, 0))
    return GMRESResult(x=x, iters=iters, resnorm=rnorm)
