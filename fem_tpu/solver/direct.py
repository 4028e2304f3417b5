"""Dense direct solve — the small-problem stand-in for MUMPS.

The reference always factorizes with a distributed sparse direct LU
(MUMPS via PETSc PCLU, main.F90:354-390). A direct sparse LU is not
TPU-idiomatic; for the small shipped examples we use a dense factorization on
device (LU with partial pivoting via jax.scipy), and large problems take the
matrix-free Krylov path (fem_tpu/solver/cg.py) instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def _lu_device(dtype):
    """TPU XLA implements LuDecomposition only for f32/c64; the f64 dense
    direct path (small decks, MUMPS's role) must factorize on the host CPU
    backend — same division of labor as the reference, whose MUMPS LU is a
    host-side library call (main.F90:354-390)."""
    if jnp.dtype(dtype) == jnp.float64 and jax.default_backend() != "cpu":
        return jax.devices("cpu")[0]
    return None


def factorize(K):
    """LU-factorize once; reuse across time steps (the reference sets up the
    KSP once, main.F90:199-214)."""
    dev = _lu_device(K.dtype)
    if dev is not None:
        K = jax.device_put(K, dev)
    lu, piv = jsl.lu_factor(K)
    return (lu, piv)


def solve_factorized(fac, F):
    lu, piv = fac
    dev = _lu_device(lu.dtype)
    if dev is not None:
        F = jax.device_put(F, dev)
    return jsl.lu_solve((lu, piv), F)


def solve(K, F):
    dev = _lu_device(K.dtype)
    if dev is not None:
        K, F = jax.device_put(K, dev), jax.device_put(F, dev)
    return jnp.linalg.solve(K, F)


def apply_penalty_bcs(K, F, bc_dofs, bc_step_vals, penalty):
    """Reference penalty BC application (ApplyKBC m_global.F90:264-299 +
    EnforceBCForce m_global.F90:439-455): diag <- penalty (insert),
    F[bc] <- penalty * u_bc_step (insert)."""
    K = K.at[bc_dofs, bc_dofs].set(penalty)
    F = F.at[bc_dofs].set(penalty * bc_step_vals)
    return K, F


def eliminate_bcs(K, F, bc_dofs, bc_step_vals):
    """Exact-constraint variant: zero the bc rows/cols, unit diagonal,
    F_free -= K[:, bc] @ u_bc, F[bc] = u_bc. Identical solution to the
    penalty method in the penalty->inf limit, but well-conditioned for
    iterative solvers."""
    n = K.shape[0]
    ubc = jnp.zeros(n, dtype=K.dtype).at[bc_dofs].set(bc_step_vals)
    F = F - K @ ubc
    mask = jnp.zeros(n, dtype=bool).at[bc_dofs].set(True)
    K = jnp.where(mask[:, None] | mask[None, :], 0.0, K)
    K = K.at[bc_dofs, bc_dofs].set(1.0)
    F = jnp.where(mask, ubc, F)
    return K, F
