"""cg.ir_pcg_chunked — speculative iterative refinement (VERDICT r4 #6).

The cycle-boundary-speculating IR driver must reproduce the blocking
per-cycle form: same converged answer (to f64 round-off), comparable inner
iteration counts, honest rel-residual reporting. Exercised on the CPU
backend with the structured stencil + geometric multigrid (the 1.59M-dof
production shape at miniature size).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.ops import structured
from fem_tpu.ops.stiffness import lame
from fem_tpu.solver import cg, multigrid


def _setup(n=8):
    problem = meshgen.hex_box_problem(n, n, n, lx=1.0, ly=1.0, lz=1.0,
                                      E=200e9, nu=0.3, tip_load=-1e6)
    system = System(problem, dtype=jnp.float64)
    lam, mu = lame(jnp.asarray(200e9), jnp.asarray(0.3))
    op64 = structured.build((1.0 / n,) * 3, (n + 1,) * 3, lam, mu)
    op32 = op64.astype(jnp.float32)
    F = system.rhs(0.0)
    hier32 = multigrid.build(op32, system.bc_dofs)
    bc_mask = jnp.zeros(system.ndof, bool).at[system.bc_dofs].set(True)
    mf32_g = jnp.asarray(bc_mask, jnp.float32).reshape((n + 1,) * 3 + (3,))
    mf64_g = jnp.asarray(bc_mask, jnp.float64).reshape(mf32_g.shape)
    ubc_g = (jnp.zeros(system.ndof)
             .at[system.bc_dofs].set(system.bc_step_vals())
             .reshape(mf32_g.shape))
    F_g = F.reshape(mf32_g.shape)

    def A32(ops, v):
        o, _ = ops
        keep = 1.0 - mf32_g
        return structured.matvec_g(o, v * keep) * keep + v * mf32_g

    def M32(ops, r):
        _, h = ops
        return multigrid.v_cycle_g(h, r)

    @jax.jit
    def make_b(op64_, F_g_, ubc_g_):
        keep = 1.0 - mf64_g
        return ((F_g_ - structured.matvec_g(op64_, ubc_g_)) * keep
                + ubc_g_ * mf64_g)

    b64_g = make_b(op64, F_g, ubc_g)

    @jax.jit
    def true_resid(xg):
        keep = 1.0 - mf64_g
        ax = structured.matvec_g(op64, xg * keep) * keep + xg * mf64_g
        r = b64_g - ax
        return r.astype(jnp.float32), jnp.sqrt(jnp.sum(r * r))

    def combine(xg, dx32):
        return ((xg + dx32.astype(jnp.float64)) * (1.0 - mf64_g)
                + ubc_g * mf64_g)

    return (system, op64, op32, hier32, b64_g, ubc_g, mf64_g, A32, M32,
            true_resid, combine)


def test_ir_spec_converges_and_matches_blocking_form():
    (system, op64, op32, hier32, b64_g, ubc_g, mf64_g, A32, M32,
     true_resid, combine) = _setup()

    x, inner, rel = cg.ir_pcg_chunked(
        true_resid, combine, A32, M32, (op32, hier32), ubc_g,
        rtol=1e-9, maxcycles=8, maxiter=80, chunk=4, adapt=True)
    assert np.isfinite(rel) and rel <= 1e-9
    # verify against an independent f64 true residual of the returned x
    _, rn = true_resid(x)
    r0 = float(jnp.sqrt(jnp.sum(b64_g * b64_g)))
    assert float(rn) <= 1.1e-9 * r0

    # blocking reference form (the round-4 loop)
    xb = ubc_g
    inner_b = 0
    r0n = None
    for _ in range(8):
        r32, rn_dev = true_resid(xb)
        rn_ = float(rn_dev)
        if r0n is None:
            r0n = rn_
        if rn_ <= 1e-9 * r0n:
            break
        cyc_rtol = float(np.clip(0.5 * 1e-9 * r0n / rn_, 1e-5, 0.5))
        res = cg.pcg_chunked(A32, r32, M32, (op32, hier32),
                             rtol=cyc_rtol, maxiter=80, chunk=4,
                             pipeline=True, bnorm=rn_)
        inner_b += int(res.iters)
        xb = combine(xb, res.x)
    nx = np.linalg.norm(np.asarray(xb).ravel())
    assert (np.linalg.norm((np.asarray(x) - np.asarray(xb)).ravel())
            <= 1e-8 * nx)
    # same work modulo one speculative chunk per cycle boundary
    assert abs(inner - inner_b) <= 2 * 4


def test_ir_spec_nonfinite_breaks_out():
    (system, op64, op32, hier32, b64_g, ubc_g, mf64_g, A32, M32,
     true_resid, combine) = _setup(n=4)

    def poisoned_M32(ops, r):
        return M32(ops, r) * jnp.nan

    x, inner, rel = cg.ir_pcg_chunked(
        true_resid, combine, A32, poisoned_M32, (op32, hier32), ubc_g,
        rtol=1e-9, maxcycles=8, maxiter=80, chunk=4)
    assert not np.isfinite(rel) or rel > 1e-9  # honest failure signal
