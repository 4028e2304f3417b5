"""solve_step_jit: one host sync per Newton iteration, identical iterates.

VERDICT r1 #7: the SNES-equivalent dense path should not pay 4-24 device
syncs per Newton iteration (per-trial line-search norms). solve_step_jit
runs residual/Jacobian/robust-solve/line-search as ONE jitted dispatch; the
host reads a single stats vector per iteration.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.solver import newton


def _problem():
    p = meshgen.cohesive_interface_problem(
        6, 3, open_disp=0.004, t=1.0, dt=0.25, E=3640.0, nu=0.3,
        coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0),
    )
    return p, System(p, dtype=jnp.float64)


def _hard_state():
    """Nonlinear state needing several Newton iterations (near the
    Xu-Needleman peak with viscous regularization, cf. test_snapback)."""
    p = meshgen.cohesive_interface_problem(
        6, 3, open_disp=0.004, t=1.0, dt=0.25, E=3640.0, nu=0.3,
        coh_props=(100.0, 0.001, 0.001, 1.0, 0.0, 0.05),
    )
    s = System(p, dtype=jnp.float64)
    n_block = (6 + 1) * (3 + 1)
    top = np.arange(n_block, 2 * n_block)
    agg = np.zeros(s.ndof)
    agg[top * 2 + 1] = 0.002
    return s, jnp.asarray(agg)


def test_jit_newton_matches_host_and_syncs_less():
    s, agg = _hard_state()
    cfg = Config()
    du0 = jnp.zeros(s.ndof)
    F = s.rhs(0.0)

    newton.SYNC_COUNT = 0
    r_host = newton.solve_step(s, cfg, agg, du0, F, bc_mode="eliminate")
    host_syncs = newton.SYNC_COUNT

    newton.SYNC_COUNT = 0
    r_jit = newton.solve_step_jit(s, cfg, agg, du0, F, bc_mode="eliminate")
    jit_syncs = newton.SYNC_COUNT

    assert r_jit.converged == r_host.converged
    assert r_jit.iters == r_host.iters
    assert r_host.iters >= 3  # multi-iteration solve, else syncs can't show
    nd = max(float(jnp.linalg.norm(r_host.du)), 1e-30)
    assert float(jnp.linalg.norm(r_jit.du - r_host.du)) < 1e-9 * nd
    iters = max(r_host.iters, 1)
    # jit path: 1 initial residual read + 1 per iterate dispatch (a final
    # stagnating line-search dispatch may not count as an iteration)
    assert jit_syncs <= iters + 2
    # host path pays per-trial line-search + step/du norms: >=4 per iteration
    assert host_syncs >= 4 * jit_syncs


def test_jit_newton_penalty_parity():
    p, s = _problem()
    cfg = Config()
    agg = jnp.zeros(s.ndof)
    du0 = jnp.zeros(s.ndof)
    F = s.rhs(0.0)
    r_host = newton.solve_step(s, cfg, agg, du0, F, bc_mode="penalty")
    r_jit = newton.solve_step_jit(s, cfg, agg, du0, F, bc_mode="penalty")
    assert r_jit.iters == r_host.iters
    nd = max(float(jnp.linalg.norm(r_host.du)), 1e-30)
    assert float(jnp.linalg.norm(r_jit.du - r_host.du)) < 1e-9 * nd


def test_jit_newton_multi_step_stepper_parity():
    from fem_tpu.solver import stepper

    p, _ = _problem()
    r_jit = stepper.run(p, Config(solver="direct", jit_newton=True))
    r_host = stepper.run(p, Config(solver="direct", jit_newton=False))
    assert r_jit.newton_iters == r_host.newton_iters
    nd = max(np.linalg.norm(r_host.aggregate_u), 1e-30)
    assert np.linalg.norm(r_jit.aggregate_u - r_host.aggregate_u) < 1e-9 * nd
