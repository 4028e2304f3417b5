"""Snap-back torture: indefinite cohesive tangent past the Xu–Needleman peak.

The reference survives post-peak cohesive states through MUMPS null-pivot
handling (/root/reference/src/main.F90:365-371) — its commented-out
alternative is literally gmres+asm (main.F90:392-394) — plus the Gao–Bower
viscous term zeta (m_seplaw.F90:52,92). Here the matrix-free Newton-Krylov
path must do the same: CG's minimization property dies on the indefinite
tangent (its recurrence residual looks converged while the direction is
garbage), so solve_step_matfree checks negative curvature + the TRUE inner
residual and falls back to GMRES.

State under test: a cohesive interface rigidly opened to 2*delta_n — past
the traction peak at delta_n, where dT/dgap ~ -0.37 sigma_max/delta_n makes
the assembled tangent strongly indefinite (verified min eig < 0).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import meshgen
from fem_tpu.models.system import System
from fem_tpu.solver import newton

pytestmark = pytest.mark.slow  # ~136s on this host (round-4 module timing); the fast gate runs -m 'not slow'


SIGMA_MAX, DELTA = 100.0, 0.001


def _snapback_state(zeta):
    p = meshgen.cohesive_interface_problem(
        8, 4, open_disp=0.004, t=1.0, dt=0.25, E=3640.0, nu=0.3,
        coh_props=(SIGMA_MAX, DELTA, DELTA, 1.0, 0.0, zeta),
    )
    s = System(p, dtype=jnp.float64)
    n_block = (8 + 1) * (4 + 1)
    top_nodes = np.arange(n_block, 2 * n_block)
    agg = np.zeros(s.ndof)
    agg[top_nodes * 2 + 1] = 2.0 * DELTA  # past the peak
    return s, jnp.asarray(agg)


def test_tangent_is_indefinite_past_peak():
    s, agg = _snapback_state(zeta=0.02)
    J = s.dense_K() + s.coh_stiffness_dense(agg, False)
    bcm = np.zeros(s.ndof, bool)
    bcm[np.asarray(s.bc_dofs)] = True
    Jf = np.array(J)[~bcm][:, ~bcm]
    w = np.linalg.eigvalsh(0.5 * (Jf + Jf.T))
    assert w.min() < -1e3


def test_gmres_fallback_rescues_cg_newton():
    s, agg = _snapback_state(zeta=0.02)
    du0 = jnp.zeros(s.ndof)
    F = s.rhs(0.0)
    # plain CG-Newton fails on the indefinite tangent ...
    r_cg = newton.solve_step_matfree(
        s, Config(solver="cg", inner_krylov="cg"), agg, du0, F
    )
    assert not r_cg.converged
    # ... the auto path detects it (negative curvature / true inner
    # residual) and converges through GMRES
    r_auto = newton.solve_step_matfree(
        s, Config(solver="cg", inner_krylov="auto"), agg, du0, F
    )
    assert r_auto.converged
    assert r_auto.gmres_fallbacks >= 1
    # and agrees with the dense (MUMPS-equivalent) Newton solution
    r_dense = newton.solve_step(
        s, Config(solver="direct"), agg, du0, F, bc_mode="eliminate"
    )
    assert r_dense.converged
    nd = float(jnp.linalg.norm(r_dense.du))
    assert float(jnp.linalg.norm(r_auto.du - r_dense.du)) < 1e-5 * nd


def test_viscous_regularization_stabilizes():
    # larger zeta (the reference's own regularizer) makes even plain
    # CG-Newton converge — fallback stays idle
    s, agg = _snapback_state(zeta=0.05)
    r = newton.solve_step_matfree(
        s, Config(solver="cg", inner_krylov="auto"), agg,
        jnp.zeros(s.ndof), s.rhs(0.0),
    )
    assert r.converged
    assert r.gmres_fallbacks == 0


def test_eisenstat_walker_converges_like_fixed():
    s, agg = _snapback_state(zeta=0.05)
    du0 = jnp.zeros(s.ndof)
    F = s.rhs(0.0)
    r_ew = newton.solve_step_matfree(s, Config(solver="cg", forcing="ew"),
                                     agg, du0, F)
    r_fx = newton.solve_step_matfree(s, Config(solver="cg", forcing="fixed"),
                                     agg, du0, F)
    assert r_ew.converged and r_fx.converged
    nd = float(jnp.linalg.norm(r_fx.du))
    assert float(jnp.linalg.norm(r_ew.du - r_fx.du)) < 1e-5 * nd


def test_matfree_newton_amg_inner():
    """At scale the matfree Newton's inner CG uses the ELASTIC AMG
    hierarchy as preconditioner (built once per load step) — far fewer
    inner iterations than Jacobi on stiff cohesive meshes."""
    from fem_tpu.solver import cg as cg_mod

    p = meshgen.cohesive_interface_problem(
        12, 10, open_disp=0.004, t=1.0, dt=0.5, E=3640.0, nu=0.3,
        coh_props=(100.0, 0.01, 0.01, 1.0, 0.0, 0.0),
    )
    s = System(p, dtype=jnp.float64)
    du0 = jnp.zeros(s.ndof)
    F = s.rhs(0.0)
    agg = jnp.zeros(s.ndof)
    r_amg = newton.solve_step_matfree(
        s, Config(solver="cg", precond="amg"), agg, du0, F
    )
    r_jac = newton.solve_step_matfree(
        s, Config(solver="cg", precond="jacobi"), agg, du0, F
    )
    assert r_amg.converged and r_jac.converged
    nd = max(float(jnp.linalg.norm(r_jac.du)), 1e-30)
    assert float(jnp.linalg.norm(r_amg.du - r_jac.du)) < 1e-5 * nd
