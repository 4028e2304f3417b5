"""CZM instability test — the reference's own Abaqus cross-validation.

examples/czm_instability.inp is the canonical-format equivalent of
examples/CZM_for_instability_test.inp (Abaqus, UEL U1 = the same
Xu-Needleman element; log examples/CZM_for_instability_test.log): two bulk
quads, one cohesive element at y=1 with props (100, 0.01, 0.01, 1, 0), all x
fixed, bottom y fixed, top edge ramped to 0.1 over t=1.

With `formulation="total"` (true equilibrium K u = F + F_coh(u)) the solve
converges in 2-6 Newton iterations per increment to the symmetric solution:
interface gap 0.09995, total interface force = Tn(gap) * length = 0.12397.
The Abaqus log's converged cohesive nodal forces after its 23 adaptive
increments sum to 0.06205 per node pair on the symmetric-equivalent total —
our per-node value 0.06199 agrees to 0.1% (Abaqus found the bifurcated
asymmetric branch 0.0489/0.0131 whose SUM matches; past the traction peak
both branches are equilibria and the split is path-dependent).

This is also the regression test for the "total" formulation itself: the
reference's incremental scheme re-applies the full cohesive force each step
and lands at a 100x larger spurious interface force on this deck.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.models import problem as pm
from fem_tpu.models.system import System
from fem_tpu.ops import cohesive
from fem_tpu.solver import stepper

DECK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "czm_instability.inp",
)

ABAQUS_PAIR_SUM = 0.0489376440 + 0.0131128022  # CZM_for_instability_test.log


@pytest.mark.skipif(not os.path.exists(DECK), reason="example deck missing")
def test_czm_total_formulation_matches_abaqus():
    p = pm.load(DECK)
    res = stepper.run(
        p, Config(solver="direct", formulation="total", newton_maxit=100)
    )
    assert all(it <= 10 for it in res.newton_iters), res.newton_iters
    u = res.aggregate_u.reshape(8, 2)
    # prescribed ramp reached
    np.testing.assert_allclose(u[0, 1], 0.1, atol=1e-12)
    # interface gap: prescribed opening minus tiny elastic stretch
    gap0 = u[1, 1] - u[6, 1]
    gap1 = u[4, 1] - u[7, 1]
    np.testing.assert_allclose([gap0, gap1], 0.0999494, rtol=1e-4)
    # interface force self-consistency: sum of bottom-side nodal forces ==
    # integral of the traction = Tn(gap) * length
    system = System(p)
    f = np.asarray(system.coh_force(jnp.asarray(res.aggregate_u)))
    fy = f.reshape(8, 2)[:, 1]
    bottom_sum = fy[6] + fy[7]
    props = jnp.asarray(p.coh_props[0])
    t_n, _ = cohesive.xu_needleman_traction(
        props, jnp.asarray(gap0), jnp.asarray(0.0), jnp.asarray(0.0)
    )
    np.testing.assert_allclose(bottom_sum, float(t_n), rtol=1e-6)
    # Abaqus agreement (its per-pair force sum; branch split is
    # path-dependent past the peak, the sum is not)
    np.testing.assert_allclose(bottom_sum / 2.0, ABAQUS_PAIR_SUM, rtol=2e-3)
    # action-reaction across the interface
    np.testing.assert_allclose(fy[6], -fy[1], rtol=1e-12)
    np.testing.assert_allclose(fy[7], -fy[4], rtol=1e-12)


@pytest.mark.skipif(not os.path.exists(DECK), reason="example deck missing")
def test_czm_incremental_drift_documented():
    """The reference-style incremental scheme overshoots the interface force
    by ~100x on this deck — kept as a pinned document of WHY formulation=
    'total' exists (SURVEY.md asks for defect decisions to be explicit)."""
    p = pm.load(DECK)
    res = stepper.run(
        p, Config(solver="direct", bc_mode="eliminate",
                  formulation="standard", newton_maxit=60)
    )
    system = System(p)
    f = np.asarray(system.coh_force(jnp.asarray(res.aggregate_u)))
    bottom_sum = f.reshape(8, 2)[[6, 7], 1].sum()
    assert bottom_sum > 10.0  # vs 0.124 at true equilibrium
