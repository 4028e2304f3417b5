"""End-to-end differentiability: gradients THROUGH the FEM solve.

A capability the Fortran reference cannot express: every kernel here is a
pure jnp function, so jax.grad differentiates compliance (and any other
functional) with respect to material parameters, enabling inverse design
(the JAX-FEM use case). Verified against central finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.io import meshgen
from fem_tpu.ops import elements, stiffness


def _compliance_fn(problem):
    et = elements.get("qua")
    conn = jnp.asarray(problem.blocks["qua"].conn)
    coords = jnp.asarray(problem.coords)
    ecoords = coords[conn]
    edofs = stiffness.element_dofs(et, conn)
    n = problem.ndof
    bc = jnp.asarray(problem.bc_dofs)
    F = jnp.zeros(n).at[jnp.asarray(problem.force_dofs.reshape(-1))].add(
        jnp.asarray(problem.force_vec.reshape(-1))
    )

    def compliance(E_els, nu):
        lam, mu = stiffness.lame(E_els, jnp.full_like(E_els, nu))
        ke = stiffness.element_stiffness_lame(et, ecoords, lam, mu)
        K = jnp.zeros((n, n)).at[edofs[:, :, None], edofs[:, None, :]].add(ke)
        mask = jnp.zeros(n, bool).at[bc].set(True)
        Km = jnp.where(mask[:, None] | mask[None, :], 0.0, K)
        Km = Km.at[bc, bc].set(1.0)
        Fm = jnp.where(mask, 0.0, F)
        u = jnp.linalg.solve(Km, Fm)
        return F @ u

    return compliance


def test_grad_compliance_vs_finite_differences():
    problem = meshgen.quad_grid_problem(4, 3, E=100.0, nu=0.3,
                                        tip_force=(0.0, -1.0))
    compliance = _compliance_fn(problem)
    ne = problem.blocks["qua"].ne
    E0 = jnp.full(ne, 100.0)
    g = jax.grad(compliance)(E0, 0.3)
    # stiffer material -> lower compliance everywhere
    assert (np.asarray(g) < 0).all()
    # spot-check three elements against central differences
    rng = np.random.default_rng(0)
    for e in rng.choice(ne, 3, replace=False):
        h = 1e-4
        Ep = E0.at[e].add(h)
        Em = E0.at[e].add(-h)
        fd = (compliance(Ep, 0.3) - compliance(Em, 0.3)) / (2 * h)
        np.testing.assert_allclose(float(g[e]), float(fd), rtol=1e-5)


def test_grad_through_cohesive_force():
    """The Xu-Needleman traction is differentiable in its properties —
    gradient-based calibration of (sigma_max, delta_n) is possible."""
    from fem_tpu.ops import cohesive

    ecoords = jnp.array([[[0.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 0.0]]])
    ue = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, 5e-3, 0.0, 5e-3]])

    def total_force(props):
        f = cohesive.element_force(ecoords, props[None], ue, dt=0.1)
        return jnp.sum(f[0, 1::2][:2])  # bottom-side y force

    props = jnp.array([100.0, 0.01, 0.01, 1.0, 0.0, 0.0])
    g = jax.grad(total_force)(props)
    # force scales linearly in sigma_max: dF/dsigma = F/sigma
    F0 = total_force(props)
    np.testing.assert_allclose(float(g[0]), float(F0) / 100.0, rtol=1e-10)
    assert np.isfinite(np.asarray(g)).all()
