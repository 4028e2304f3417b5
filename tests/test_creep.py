"""Power-law creep constitutive kernels (m_local.F90:231-314 equivalents).

The reference ships these as dead code (ReformElRHS marked UNUSED,
m_global.F90:519); here they are live, batched, and verified: the betad
Jacobian must equal d(beta)/d(sigma) by automatic differentiation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.ops import dmat


def test_beta2d_deviatoric():
    # pure shear: s = (0, 0, tau); kappa = tau; beta = kappa^(n-1)/(4 visc) * (0,0,4 tau)
    tau, visc, expn = 2.0, 10.0, 3.0
    s = jnp.array([0.0, 0.0, tau])
    beta = dmat.creep_beta2d(s, visc, expn)
    expect = (tau ** (expn - 1.0)) / (4 * visc) * np.array([0, 0, 4 * tau])
    np.testing.assert_allclose(np.asarray(beta), expect, rtol=1e-12)


def test_beta2d_hydrostatic_is_zero():
    # equal biaxial stress has kappa=0 and zero deviatoric flow
    s = jnp.array([5.0, 5.0, 0.0])
    beta = dmat.creep_beta2d(s, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(beta), 0.0, atol=1e-15)


def test_beta3d_incompressible():
    # creep flow is deviatoric: beta_xx+beta_yy+beta_zz = 0
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(4, 6)))
    beta = dmat.creep_beta3d(s, 2.0, 2.5)
    np.testing.assert_allclose(
        np.asarray(beta[:, :3].sum(axis=1)), 0.0, atol=1e-12
    )


@pytest.mark.parametrize("expn", [1.0, 2.0, 3.5])
def test_betad2d_is_jacobian_of_beta(expn):
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=3) * 3.0)
    visc = 7.0
    jac_ad = jax.jacfwd(lambda x: dmat.creep_beta2d(x, visc, expn))(s)
    jac_an = dmat.creep_betad2d(s, visc, expn)
    np.testing.assert_allclose(np.asarray(jac_an), np.asarray(jac_ad),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("expn", [1.0, 2.0, 3.5])
def test_betad3d_is_jacobian_of_beta(expn):
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=6) * 3.0)
    visc = 4.0
    jac_ad = jax.jacfwd(lambda x: dmat.creep_beta3d(x, visc, expn))(s)
    jac_an = dmat.creep_betad3d(s, visc, expn)
    np.testing.assert_allclose(np.asarray(jac_an), np.asarray(jac_ad),
                               rtol=1e-9, atol=1e-12)


def test_betad_zero_stress_guard():
    # kappa == 0 -> zero Jacobian, matching the reference's early return
    # (m_local.F90:281-282,299-300)
    z2 = dmat.creep_betad2d(jnp.zeros(3), 1.0, 2.0)
    z3 = dmat.creep_betad3d(jnp.zeros(6), 1.0, 2.0)
    assert np.isfinite(np.asarray(z2)).all() and (np.asarray(z2) == 0).all()
    assert np.isfinite(np.asarray(z3)).all() and (np.asarray(z3) == 0).all()


def test_timers_and_trace():
    from fem_tpu.utils.timing import Timers, device_trace

    t = Timers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
    with device_trace(None):  # no-op path
        pass
