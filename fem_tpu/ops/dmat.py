"""Constitutive models: isotropic linear elasticity + power-law creep.

Replaces m_local.F90's DMat/DMat2d/DMat3d (m_local.F90:204-228) and the legacy
viscoelastic Matbeta/Matbetad family (m_local.F90:231-314). All functions are
batched over leading axes and jit/vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def dmat2d(E, nu):
    """Plane-strain isotropic 3x3 D matrix (m_local.F90:212-218).

    c = E/((1+nu)(1-2nu)); rows/cols ordered (xx, yy, xy).
    Accepts scalars or batched (...,) arrays; returns (...,3,3).
    """
    E = jnp.asarray(E)
    nu = jnp.asarray(nu)
    c = E / ((1.0 + nu) * (1.0 - 2.0 * nu))
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    d = jnp.stack(
        [
            jnp.stack([(one - nu), nu, zero], axis=-1),
            jnp.stack([nu, (one - nu), zero], axis=-1),
            jnp.stack([zero, zero, (one - 2.0 * nu) / 2.0], axis=-1),
        ],
        axis=-2,
    )
    return c[..., None, None] * d


def dmat3d(E, nu):
    """3D isotropic 6x6 D matrix (m_local.F90:221-228).

    Component order (xx, yy, zz, xy, yz, zx) to match BMat's 3D row order
    (m_local.F90:161-169).
    """
    E = jnp.asarray(E)
    nu = jnp.asarray(nu)
    c = E / ((1.0 + nu) * (1.0 - 2.0 * nu))
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    g = (one - 2.0 * nu) / 2.0
    a = one - nu
    rows = [
        jnp.stack([a, nu, nu, zero, zero, zero], axis=-1),
        jnp.stack([nu, a, nu, zero, zero, zero], axis=-1),
        jnp.stack([nu, nu, a, zero, zero, zero], axis=-1),
        jnp.stack([zero, zero, zero, g, zero, zero], axis=-1),
        jnp.stack([zero, zero, zero, zero, g, zero], axis=-1),
        jnp.stack([zero, zero, zero, zero, zero, g], axis=-1),
    ]
    return c[..., None, None] * jnp.stack(rows, axis=-2)


def dmat(E, nu, pdim: int):
    """Dispatch on spatial dimension (m_local.F90:204-209)."""
    if pdim == 2:
        return dmat2d(E, nu)
    if pdim == 3:
        return dmat3d(E, nu)
    raise ValueError(f"dmat: pdim must be 2 or 3, got {pdim}")


def creep_beta2d(stress, visc, expn):
    """Power-law creep strain rate beta(sigma), 2D (m_local.F90:239-246).

    stress: (...,3) (xx,yy,xy). Returns (...,3).
    kappa = sqrt(((s1-s2)/2)^2 + s3^2); beta = kappa^(n-1)/(4 visc) * C sigma.
    """
    s1, s2, s3 = stress[..., 0], stress[..., 1], stress[..., 2]
    kappa = jnp.sqrt(((s1 - s2) / 2.0) ** 2 + s3**2)
    cmat = jnp.asarray(
        [[1.0, -1.0, 0.0], [-1.0, 1.0, 0.0], [0.0, 0.0, 4.0]], dtype=stress.dtype
    )
    scale = (kappa ** (expn - 1.0)) / (4.0 * visc)
    return scale[..., None] * jnp.einsum("ij,...j->...i", cmat, stress)


def creep_beta3d(stress, visc, expn):
    """Power-law creep strain rate beta(sigma), 3D (m_local.F90:249-263)."""
    s1, s2, s3 = stress[..., 0], stress[..., 1], stress[..., 2]
    s4, s5, s6 = stress[..., 3], stress[..., 4], stress[..., 5]
    kappa = jnp.sqrt(
        ((s1 - s2) ** 2 + (s2 - s3) ** 2 + (s1 - s3) ** 2) / 6.0
        + s4**2
        + s5**2
        + s6**2
    )
    t23, t43 = -2.0 / 3.0, 4.0 / 3.0
    cmat = jnp.asarray(
        [
            [t43, t23, t23, 0, 0, 0],
            [t23, t43, t23, 0, 0, 0],
            [t23, t23, t43, 0, 0, 0],
            [0, 0, 0, 4.0, 0, 0],
            [0, 0, 0, 0, 4.0, 0],
            [0, 0, 0, 0, 0, 4.0],
        ],
        dtype=stress.dtype,
    )
    scale = (kappa ** (expn - 1.0)) / (4.0 * visc)
    return scale[..., None] * jnp.einsum("ij,...j->...i", cmat, stress)


def creep_betad2d(stress, visc, expn):
    """d(beta)/d(sigma) Jacobian, 2D (m_local.F90:276-288).

    Returns zeros where kappa == 0, matching the reference's early return.
    """
    s1, s2, s3 = stress[..., 0], stress[..., 1], stress[..., 2]
    kappa = jnp.sqrt(((s1 - s2) / 2.0) ** 2 + s3**2)
    safe = jnp.where(kappa == 0.0, 1.0, kappa)
    c1 = 1.0 + (expn - 1.0) * ((s1 - s2) / (2.0 * safe)) ** 2
    c2 = 1.0 + (expn - 1.0) * (s3 / safe) ** 2
    c3 = (expn - 1.0) * (s1 * s3 - s2 * s3) / safe**2
    rows = jnp.stack(
        [
            jnp.stack([c1, -c1, c3], axis=-1),
            jnp.stack([-c1, c1, -c3], axis=-1),
            jnp.stack([c3, -c3, 4.0 * c2], axis=-1),
        ],
        axis=-2,
    )
    scale = (safe ** (expn - 1.0)) / (4.0 * visc)
    out = scale[..., None, None] * rows
    return jnp.where((kappa == 0.0)[..., None, None], jnp.zeros_like(out), out)


def creep_betad3d(stress, visc, expn):
    """d(beta)/d(sigma) Jacobian, 3D (m_local.F90:292-314)."""
    s1, s2, s3 = stress[..., 0], stress[..., 1], stress[..., 2]
    s4, s5, s6 = stress[..., 3], stress[..., 4], stress[..., 5]
    kappa = jnp.sqrt(
        ((s1 - s2) ** 2 + (s2 - s3) ** 2 + (s1 - s3) ** 2) / 6.0
        + s4**2
        + s5**2
        + s6**2
    )
    safe = jnp.where(kappa == 0.0, 1.0, kappa)
    c = jnp.sqrt(expn - 1.0)
    sx = c * (2.0 * s1 - s2 - s3) / (3.0 * safe)
    sy = c * (2.0 * s2 - s3 - s1) / (3.0 * safe)
    sz = c * (2.0 * s3 - s1 - s2) / (3.0 * safe)
    t1 = c * 2.0 * s4 / safe
    t2 = c * 2.0 * s5 / safe
    t3 = c * 2.0 * s6 / safe
    t23, t43 = -2.0 / 3.0, 4.0 / 3.0
    rows = jnp.stack(
        [
            jnp.stack(
                [t43 + sx * sx, t23 + sx * sy, t23 + sx * sz, sx * t1, sx * t2, sx * t3],
                axis=-1,
            ),
            jnp.stack(
                [t23 + sx * sy, t43 + sy * sy, t23 + sy * sz, sy * t1, sy * t2, sy * t3],
                axis=-1,
            ),
            jnp.stack(
                [t23 + sx * sz, t23 + sy * sz, t43 + sz * sz, sz * t1, sz * t2, sz * t3],
                axis=-1,
            ),
            jnp.stack(
                [sx * t1, sy * t1, sz * t1, 4.0 + t1 * t1, t1 * t2, t1 * t3], axis=-1
            ),
            jnp.stack(
                [sx * t2, sy * t2, sz * t2, t2 * t1, 4.0 + t2 * t2, t2 * t3], axis=-1
            ),
            jnp.stack(
                [sx * t3, sy * t3, sz * t3, t3 * t1, t3 * t2, 4.0 + t3 * t3], axis=-1
            ),
        ],
        axis=-2,
    )
    scale = (safe ** (expn - 1.0)) / (4.0 * visc)
    out = scale[..., None, None] * rows
    return jnp.where((kappa == 0.0)[..., None, None], jnp.zeros_like(out), out)
