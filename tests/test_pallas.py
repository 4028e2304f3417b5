"""Pallas hex8 stiffness kernel vs the XLA batch-last kernel (interpret mode
— exact on CPU; the real-TPU path shares the same kernel body)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.ops import elements, stiffness
from fem_tpu.ops.pallas_kernels import hex8_stiffness_pallas

BASE = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=float,
)


def _setup(ne, seed=0):
    rng = np.random.default_rng(seed)
    ec = np.transpose(BASE[None] + 0.05 * rng.normal(size=(ne, 8, 3)), (2, 1, 0))
    lam = rng.uniform(1, 2, ne)
    mu = rng.uniform(1, 2, ne)
    return jnp.asarray(ec), jnp.asarray(lam), jnp.asarray(mu)


def _reference(ec, lam, mu):
    et = elements.get("hex")
    ke = stiffness.element_stiffness_lame_batchlast(et, ec, lam, mu)
    return np.asarray(ke).reshape(24, 24, -1)


def test_pallas_matches_xla_exact_block():
    ec, lam, mu = _setup(128)
    got = np.asarray(hex8_stiffness_pallas(ec, lam, mu, block_e=128,
                                           interpret=True))
    ref = _reference(ec, lam, mu)
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13 * np.abs(ref).max())


def test_pallas_padding_and_multiblock():
    # 300 elements over block_e=128: 3 blocks with padding on the last
    ec, lam, mu = _setup(300, seed=1)
    got = np.asarray(hex8_stiffness_pallas(ec, lam, mu, block_e=128,
                                           interpret=True))
    assert got.shape == (24, 24, 300)
    ref = _reference(ec, lam, mu)
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13 * np.abs(ref).max())


def test_pallas_symmetry():
    ec, lam, mu = _setup(64, seed=2)
    got = np.asarray(hex8_stiffness_pallas(ec, lam, mu, block_e=64,
                                           interpret=True))
    np.testing.assert_allclose(got, np.transpose(got, (1, 0, 2)), atol=1e-12)


def test_stencil_matvec_pallas_matches_xla():
    """The fused Pallas stencil matvec (production hot op of the big solve)
    equals structured.matvec at f32 round-off, including boundary masks and
    a non-dividing leading axis (tail program masking)."""
    import numpy as np

    from fem_tpu.ops import structured
    from fem_tpu.ops.pallas_kernels import stencil_matvec_pallas
    from fem_tpu.ops.stiffness import lame

    lam, mu = lame(jnp.asarray(200e9, jnp.float32),
                   jnp.asarray(0.3, jnp.float32))
    for shape, bx in (((9, 7, 6), 4), ((8, 5, 5), 3), ((6, 6, 6), 8)):
        op = structured.build((0.1, 0.2, 0.15), shape, lam, mu,
                              dtype=jnp.float32)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(op.ndof), jnp.float32)
        k = op.lam * op.k_lam + op.mu * op.k_mu
        f0 = structured.matvec(op, u)
        f1 = stencil_matvec_pallas(k, u, shape, block_x=bx, interpret=True)
        rel = float(jnp.linalg.norm(f1 - f0) / jnp.linalg.norm(f0))
        assert rel < 1e-6, (shape, bx, rel)


def test_ell_matvec_pallas_interpret():
    """VMEM-resident-x ELL SpMV (the gather-bound op XLA is weakest at):
    interpret-mode exactness vs the XLA reference on random ELL data."""
    import numpy as np

    from fem_tpu.ops.pallas_kernels import ell_matvec_pallas

    rng = np.random.default_rng(3)
    n, w, nx = 3000, 13, 2048
    vals = rng.standard_normal((n, w)).astype(np.float32)
    cols = rng.integers(0, nx, size=(n, w)).astype(np.int32)
    x = rng.standard_normal(nx).astype(np.float32)
    ref = np.sum(vals * x[cols], axis=1)
    out = np.asarray(
        ell_matvec_pallas(jnp.asarray(vals), jnp.asarray(cols),
                          jnp.asarray(x), block_r=1024, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)
