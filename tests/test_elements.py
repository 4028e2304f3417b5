"""Unit tests for the element library tables (fem_tpu/ops/elements.py).

Closed-form checks per SURVEY.md §4: partition of unity, gradient row sums,
quadrature volume sums, and exact agreement with the reference's tabulated
values (m_elems.F90)."""

import numpy as np
import pytest

from fem_tpu.ops import elements


ALL_TYPES = list(elements.REGISTRY)


@pytest.mark.parametrize("name", ALL_TYPES)
def test_partition_of_unity(name):
    et = elements.get(name)
    # coh pairs its shape functions (N3=N2, N4=N1, m_elems.F90:642-645), so
    # the per-ip sum is 2; all continuum elements sum to 1.
    total = 2.0 if name == "coh" else 1.0
    np.testing.assert_allclose(et.N.sum(axis=1), np.full(et.nip, total), atol=1e-14)


@pytest.mark.parametrize("name", ["tri", "qua", "tet", "hex"])
def test_gradient_rows_sum_to_zero(name):
    # d(sum_a N_a)/dxi = 0 for a partition of unity.
    et = elements.get(name)
    np.testing.assert_allclose(et.dN.sum(axis=2), 0.0, atol=1e-14)


@pytest.mark.parametrize(
    "name,total",
    [
        ("tri", 0.5),  # reference parent triangle area (weights=0.5, m_elems.F90:227)
        ("qua", 4.0),  # [-1,1]^2
        ("tet", 1.0 / 6.0),  # parent tet volume (m_elems.F90:400)
        ("hex", 8.0),  # [-1,1]^3
        ("coh", 2.0),  # [-1,1] line, 2 unit weights (m_elems.F90:621)
    ],
)
def test_weights_sum(name, total):
    et = elements.get(name)
    np.testing.assert_allclose(et.weights.sum(), total, atol=1e-14)


def test_quad_ip_order_matches_reference():
    # SamPtsQua ordering (m_elems.F90:311-314): (-,-), (-,+), (+,-), (+,+).
    et = elements.get("qua")
    a = 1.0 / np.sqrt(3.0)
    np.testing.assert_allclose(
        et.ipoints, [[-a, -a], [-a, a], [a, -a], [a, a]], atol=1e-15
    )


def test_hex_has_eight_nodes():
    # The reference registry's hex entry says 6 (m_elems.F90:27) — a latent
    # bug; we implement the correct hex8 (SURVEY.md §2d.1).
    et = elements.get("hex")
    assert et.nnodes == 8
    assert et.nip == 8
    assert et.N.shape == (8, 8)


def test_coh_paired_shape_functions():
    # N3=N2, N4=N1 (m_elems.F90:642-645).
    et = elements.get("coh")
    np.testing.assert_allclose(et.N[:, 2], et.N[:, 1], atol=1e-15)
    np.testing.assert_allclose(et.N[:, 3], et.N[:, 0], atol=1e-15)
    cn = 0.5773502691896260
    np.testing.assert_allclose(et.ipoints[:, 0], [-cn, cn], atol=1e-15)


def test_interpolation_exactness_qua():
    # Shape functions reproduce nodal coordinates at the parent nodes.
    et = elements.get("qua")
    nodes = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
    # N evaluated AT integration points interpolates linear fields exactly:
    # x(ip) = N(ip) @ nodes must equal the ip coordinates.
    np.testing.assert_allclose(et.N @ nodes, et.ipoints, atol=1e-14)


def test_interpolation_exactness_hex():
    et = elements.get("hex")
    nodes = np.array(
        [
            [-1, -1, -1],
            [1, -1, -1],
            [1, 1, -1],
            [-1, 1, -1],
            [-1, -1, 1],
            [1, -1, 1],
            [1, 1, 1],
            [-1, 1, 1],
        ],
        dtype=float,
    )
    np.testing.assert_allclose(et.N @ nodes, et.ipoints, atol=1e-14)


@pytest.mark.parametrize("name", ["qua", "hex"])
def test_n2inv_is_inverse(name):
    et = elements.get(name)
    np.testing.assert_allclose(et.n2inv @ et.N, np.eye(et.nip), atol=1e-12)


def test_vtk_ids():
    # m_elems.F90:108-120
    ids = {n: elements.get(n).vtk_id for n in ALL_TYPES}
    assert ids == {"tri": 5, "qua": 9, "tet": 10, "hex": 12, "coh": 9}
