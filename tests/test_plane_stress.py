"""Plane-stress option (beyond the plane-strain-only reference)."""

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import meshgen
from fem_tpu.models import problem as pm
from fem_tpu.solver import stepper

UNIAXIAL = """implicit 2 10
1 4 1 0 0 0 0 4
1.0 1.0 1 1
qua 1 2 3 4 1 0
0.0 0.0
1.0 0.0
1.0 1.0
0.0 1.0
100.0 0.3 0.0 1.0 0.0
1 0 0 0.0 0.0
2 0 1 0.01 0.0
3 0 1 0.01 0.0
4 0 1 0.0 0.0
"""


def test_plane_stress_uniaxial():
    """Uniaxial stretch with free lateral faces: plane stress gives
    sigma_xx = E*eps exactly; plane strain gives E/(1-nu^2)*eps."""
    p = pm.load(UNIAXIAL)
    eps = 0.01
    ps = stepper.run(p, Config(plane_stress=True, bc_mode="eliminate"))
    np.testing.assert_allclose(ps.aggregate_stress[:, 0], 100.0 * eps,
                               rtol=1e-10)
    np.testing.assert_allclose(ps.aggregate_stress[:, 1], 0.0, atol=1e-10)
    pe = stepper.run(p, Config(plane_stress=False, bc_mode="eliminate"))
    np.testing.assert_allclose(pe.aggregate_stress[:, 0],
                               100.0 / (1 - 0.09) * eps, rtol=1e-10)


def test_plane_stress_ignored_in_3d():
    p = meshgen.hex_box_problem(2, 2, 2, tip_load=-1.0, E=100.0)
    a = stepper.run(p, Config(plane_stress=True))
    b = stepper.run(p, Config(plane_stress=False))
    np.testing.assert_array_equal(a.aggregate_u, b.aggregate_u)
