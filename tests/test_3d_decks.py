"""3D deck path end-to-end: the reference's hex path is broken (6-node
registry entry, SURVEY.md §2d.1) and was never exercised; here 3D decks
parse, solve, apply face tractions, and write 3D VTK."""

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import vtk
from fem_tpu.models import problem as pm
from fem_tpu.solver import stepper

HEX_DECK = """implicit 3 10
2 12 1 0 0 0 1 4
1.0 1.0 1 1
hex 1 2 3 4 5 6 7 8 1 0
hex 5 6 7 8 9 10 11 12 1 0
0.0 0.0 0.0
1.0 0.0 0.0
1.0 1.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
1.0 0.0 1.0
1.0 1.0 1.0
0.0 1.0 1.0
0.0 0.0 2.0
1.0 0.0 2.0
1.0 1.0 2.0
0.0 1.0 2.0
100.0 0.3 0.0 1.0 0.0
1 0 0 0 0.0 0.0 0.0
2 0 0 0 0.0 0.0 0.0
3 0 0 0 0.0 0.0 0.0
4 0 0 0 0.0 0.0 0.0
2 6 0.0 0.0 -1.0 0.0 1.0
"""

TET_DECK = """implicit 3 10
1 4 1 0 0 1 0 3
1.0 1.0 1 1
tet 1 2 3 4 1 0
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
100.0 0.3 0.0 1.0 0.0
1 0 0 0 0.0 0.0 0.0
2 0 0 0 0.0 0.0 0.0
3 0 0 0 0.0 0.0 0.0
4 0.0 0.0 -1.0 0.0 1.0
"""


MIXED_TRAC_DECK = """implicit 3 10
2 9 1 0 0 0 2 4
1.0 1.0 1 1
hex 1 2 3 4 5 6 7 8 1 0
tet 1 2 3 9 1 0
0.0 0.0 0.0
1.0 0.0 0.0
1.0 1.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
1.0 0.0 1.0
1.0 1.0 1.0
0.0 1.0 1.0
0.3 0.3 -1.0
100.0 0.3 0.0 1.0 0.0
5 0 0 0 0.0 0.0 0.0
6 0 0 0 0.0 0.0 0.0
7 0 0 0 0.0 0.0 0.0
8 0 0 0 0.0 0.0 0.0
1 5 0.0 0.0 -2.0 0.0 1.0
2 4 0.0 0.0 -3.0 0.0 1.0
"""


def test_mixed_nps_tractions():
    """A 3D deck applying tractions to BOTH a hex (4-node quad face) and a
    tet (3-node tri face) must load and sum forces per record without the
    padding nodes receiving phantom load (ADVICE r1)."""
    p = pm.load(MIXED_TRAC_DECK)
    assert p.trac_dofs.shape == (2, 4, 3)  # padded to max nps = 4
    np.testing.assert_array_equal(p.trac_node_w, [[1, 1, 1, 1], [1, 1, 1, 0]])
    from fem_tpu.models.system import System

    s = System(p)
    F = np.asarray(s.rhs(0.0)).reshape(9, 3)
    # hex side 5 = bottom face (area 1): total -2; tet side 4 (tri face
    # nodes 1,2,3, area 0.5): total -1.5. Node 9 (tet apex, off the loaded
    # face; the padding row targets dof 0 with weight 0) gets nothing; node 4
    # gets only the hex share.
    np.testing.assert_allclose(F[:, 2].sum(), -2.0 - 1.5, rtol=1e-12)
    np.testing.assert_allclose(F[3, 2], -0.5, rtol=1e-12)  # hex only
    np.testing.assert_allclose(F[8], 0.0, atol=1e-15)


def test_hex_deck_with_face_traction(tmp_path):
    """Two stacked unit hexes, base clamped, -z traction on the top face
    (side 6 = nodes 5,6,7,8 of element 2, m_elems.F90:592). Total applied
    force = traction * area = -1.0 split over 4 nodes."""
    p = pm.load(HEX_DECK)
    assert p.pdim == 3
    assert p.blocks["hex"].ne == 2
    # traction precompute: area of the unit top face = 1, nps = 4
    np.testing.assert_allclose(p.trac_nodal_vec, [[0.0, 0.0, -0.25]])
    res = stepper.run(p, Config())
    u = res.aggregate_u.reshape(12, 3)
    # top nodes move down, clamped base stays
    assert (u[8:, 2] < 0).all()
    np.testing.assert_allclose(u[:4], 0.0, atol=1e-25)
    # uniform compression sanity: uz scales ~ linearly with height
    np.testing.assert_allclose(u[8:, 2].mean() / u[4:8, 2].mean(), 2.0,
                               rtol=0.15)
    # VTK output is 3D (z written, stress has 6 components)
    from fem_tpu.io.vtk import cells_in_deck_order, write

    path = str(tmp_path / "out.vtk")
    write(path, p.coords, cells_in_deck_order(p), res.aggregate_stress,
          res.aggregate_u)
    pts, stress, disp = vtk.read_fields(path)
    assert pts.shape == (12, 3)
    assert stress.shape == (12, 6)
    # sigma_zz ~ total force / area = -1
    np.testing.assert_allclose(stress[4:8, 2], -1.0, rtol=0.2)


def test_tet_deck_point_force():
    p = pm.load(TET_DECK)
    assert p.blocks["tet"].ne == 1
    res = stepper.run(p, Config())
    u = res.aggregate_u.reshape(4, 3)
    assert u[3, 2] < 0  # loaded apex moves down
    np.testing.assert_allclose(u[:3], 0.0, atol=1e-25)


def test_tet_face_traction_area():
    """tet side 4 = nodes (1,2,3) (m_elems.F90:476): right-triangle face of
    area 1/2; nodal share = t * area / 3."""
    deck = TET_DECK.replace(
        "1.0 1.0 1 1", "1.0 1.0 1 1"
    ).replace(
        "1 4 1 0 0 1 0 3", "1 4 1 0 0 0 1 3"
    ).replace(
        "4 0.0 0.0 -1.0 0.0 1.0", "1 4 0.0 0.0 -6.0 0.0 1.0"
    )
    p = pm.load(deck)
    np.testing.assert_allclose(p.trac_nodal_vec, [[0.0, 0.0, -1.0]])
