"""Remaining reference decks + in-repo example decks."""

import os

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import meshgen
from fem_tpu.models import problem as pm
from fem_tpu.solver import stepper

from tests.deckpaths import REF
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@needs_ref
def test_el_test_tractions():
    """Single quad with 3 point forces + 3 side tractions — the full
    ApplyTraction path (edge areas, nodal splitting, time windows).
    Regression-pinned displacements (validated run, plane strain)."""
    p = pm.load(f"{REF}/el_test.inp")
    assert p.trac_dofs.shape[0] == 3
    res = stepper.run(p, Config())
    u = res.aggregate_u.reshape(4, 2)
    np.testing.assert_allclose(u[1, 0], -3.46666667e-04, rtol=1e-6)
    np.testing.assert_allclose(u[2], [-1.21333333e-03, -1.73333333e-04],
                               rtol=1e-6)
    np.testing.assert_allclose(u[3], [-8.66666667e-04, -1.73333333e-04],
                               rtol=1e-6)


@needs_ref
def test_two_quads_legacy_misparse_matches_reference():
    """two_quads_qs.inp predates the cohesive-material split: its 4th header
    count is labeled num_constraint_eqns but the canonical 8-count format
    (m_io.F90:17) — and therefore both the current reference parser and ours
    — reads it as ncohmats. The deck is consumed the same (mis)way the
    reference would: one "cohesive material" swallowed from the BC block."""
    p = pm.load(f"{REF}/two_quads_qs.inp")
    assert p.coh_props.shape[0] == 1
    assert p.blocks["coh"].ne == 2
    assert p.has_cohesive


def test_cohesive_interface_deck_roundtrip():
    text = meshgen.cohesive_interface_deck(6, 3, open_disp=0.004, dt=0.5)
    p = pm.load(text)
    assert p.has_cohesive
    assert p.blocks["coh"].ne == 6
    res = stepper.run(p, Config())
    assert np.isfinite(res.aggregate_u).all()
    # deck and programmatic builds agree exactly under the same solver
    # (the deck writer emits full-precision coordinates)
    p2 = meshgen.cohesive_interface_problem(6, 3, open_disp=0.004, dt=0.5)
    res2 = stepper.run(p2, Config())
    np.testing.assert_array_equal(res.aggregate_u, res2.aggregate_u)


def test_repo_example_decks_exist_and_run():
    here = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    deck = os.path.join(here, "cohesive_interface.inp")
    if not os.path.exists(deck):
        pytest.skip("examples not generated")
    p = pm.load(deck)
    res = stepper.run(p, Config())
    assert res.nsteps == 4
