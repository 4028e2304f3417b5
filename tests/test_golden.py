"""Golden-file and end-to-end tests against the reference's checked-in
outputs (SURVEY.md §4): the elastic 2-quad column goldens
(examples/SNES_test/elastic/{0,1}_output_000000.vtk), the assembled-matrix
MatView dump (examples/tmp.txt), and structural parity of the cohesive SNES
path."""

import os

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import inp, vtk
from fem_tpu.models import problem as problem_mod
from fem_tpu.solver import stepper

from tests.deckpaths import REF
ELASTIC_DECK = f"{REF}/SNES_test/elastic/elastic_test.inp"
COHESIVE_DECK = f"{REF}/cohesive_test_2.inp"
LIN_DECK = f"{REF}/lin_two_quads_qs.inp"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference examples not available"
)


def _match_golden(problem, result, golden_path, disp_tol=1e-8, stress_tol=1e-6):
    """Compare our single-run fields against a per-rank golden VTK by
    coordinate matching (the reference writes one file per MPI rank with
    duplicated boundary nodes)."""
    pts, stress, disp = vtk.read_fields(golden_path)
    u = result.aggregate_u.reshape(problem.nnds, problem.pdim)
    for i in range(pts.shape[0]):
        p = pts[i, : problem.pdim]
        d = np.linalg.norm(problem.coords - p[None, :], axis=1)
        j = int(np.argmin(d))
        assert d[j] < 1e-9, f"golden point {p} not found in mesh"
        np.testing.assert_allclose(
            u[j], disp[i, : problem.pdim], atol=disp_tol,
            err_msg=f"displacement mismatch at node {j} ({p})"
        )
        np.testing.assert_allclose(
            result.aggregate_stress[j], stress[i], atol=stress_tol,
            err_msg=f"stress mismatch at node {j} ({p})"
        )


@needs_ref
@pytest.mark.parametrize("solver,bc_mode", [
    ("direct", "penalty"),
    ("direct", "eliminate"),
    ("cg", "eliminate"),
])
def test_elastic_golden(solver, bc_mode):
    problem = problem_mod.load(ELASTIC_DECK)
    cfg = Config(solver=solver, bc_mode=bc_mode)
    result = stepper.run(problem, cfg)
    assert result.nsteps == 10
    _match_golden(problem, result, f"{REF}/SNES_test/elastic/0_output_000000.vtk")
    _match_golden(problem, result, f"{REF}/SNES_test/elastic/1_output_000000.vtk")


@needs_ref
def test_elastic_cli_roundtrip(tmp_path, monkeypatch):
    from fem_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["-f", ELASTIC_DECK, "-q"]) == 0
    pts, stress, disp = vtk.read_fields(str(tmp_path / "0_output_000000.vtk"))
    # top row (y=2) must read exactly ".100000" after F0.6 formatting
    top = pts[:, 1] == 2.0
    np.testing.assert_allclose(disp[top, 1], 0.1, atol=1e-12)
    np.testing.assert_allclose(stress[top][:, :2], [[105.0, 245.0]] * 2, atol=1e-6)


@needs_ref
def test_assembled_k_matches_reference_matview():
    """examples/tmp.txt holds a 2-rank MatView of the penalized global K for
    cohesive_test_2; rows 0-3 belong to nodes 1,2 which touch only the first
    qua element — their entries are exact parity targets (the coh rows are
    uninitialized-memory garbage in the reference: denormals ~1e-310)."""
    import jax.numpy as jnp

    from fem_tpu.models.system import System

    problem = problem_mod.load(COHESIVE_DECK)
    system = System(problem)
    K = np.asarray(system.dense_K())
    # From tmp.txt row 0: (1,-875) (2,350) (3,175) (6,-1400) (7,-175)
    #                     (8,-1050) (9,875); row 6 diag: 2100.
    expect = {(0, 1): -875, (0, 2): 350, (0, 3): 175, (0, 6): -1400,
              (0, 7): -175, (0, 8): -1050, (0, 9): 875, (6, 6): 2100,
              (6, 7): 875, (7, 7): 2100}
    for (i, j), v in expect.items():
        np.testing.assert_allclose(K[i, j], v, rtol=1e-12,
                                   err_msg=f"K[{i},{j}]")


@needs_ref
def test_cohesive_snes_structure():
    """Newton-path structure parity: the reference's captured log shows 1 SNES
    iteration on the first interval and 0 once the state stops changing
    (examples/SNES_test/cohesive_test/tmp)."""
    problem = problem_mod.load(COHESIVE_DECK)
    result = stepper.run(problem, Config())
    assert result.nsteps == 2
    assert result.newton_iters[0] == 1
    # BC ramp: nodes 7,8 y-dof prescribed 0.1 total
    u = result.aggregate_u.reshape(problem.nnds, problem.pdim)
    np.testing.assert_allclose(u[6, 1], 0.1, atol=1e-10)
    np.testing.assert_allclose(u[7, 1], 0.1, atol=1e-10)
    assert np.isfinite(result.aggregate_u).all()
    assert np.isfinite(result.aggregate_stress).all()


@needs_ref
def test_cohesive_quirks_mode_runs():
    problem = problem_mod.load(COHESIVE_DECK)
    result = stepper.run(problem, Config(quirks=True))
    assert np.isfinite(result.aggregate_u).all()


@needs_ref
def test_lin_two_quads_forces():
    """Mixed tri/qua deck with time-windowed point forces."""
    problem = problem_mod.load(LIN_DECK)
    assert set(problem.blocks) == {"qua", "tri"}
    result = stepper.run(problem, Config())
    assert result.nsteps == 1
    u = result.aggregate_u.reshape(problem.nnds, 2)
    # Forces push -x at right edge nodes (3,9); pinned at nodes 1,7.
    np.testing.assert_allclose(u[0], 0.0, atol=1e-18)
    np.testing.assert_allclose(u[6], 0.0, atol=1e-18)
    assert u[2, 0] < 0 and u[8, 0] < 0
    # node 2 bc: flags (1,1) -> unconstrained (1 != BC_PRESENT)
    assert abs(u[1, 0]) > 0


@needs_ref
def test_legacy_deck_parses():
    """7-count header + elements without nlMat (SNES_test decks,
    SURVEY.md §2d.8) must parse; ncohmats=0."""
    deck = inp.parse(f"{REF}/SNES_test/cohesive_test/cohesive_test_2.inp")
    assert deck.coh_props.shape[0] == 0
    assert len(deck.elements) == 3
    assert deck.elements[2].eltype == "coh"
    assert deck.elements[2].nlmat == -1


def test_window_fraction_semantics():
    """Load windows apply overlap(step, [t1,t2])/(t2-t1) per step
    (m_global.F90:400-426)."""
    import jax.numpy as jnp

    from fem_tpu.models.system import _window_fraction

    # window [0.2, 0.6], steps of 0.25
    f1 = _window_fraction(jnp.asarray(0.0), jnp.asarray(0.25),
                          jnp.asarray(0.2), jnp.asarray(0.6))
    np.testing.assert_allclose(float(f1), 0.05 / 0.4, rtol=1e-12)
    f2 = _window_fraction(jnp.asarray(0.25), jnp.asarray(0.5),
                          jnp.asarray(0.2), jnp.asarray(0.6))
    np.testing.assert_allclose(float(f2), 0.25 / 0.4, rtol=1e-12)
    f3 = _window_fraction(jnp.asarray(0.75), jnp.asarray(1.0),
                          jnp.asarray(0.2), jnp.asarray(0.6))
    np.testing.assert_allclose(float(f3), 0.0, atol=1e-15)
    # fractions over the whole run sum to 1
    total = sum(
        float(_window_fraction(jnp.asarray(0.25 * k), jnp.asarray(0.25 * (k + 1)),
                               jnp.asarray(0.2), jnp.asarray(0.6)))
        for k in range(4)
    )
    np.testing.assert_allclose(total, 1.0, rtol=1e-12)


def test_nsteps_float_semantics():
    """Step count replicates main.F90's `t_init = dt*(k-1) < t` loop."""
    from fem_tpu.models.problem import Problem

    class P(Problem):
        def __init__(self, t, dt):
            self.t, self.dt = t, dt

    assert P(1.0, 0.1).nsteps == 10
    assert P(0.02, 0.01).nsteps == 2
    assert P(0.1, 0.1).nsteps == 1
    assert P(0.25, 0.1).nsteps == 3


@needs_ref
def test_explicit_stype_is_noop():
    """stype=explicit runs the loop without solving and writes zeros
    (main.F90:199,238; SURVEY.md §2d.6)."""
    with open(ELASTIC_DECK) as f:
        text = f.read().replace("implicit", "explicit")
    problem = problem_mod.load(text)
    result = stepper.run(problem, Config())
    np.testing.assert_allclose(result.aggregate_u, 0.0, atol=0)
    np.testing.assert_allclose(result.aggregate_stress, 0.0, atol=0)
