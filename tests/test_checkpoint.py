"""Checkpoint/resume: interrupting a run mid-way and resuming must produce
bit-identical results to an uninterrupted run."""

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.models import problem as problem_mod
from fem_tpu.solver import stepper
from fem_tpu.utils import checkpoint

from tests.deckpaths import deck

ELASTIC_DECK = deck("SNES_test/elastic/elastic_test.inp")


def test_save_load_roundtrip(tmp_path):
    u = np.random.default_rng(0).normal(size=12)
    s = np.random.default_rng(1).normal(size=(6, 3))
    du = np.random.default_rng(2).normal(size=12)
    path = checkpoint.save(str(tmp_path), 7, u, s, du)
    step, u2, s2, du2, creep = checkpoint.load(path)
    assert step == 7
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(s, s2)
    np.testing.assert_array_equal(du, du2)
    assert creep == {}
    assert checkpoint.latest(str(tmp_path)) == path
    checkpoint.save(str(tmp_path), 9, u, s, du)
    assert checkpoint.latest(str(tmp_path)).endswith("state_000009.npz")


def test_latest_empty(tmp_path):
    assert checkpoint.latest(str(tmp_path)) is None
    assert checkpoint.latest(str(tmp_path / "missing")) is None


def test_resume_matches_uninterrupted(tmp_path):
    problem = problem_mod.load(ELASTIC_DECK)
    ref = stepper.run(problem, Config())

    ckdir = str(tmp_path / "ck")
    # run with checkpointing, then delete checkpoints after step 4 to
    # simulate an interruption at that point
    full = stepper.run(problem, Config(checkpoint_dir=ckdir))
    np.testing.assert_array_equal(full.aggregate_u, ref.aggregate_u)
    import os

    for name in sorted(os.listdir(ckdir)):
        step = int(name.split("_")[1].split(".")[0])
        if step > 4:
            os.unlink(os.path.join(ckdir, name))

    resumed = stepper.run(problem, Config(checkpoint_dir=ckdir))
    np.testing.assert_array_equal(resumed.aggregate_u, ref.aggregate_u)
    np.testing.assert_array_equal(resumed.aggregate_stress, ref.aggregate_stress)
    assert resumed.nsteps == ref.nsteps


def test_viscoelastic_resume_preserves_creep_state(tmp_path):
    """A resumed viscoelastic run must carry the accumulated per-ip creep
    stress: re-zeroing it silently corrupts stresses (ADVICE r1, medium)."""
    import os

    from tests.test_viscoelastic import _shear_problem

    p = _shear_problem(E=100.0, nu=0.0, visc=20.0, gamma_total=0.02,
                       t=1.0, dt=0.05)
    cfg = dict(viscoelastic=True, solver="direct", bc_mode="eliminate")
    ref = stepper.run(p, Config(**cfg))

    ckdir = str(tmp_path / "ck")
    stepper.run(p, Config(checkpoint_dir=ckdir, **cfg))
    for name in sorted(os.listdir(ckdir)):
        step = int(name.split("_")[1].split(".")[0])
        if step > 10:
            os.unlink(os.path.join(ckdir, name))
    resumed = stepper.run(p, Config(checkpoint_dir=ckdir, **cfg))
    np.testing.assert_array_equal(resumed.aggregate_stress,
                                  ref.aggregate_stress)
    np.testing.assert_array_equal(resumed.aggregate_u, ref.aggregate_u)


def test_viscoelastic_resume_refuses_stale_checkpoint(tmp_path):
    """Checkpoints written without creep state must be refused for
    viscoelastic resumes instead of silently re-zeroing the history."""
    from tests.test_viscoelastic import _shear_problem

    p = _shear_problem(E=100.0, nu=0.0, visc=20.0, gamma_total=0.02,
                       t=1.0, dt=0.05)
    ckdir = str(tmp_path / "ck")
    # forge a pre-creep-state checkpoint at step 3
    n = p.coords.shape[0] * 2
    checkpoint.save(ckdir, 3, np.zeros(n), np.zeros((p.coords.shape[0], 3)),
                    np.zeros(n))
    with pytest.raises(ValueError, match="creep state"):
        stepper.run(p, Config(checkpoint_dir=ckdir, viscoelastic=True,
                              solver="direct", bc_mode="eliminate"))


def test_no_resume_flag(tmp_path):
    problem = problem_mod.load(ELASTIC_DECK)
    ckdir = str(tmp_path / "ck")
    stepper.run(problem, Config(checkpoint_dir=ckdir))
    # resume=False starts over and still matches
    ref = stepper.run(problem, Config())
    again = stepper.run(problem, Config(checkpoint_dir=ckdir, resume=False))
    np.testing.assert_array_equal(again.aggregate_u, ref.aggregate_u)
