"""Checkpoint/resume: interrupting a run mid-way and resuming must produce
bit-identical results to an uninterrupted run."""

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.models import problem as problem_mod
from fem_tpu.solver import stepper
from fem_tpu.utils import checkpoint

ELASTIC_DECK = "/root/reference/examples/SNES_test/elastic/elastic_test.inp"


def test_save_load_roundtrip(tmp_path):
    u = np.random.default_rng(0).normal(size=12)
    s = np.random.default_rng(1).normal(size=(6, 3))
    du = np.random.default_rng(2).normal(size=12)
    path = checkpoint.save(str(tmp_path), 7, u, s, du)
    step, u2, s2, du2 = checkpoint.load(path)
    assert step == 7
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(s, s2)
    np.testing.assert_array_equal(du, du2)
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


def test_no_resume_flag(tmp_path):
    problem = problem_mod.load(ELASTIC_DECK)
    ckdir = str(tmp_path / "ck")
    stepper.run(problem, Config(checkpoint_dir=ckdir))
    # resume=False starts over and still matches
    ref = stepper.run(problem, Config())
    again = stepper.run(problem, Config(checkpoint_dir=ckdir, resume=False))
    np.testing.assert_array_equal(again.aggregate_u, ref.aggregate_u)
