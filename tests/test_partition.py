"""Per-shard mesh views and sharded VTK output: local renumbering must cover
every element exactly once, nl2g maps must invert, and the 2-shard output of
the elastic deck must reproduce the reference's per-rank golden structure."""

import os

import numpy as np
import pytest

from fem_tpu.config import Config
from fem_tpu.io import meshgen, vtk
from fem_tpu.models import problem as problem_mod
from fem_tpu.parallel import partition as part_mod
from fem_tpu.solver import stepper

from tests.deckpaths import deck

ELASTIC_DECK = deck("SNES_test/elastic/elastic_test.inp")


def test_partition_covers_all_elements():
    problem = problem_mod.load(meshgen.quad_strip_deck(8, 4))
    epart = part_mod.partition(problem, 4)
    assert epart.shape == (32,)
    counts = np.bincount(epart, minlength=4)
    assert counts.sum() == 32
    assert counts.max() - counts.min() <= 1


def test_shard_meshes_roundtrip():
    problem = problem_mod.load(meshgen.quad_strip_deck(6, 3))
    epart = part_mod.partition(problem, 3)
    shards = part_mod.shard_meshes(problem, epart)
    total_cells = sum(len(s.cells) for s in shards)
    assert total_cells == problem.nels
    for s in shards:
        # local conn indexes local coords; nl2g maps back to global coords
        for vtk_id, conn in s.cells:
            assert conn.min() >= 0 and conn.max() < s.nl2g.shape[0]
            np.testing.assert_allclose(
                s.coords[conn], problem.coords[s.nl2g[conn]]
            )


@pytest.mark.skipif(not os.path.exists(ELASTIC_DECK), reason="no reference")
def test_sharded_vtk_elastic(tmp_path):
    problem = problem_mod.load(ELASTIC_DECK)
    result = stepper.run(problem, Config())
    paths = part_mod.write_sharded_vtk(
        problem, result.aggregate_stress, result.aggregate_u, 2,
        prefix=str(tmp_path) + "/",
    )
    assert len(paths) == 2
    seen_cells = 0
    for p in paths:
        pts, stress, disp = vtk.read_fields(p)
        seen_cells += sum(1 for line in open(p) if line.startswith("4 "))
        # every shard's fields must agree with the global solution at
        # matching coordinates
        u = result.aggregate_u.reshape(problem.nnds, 2)
        for i in range(pts.shape[0]):
            d = np.linalg.norm(problem.coords - pts[i, :2][None, :], axis=1)
            j = int(np.argmin(d))
            np.testing.assert_allclose(disp[i, :2], u[j], atol=1e-6)
            np.testing.assert_allclose(stress[i], result.aggregate_stress[j],
                                       atol=1e-6)
    assert seen_cells == problem.nels


@pytest.mark.skipif(not os.path.exists(ELASTIC_DECK), reason="no reference")
def test_cli_shards_flag(tmp_path, monkeypatch):
    from fem_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["-f", ELASTIC_DECK, "-q", "--shards", "2"]) == 0
    assert os.path.exists("0_output_000000.vtk")
    assert os.path.exists("1_output_000000.vtk")
