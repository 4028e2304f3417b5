"""The bench GMG -> SA-AMG fallback must engage on a corrupt solve.

Round 3's only >=1M-dof GMG record was a NaN (TPU miscompile #5 corrupted
the grid-shaped matvec before the grid-shaped fix landed); round 4 showed
the corruption is BINARY-dependent (miscompile #6) and bench.py grew a
defensive acceptance test — if the GMG-preconditioned solve comes back
non-finite OR with blown-up iteration counts, rebuild with the gather-based
SA-AMG hierarchy and re-solve. Since round 5 the 3D production path is the
ELL/cm-shaped geometric cycle (gmg.build_lattice_ell); these tests poison
that cycle on CPU and assert the fallback produces a finite, converged
record. Mirrors the MUMPS-grade reliability bar of the reference's only
solver configuration (/root/reference/src/main.F90:354-390).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow  # ~2 min: four full n=8 AMG/GMG solves on CPU


def test_gmg_nonfinite_triggers_sa_fallback(monkeypatch):
    import bench
    from fem_tpu.solver import gmg

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    # keep the env from redirecting the mesh size
    monkeypatch.delenv("FEM_TPU_BENCH_AMG_N", raising=False)

    real_v_ell = gmg.v_cycle_ell

    def poisoned_v_ell(h, mv, r):
        # models miscompile #6: the compiled cycle silently produces
        # garbage while every standalone piece is exact
        return real_v_ell(h, mv, r) * jnp.nan

    monkeypatch.setattr(gmg, "v_cycle_ell", poisoned_v_ell)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "sa-amg-fallback"
    assert np.isfinite(rec["rel_residual"])
    assert rec["rel_residual"] <= 1e-8


def test_gmg_finite_keeps_gmg(monkeypatch):
    import bench

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    monkeypatch.delenv("FEM_TPU_BENCH_AMG_N", raising=False)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "gmg-ell"
    assert np.isfinite(rec["rel_residual"])
    assert rec["rel_residual"] <= 1e-8


def test_gmg_degraded_convergence_triggers_sa_fallback(monkeypatch):
    """Miscompile #6 is binary-dependent: a recompile can return a
    SILENTLY corrupt (finite) V-cycle that balloons CG iterations ~10x
    while the f64 IR outer still verifies (round 4, 527k: 24 -> 264
    inner its). The bench must treat the iteration blowup as corruption
    and demote to SA-AMG. Modeled by an identity 'V-cycle' (valid but
    useless preconditioner -> unpreconditioned-CG iteration counts)."""
    import bench
    from fem_tpu.solver import gmg

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    monkeypatch.delenv("FEM_TPU_BENCH_AMG_N", raising=False)

    monkeypatch.setattr(gmg, "v_cycle_ell", lambda h, mv, r: r)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "sa-amg-fallback"
    assert np.isfinite(rec["rel_residual"])
    assert rec["rel_residual"] <= 1e-8


def test_force_gmg_uses_grid_cycle(monkeypatch):
    """FEM_TPU_FORCE_GMG=1 opts 3D back into the grid-state cycle (the
    experimental path; bench still acceptance-tests it)."""
    import bench

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    monkeypatch.setenv("FEM_TPU_FORCE_GMG", "1")
    monkeypatch.delenv("FEM_TPU_BENCH_AMG_N", raising=False)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "gmg"
    assert np.isfinite(rec["rel_residual"])
    assert rec["rel_residual"] <= 1e-8
