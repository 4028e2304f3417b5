"""The bench GMG -> SA-AMG fallback must engage on a non-finite solve.

Round 3's only >=1M-dof GMG record was a NaN (TPU miscompile #5 corrupted
the grid-shaped matvec before the grid-shaped fix landed); bench.py grew a
defensive fallback — if the GMG-preconditioned solve comes back non-finite,
rebuild with the gather-based SA-AMG hierarchy and re-solve — but it was
never exercised (VERDICT r3 #2). This forces the failure on CPU by
poisoning the grid-shaped block-stencil matvec (the exact op the round-3
miscompile hit) and asserts the fallback produces a finite, converged
record. Mirrors the MUMPS-grade reliability bar of the reference's only
solver configuration (/root/reference/src/main.F90:354-390).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_gmg_nonfinite_triggers_sa_fallback(monkeypatch):
    import bench
    from fem_tpu.ops import blockstencil as bs

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    # keep the env from redirecting the mesh size
    monkeypatch.delenv("FEM_TPU_BENCH_AMG_N", raising=False)

    real_matvec_g = bs.matvec_g

    def poisoned_matvec_g(op, v):
        return real_matvec_g(op, v) * jnp.nan

    def clean_matvec_cm(op, u_cm):
        # bs.matvec_cm routes through the module-level matvec_g; keep the
        # cm path wired to the REAL grid apply so the poison models the
        # round-3 failure faithfully: the fused grid-shaped program was
        # corrupt (miscompile #5) while the cm-layout program was exact.
        g = real_matvec_g(op, u_cm.reshape((op.pdim,) + op.dims))
        return g.reshape(op.pdim, -1)

    monkeypatch.setattr(bs, "matvec_cm", clean_matvec_cm)
    monkeypatch.setattr(bs, "matvec_g", poisoned_matvec_g)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "sa-amg-fallback"
    assert np.isfinite(rec["rel_residual"])
    assert rec["rel_residual"] <= 1e-8


def test_gmg_finite_keeps_gmg(monkeypatch):
    import bench

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    monkeypatch.delenv("FEM_TPU_BENCH_AMG_N", raising=False)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "gmg"
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

    monkeypatch.setattr(gmg, "v_cycle_g", lambda h, mv, r: r)

    rec = bench.bench_amg_solve(n=8)

    assert rec["precond"] == "sa-amg-fallback"
    assert np.isfinite(rec["rel_residual"])
    assert rec["rel_residual"] <= 1e-8
