"""bench.main must EXIT 0 inside one global wall-clock budget.

Rounds 3 and 4 both lost the driver's benchmark artifact (rc=124,
parsed=null): the per-stage subprocess caps summed to ~75 minutes with no
global bound, and the driver records nothing from a killed process
(VERDICT r4 missing #1). main() now derives every stage's cap from the
REMAINING FEM_TPU_BENCH_TOTAL budget, skips stages that no longer fit
(with honest skip records), drops the cohesive stage to ONE solve when its
cap is tight, and force-exits 0. These tests drive main() with stubbed
measurement stages and a fake subprocess runner, on CPU, in seconds.
"""

import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = []  # fast module (<5 s): pure control-flow, no jax dispatch


class _Exit(Exception):
    pass


@pytest.fixture
def harness(monkeypatch):
    """Stub every measurement stage; capture subprocess launches, extra
    records, and the forced exit."""
    import bench

    calls = {"isolated": [], "extra": [], "exit": []}

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    monkeypatch.setattr(bench, "_preflight_tpu", lambda cap: True)
    monkeypatch.setattr(bench, "measure_reference_baseline",
                        lambda: (1.0e6, "stub"))
    monkeypatch.setattr(bench, "bench_element_stiffness",
                        lambda: (2.0e6, 0.01))
    monkeypatch.setattr(bench, "bench_element_stiffness_pallas",
                        lambda: (1.0e6, 0.02))
    monkeypatch.setattr(bench, "bench_operators", lambda: None)
    monkeypatch.setattr(bench, "_record_extra", calls["extra"].append)

    def fake_run(argv, timeout=None, check=False, cwd=None, env=None,
                 **kw):
        calls["isolated"].append(
            {"code": argv[-1], "timeout": timeout, "env": env or {}})

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)

    def fake_exit(code):
        calls["exit"].append(code)
        raise _Exit()

    monkeypatch.setattr(bench.os, "_exit", fake_exit)

    yield bench, calls

    if bench._FAILSAFE_TIMER is not None:
        bench._FAILSAFE_TIMER.cancel()


def _run_main(bench, monkeypatch, total):
    monkeypatch.setattr(bench, "_TOTAL", float(total))
    monkeypatch.setattr(bench, "_T0", time.time())
    monkeypatch.setattr(bench, "_HEADLINE_OUT", False)
    with pytest.raises(_Exit):
        bench.main()


def _headline(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"stdout must be exactly one JSON line: {out}"
    return json.loads(out[0])


def test_generous_budget_runs_all_stages(harness, monkeypatch, capsys):
    bench, calls = harness
    _run_main(bench, monkeypatch, total=10000.0)

    rec = _headline(capsys)
    assert rec["metric"] == "hex8_element_stiffness_throughput"
    assert rec["value"] == pytest.approx(2.0e6)
    assert rec["vs_baseline"] == pytest.approx(2.0)

    codes = [c["code"] for c in calls["isolated"]]
    assert any("bench_amg_solve" in c for c in codes)
    assert any("bench_big_solve" in c for c in codes)
    assert any("bench_cohesive_solve" in c for c in codes)
    # generous budget -> cohesive runs BOTH solves (no once-flag)
    coh = next(c for c in calls["isolated"]
               if "bench_cohesive_solve" in c["code"])
    assert coh["env"].get("FEM_TPU_BENCH_COH_ONCE") != "1"
    assert calls["exit"] == [0]


def test_tight_budget_skips_solves_honestly(harness, monkeypatch, capsys):
    bench, calls = harness
    _run_main(bench, monkeypatch, total=200.0)

    rec = _headline(capsys)
    assert rec["value"] == pytest.approx(2.0e6)  # headline always lands
    assert calls["isolated"] == []  # no solve stage launched
    skipped = {r["metric"] for r in calls["extra"] if "skipped" in r}
    assert {"amg_ir_solve_wall_1e-9", "mg_ir_solve_wall_1e-9",
            "cohesive_newton_solve_wall"} <= skipped
    assert calls["exit"] == [0]


def test_medium_budget_caps_stages_and_coh_runs_once(
        harness, monkeypatch, capsys):
    bench, calls = harness
    _run_main(bench, monkeypatch, total=1000.0)

    _headline(capsys)
    for c in calls["isolated"]:
        assert c["timeout"] <= 1000.0  # every cap bounded by the budget
    coh = next(c for c in calls["isolated"]
               if "bench_cohesive_solve" in c["code"])
    assert coh["env"].get("FEM_TPU_BENCH_COH_ONCE") == "1"
    assert calls["exit"] == [0]


def test_cohesive_once_records_single_solve(monkeypatch):
    """FEM_TPU_BENCH_COH_ONCE=1 must run stepper once and label the record
    non-steady."""
    import bench

    runs = []

    from fem_tpu.solver import stepper

    real_run = stepper.run

    def counting_run(*a, **kw):
        runs.append(1)
        return real_run(*a, **kw)

    monkeypatch.setenv("FEM_TPU_BENCH_NO_RECORD", "1")
    monkeypatch.setenv("FEM_TPU_BENCH_COH_ONCE", "1")
    monkeypatch.setenv("FEM_TPU_BENCH_COH_NX", "4")
    monkeypatch.setenv("FEM_TPU_BENCH_COH_NY", "2")
    monkeypatch.setattr(stepper, "run", counting_run)

    dtw = bench.bench_cohesive_solve()
    assert len(runs) == 1
    assert dtw > 0
