"""Deadline discipline of the driver benchmark (VERDICT r3 weak #1).

BENCH_r03 recorded rc 124 / parsed null: bench.py ran past the driver's
wall-clock limit with no internal budget and no partial-result emission.
The rebuilt bench.py re-executes itself as a supervised child; the parent
emits a best-so-far (or honestly-labeled fallback) JSON line at the
budget regardless of lane progress. This test runs the real bench.py
under an artificial 60 s budget on CPU — far too short for even one
reduced CPU lane to finish compiling — and asserts the contract: exit 0,
exactly one parseable JSON result line, the driver schema keys present,
and an explicit `partial` label (never a silent fake number).
"""

import json
import os
import subprocess
import sys

import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_valid_json_within_artificial_budget():
    env = dict(os.environ)
    env["TPUFOAM_BENCH_BUDGET_S"] = "60"
    env["TPUFOAM_BENCH_FORCE_CPU"] = "1"  # the suite must not touch the chip
    # timeout margin: the parent emits at the 60 s budget, but under a
    # fully-loaded single-core host (suite + queue jobs) interpreter
    # startup + emission can add a minute (observed 110 s-timeout flake
    # in the r5 full run; passed in isolation)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")], cwd=ROOT,
        env=env, capture_output=True, text=True, timeout=240)
    assert p.returncode == 0, (p.returncode, p.stderr[-2000:])
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout  # ONE JSON line (driver contract)
    result = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, result
    assert isinstance(result["value"], (int, float))
    # a run cut short must say so — silent truncation would read as a
    # real measurement. (If a 60 s CPU budget ever suffices for a full
    # reduced run, the platform_fallback label still marks it non-chip.)
    extra = result.get("extra", {})
    assert "partial" in extra or "platform_fallback" in extra, result
