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


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_run_inner(calls, batch_rc, batch_result, family_results):
    def fake(args, timeout, extra_env=None):
        calls.append(list(args))
        if args[0] == "--probe":
            return ({"probe_devices": 1, "probe_backend": "cpu",
                     "probe_seconds": 1.0}, "", 0)
        if args[0] == "--inner":
            return ({"metric": "m", "value": 1.0, "unit": "u",
                     "vs_baseline": None}, "", 0)
        if args[0] == "--families":
            return (dict(batch_result), "", batch_rc)
        if args[0] == "--family":
            return (dict(family_results.get(args[1], {})), "", 0)
        raise AssertionError(f"unexpected args {args}")

    return fake


def test_family_batch_clean_exit_skips_retries(monkeypatch, capsys):
    """A families batch that exits CLEANLY but with some families missing
    (they failed inside their own stage guards) must NOT be retried —
    retries are reserved for timeout/crash cut-offs."""
    bench = _load_bench_module()
    calls = []
    monkeypatch.setattr(bench, "_run_inner", _fake_run_inner(
        calls, 0, {"families_backend": "cpu", "weights_seconds": 0.1}, {},
    ))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.strip().startswith("{")]
    assert not [c for c in calls if c[0] == "--family"], calls
    assert lines[-1]["weights_seconds"] == 0.1


def test_family_batch_timeout_retries_only_missing(monkeypatch, capsys):
    """A families batch cut off by its watchdog (rc=-1) retries exactly
    the families whose markers are absent, and their results merge into
    the final JSON line."""
    bench = _load_bench_module()
    calls = []
    fam_results = {
        "eve": {"eve_seq_samples_per_sec": 5.0},
        "msa_transformer": {"msa_transformer_table_seconds": 0.2},
        "poet": {"poet_mutants_per_sec": 3.0},
        "tranception": {"tranception_mutants_per_sec": 4.0},
    }
    monkeypatch.setattr(bench, "_run_inner", _fake_run_inner(
        calls, -1,
        {"families_backend": "cpu", "attn_grouped_ms_t256": 1.0,
         "weights_seconds": 0.1},
        fam_results,
    ))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.strip().startswith("{")]
    retried = [c[1] for c in calls if c[0] == "--family"]
    assert retried == ["eve", "msa_transformer", "poet", "tranception"]
    final = lines[-1]
    for d in fam_results.values():
        for k, v in d.items():
            assert final[k] == v
    assert final["attn_grouped_ms_t256"] == 1.0


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


def test_family_blocks_execute_in_cheapest_first_order():
    """measure_families must run its stage blocks in the FAMILIES order
    (cheapest compile first): a cold-tunnel budget cut then drops the
    most expensive stage, not the cheap ones. Guards against a block
    being moved/added without updating the declared order."""
    import re

    import bench

    src = open(BENCH).read()
    fn = src[src.index("def measure_families"):src.index(
        "# Parent orchestration")]
    markers = {
        "attn": "attention-kernel A/B",
        "weights": "MSA sequence-weights kernel",
        "eve": "EVE: 20k-sample ELBO",
        "msa_transformer": "MSA Transformer masked table",
        "poet": "PoET family-context scoring",
        "tranception": "Tranception-L AR scoring",
    }
    assert set(markers) == set(bench.FAMILIES)
    textual = sorted(markers, key=lambda f: fn.index(markers[f]))
    assert textual == bench.FAMILIES, (
        f"stage blocks run as {textual}, FAMILIES declares {bench.FAMILIES}"
    )
    # every family's wanted() guard exists exactly once
    for fam in bench.FAMILIES:
        assert len(re.findall(rf'wanted\("{fam}"\)', fn)) == 1
