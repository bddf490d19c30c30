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
    the families whose markers are absent, IN the declared execution
    order, and their results merge into the final JSON line."""
    bench = _load_bench_module()
    calls = []
    fam_results = {
        "eve": {"eve_seq_samples_per_sec": 5.0},
        "msa_transformer": {"msa_transformer_table_seconds": 0.2},
        "poet": {"poet_mutants_per_sec": 3.0},
        "tranception": {"tranception_mutants_per_sec": 4.0},
    }
    order = ["poet", "tranception", "attn", "weights", "eve",
             "msa_transformer"]
    monkeypatch.setattr(bench, "_family_order", lambda *a, **k: list(order))
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
    # the batch subprocess receives the full execution order
    batch = [c for c in calls if c[0] == "--families"]
    assert batch and batch[0][1] == ",".join(order)
    retried = [c[1] for c in calls if c[0] == "--family"]
    assert retried == ["poet", "tranception", "eve", "msa_transformer"]
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


def test_family_order_prioritizes_never_captured(tmp_path):
    """_family_order must put families that have NEVER landed in a prior
    BENCH_r*.json artifact FIRST (VERDICT r4 item 1: poet/tranception
    fell off the budget four rounds running), with captured families
    following in the canonical cheapest-compile-first order."""
    import bench

    def art(name, keys):
        (tmp_path / name).write_text(json.dumps(
            {"parsed": {k: 1.0 for k in keys}}))

    # r1 captured weights+eve, r2 captured attn+msa_transformer; poet and
    # tranception have never landed
    art("BENCH_r01.json", ["weights_seconds", "eve_train_ms_per_step"])
    art("BENCH_r02.json", ["attn_grouped_ms_t256",
                           "msa_transformer_table_seconds"])
    order = bench._family_order(str(tmp_path))
    # kcol is an _ALWAYS_LAST opt-in extra: it closes the batch even
    # though it has never been captured
    assert order == ["poet", "tranception", "attn", "weights", "eve",
                     "msa_transformer", "kcol"]

    # no artifacts at all -> canonical order, every family exactly once
    empty = tmp_path / "empty"
    empty.mkdir()
    assert bench._family_order(str(empty)) == bench.FAMILIES
    assert sorted(order) == sorted(bench.FAMILIES)

    # an unreadable artifact is ignored, not fatal
    (tmp_path / "BENCH_r03.json").write_text("not json{")
    assert bench._family_order(str(tmp_path)) == order

    # the REAL repo artifacts must leave poet/tranception first until a
    # driver run finally captures them (this assertion self-retires: once
    # BENCH_r05 lands their keys, _family_order reverts them to the tail
    # and the canonical-order branch above covers the logic)
    repo_order = bench._family_order()
    for fam in bench.FAMILIES:
        assert fam in repo_order


def test_family_stage_dispatch_is_complete():
    """measure_families must have a stage function for every declared
    family, dispatched from the order list (no stage may be orphaned by
    a rename)."""
    import re

    import bench

    src = open(BENCH).read()
    fn = src[src.index("def measure_families"):src.index(
        "# Parent orchestration")]
    for fam in bench.FAMILIES:
        assert f"def stage_{fam}(" in fn, f"missing stage fn for {fam}"
        assert re.search(rf'"{fam}": stage_{fam}', fn), (
            f"stage_{fam} not wired into the dispatch dict"
        )
