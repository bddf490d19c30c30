"""Benchmark: ESM2 masked-marginal scoring throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
... extra fields ...}.

The reference publishes no throughput numbers (BASELINE.md: accuracy
leaderboards only), so vs_baseline is measured against the north-star
target of 5000 mutants/sec/chip for ESM2-650M masked-marginal scoring
(SURVEY.md §6; smaller presets scale the target by parameter ratio).

v2 (VERDICT r1 item 8): besides the headline L=250 single-assay number, the
JSON carries
  - "mfu": measured model FLOP utilization of the headline run (analytic
    transformer FLOPs / wall-clock / bf16 peak),
  - "long_seq_mutants_per_sec": L=1500 assay through the optimal-window
    path (window=1022 tokens, the scheme that defines benchmark semantics
    for long proteins, ref esm/compute_fitness.py:492-495),
  - "bucketed_mutants_per_sec": a 3-assay sweep (L=137/250/412) through
    score_assay's length-bucketed padding — the production multi-assay
    shape mix.

Method: a real-size ESM2 (random weights — throughput is architecture
bound), the (L, V) masked-marginal table via chunked batched forwards with
the weights flowing as jit ARGUMENTS (no multi-GB closure constants), then
scoring of the full single-substitution DMS (L*19 mutants). Mutants/sec =
mutants scored / wall time; the table build dominates, exactly as in
production scoring.

Robustness: the tunneled TPU in this environment occasionally stalls on
very large compiles, so the measurement runs in a watchdogged subprocess
and falls back 650M -> 150M -> 8M until one completes; the preset that ran
is encoded in the metric name. The inner process prints a JSON line after
EVERY completed stage, and the parent takes the last parseable one, so a
mid-extras timeout still reports the headline number. Inputs are varied
between timing iterations because the tunneled backend memoizes identical
dispatches.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# per-preset north-star targets: 5000 mutants/s at 650M, scaled by rough
# FLOP ratio for the fallbacks
TARGETS = {
    "esm2_t33_650M": 5000.0,
    "esm2_t30_150M": 5000.0 * (650 / 150),
    "esm2_t6_8M": 5000.0 * (650 / 8),
    "esm2_smoke": 5000.0,
}
FALLBACKS = ["esm2_t33_650M", "esm2_t30_150M", "esm2_t6_8M"]
# tunnel-side compiles for the 650M graph have been observed anywhere from
# 16s to 375s; give it headroom before falling back (steady-state is fast)
PRESET_TIMEOUTS = {"esm2_t33_650M": 1500.0}
DEFAULT_TIMEOUT = float(os.environ.get("PGYM_BENCH_TIMEOUT", 700))
CACHE_DIR = os.environ.get("PGYM_XLA_CACHE", "/tmp/pgym_xla_cache")

# bf16 MXU peak per chip for MFU accounting (TPU v5e; the axon tunnel
# fronts one v5e chip — measured ~113 TFLOP/s on ESM2-650M forwards)
PEAK_FLOPS = {"tpu": 197e12, "axon": 197e12}


def _param_count(params):
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _table_flops(n_params: int, n_layers: int, d: int, rows: int, t: int):
    """Analytic forward FLOPs for one masked-marginal table: ``rows``
    forwards over ``t`` padded tokens. 2*N per matmul token (fwd MACs) +
    attention scores/values 4*t*d per token per layer."""
    per_token = 2.0 * n_params + 4.0 * n_layers * t * d
    return rows * t * per_token


def _synth_assay(seq_len: int, seed: int):
    aa = "ACDEFGHIKLMNPQRSTVWY"
    rs = np.random.RandomState(seed)
    seq = "".join(aa[i] for i in rs.randint(0, 20, seq_len))
    mutants = [
        f"{seq[p]}{p + 1}{m}" for p in range(seq_len) for m in aa
        if m != seq[p]
    ]
    return seq, mutants


def measure(preset: str) -> None:
    """Run one preset in-process; called in the watchdogged subprocess.
    Prints a JSON line after every completed stage (last line wins)."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    # persistent compile cache: repeat bench runs skip the (minutes-long,
    # tunnel-variable) 650M compile entirely
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from proteingym_tpu.models.esm2 import (
        ALPHABET, PRESETS, EsmConfig, init_params, make_apply_fn,
    )
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_assay, score_mutants_from_table,
    )

    backend = jax.default_backend()
    if backend == "cpu":
        preset = "esm2_smoke"
        config = EsmConfig(name="esm2_smoke", num_layers=4, embed_dim=256,
                           num_heads=8)
    else:
        config = PRESETS[preset]

    t_start = time.perf_counter()

    def log(msg):
        print(f"[bench +{time.perf_counter() - t_start:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    log(f"backend={backend} model={config.name}")
    rng = jax.random.PRNGKey(0)
    # jitted init: ONE device program instead of thousands of eager dispatches
    params = jax.jit(lambda k: init_params(k, config))(rng)
    jax.block_until_ready(params)
    n_params = _param_count(params)
    log(f"params initialized on device ({n_params / 1e6:.0f}M)")

    chunk = 32 if backend != "cpu" else 8
    apply_fn = make_apply_fn(config)  # stable across runs -> one compile

    # ---- headline: L=250 single assay -----------------------------------
    seq_len = 250
    # two distinct assays of the same shape: the tunneled backend memoizes
    # identical dispatches, so timing iterations must vary their inputs
    assays = [_synth_assay(seq_len, s) for s in (0, 1)]

    def run(seq, mutants):
        tokens = ALPHABET.tokenize(seq)
        table = masked_marginal_table(
            apply_fn, tokens, chunk=chunk, params=params,
        )
        return score_mutants_from_table(table, mutants, seq)

    run(*assays[0])
    log("warmup/compile done")
    t0 = time.perf_counter()
    n_iters = 2
    for i in range(n_iters):
        scores = run(*assays[i % len(assays)])  # noqa: F841
    dt = (time.perf_counter() - t0) / n_iters
    n_mutants = len(assays[0][1])
    log(f"steady run: {dt:.2f}s for {n_mutants} mutants")

    mutants_per_sec = n_mutants / dt
    # MFU: rows = seq positions + 2 specials, t = padded length
    t_pad = ((seq_len + 2 + 63) // 64) * 64
    flops = _table_flops(
        n_params, config.num_layers, config.embed_dim, seq_len + 2, t_pad
    )
    peak = PEAK_FLOPS.get(backend)
    mfu = round(flops / dt / peak, 4) if peak else None

    target = TARGETS[config.name]
    result = {
        "metric": f"{config.name}_masked_marginal_throughput",
        "value": round(mutants_per_sec, 2),
        "unit": "mutants/sec/chip",
        "vs_baseline": round(mutants_per_sec / target, 4),
        "mfu": mfu,
        "model_flops_per_table": flops,
        "backend": backend,
    }
    print(json.dumps(result), flush=True)

    # ---- long-sequence: L=1500 through the optimal-window path ----------
    try:
        long_len = 1500
        # full single-substitution DMS: all 19*L mutants amortize the one
        # windowed table, exactly as in production scoring
        long_assays = [_synth_assay(long_len, s) for s in (2, 3)]

        def run_long(seq, mutants):
            return score_assay(
                lambda toks: None,  # unused: params path below
                seq, mutants, strategy="masked-marginals", chunk=chunk,
                window=1022 + 2, params=params, apply_fn=apply_fn,
            )

        run_long(*long_assays[0])
        log("long-seq warmup done")
        t0 = time.perf_counter()
        for i in range(2):
            run_long(*long_assays[i % 2])
        dt_long = (time.perf_counter() - t0) / 2
        result["long_seq_len"] = long_len
        result["long_seq_mutants_per_sec"] = round(
            len(long_assays[0][1]) / dt_long, 2
        )
        log(f"long-seq steady: {dt_long:.2f}s")
        print(json.dumps(result), flush=True)
    except Exception as e:  # noqa: BLE001 — extras must not kill the headline
        log(f"long-seq stage failed: {e!r}")

    # ---- bucketed multi-assay sweep --------------------------------------
    try:
        lengths = [137, 250, 412]
        # two full assay SETS with distinct sequences: iteration-to-iteration
        # input variation without changing the scored-mutant count
        sweeps = [
            [_synth_assay(n, 10 * rep + i) for i, n in enumerate(lengths)]
            for rep in (1, 2)
        ]

        def run_sweep(sweep):
            total = 0
            for seq, mutants in sweep:
                score_assay(
                    lambda toks: None, seq, mutants,
                    strategy="masked-marginals", chunk=chunk,
                    window=1024, params=params, apply_fn=apply_fn,
                )
                total += len(mutants)
            return total

        run_sweep(sweeps[0])
        log("bucketed sweep warmup done")
        t0 = time.perf_counter()
        n = run_sweep(sweeps[0]) + run_sweep(sweeps[1])
        dt_sweep = time.perf_counter() - t0
        result["bucketed_lengths"] = lengths
        result["bucketed_mutants_per_sec"] = round(n / dt_sweep, 2)
        log(f"bucketed sweep: {dt_sweep:.2f}s for {n} mutants")
        print(json.dumps(result), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"bucketed stage failed: {e!r}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        measure(sys.argv[2])
        return

    def last_json_line(text):
        for line in reversed((text or "").strip().splitlines()):
            try:
                json.loads(line)
                return line
            except json.JSONDecodeError:
                continue
        return None

    for preset in FALLBACKS:
        try:
            out = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), "--inner",
                 preset],
                capture_output=True, text=True,
                timeout=PRESET_TIMEOUTS.get(preset, DEFAULT_TIMEOUT),
            )
            stdout, stderr, rc = out.stdout, out.stderr, out.returncode
        except subprocess.TimeoutExpired as e:
            # salvage whatever stages completed before the watchdog fired
            stdout = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            rc = -1
            print(f"[bench] {preset} timed out", file=sys.stderr)
        line = last_json_line(stdout)
        if line and (rc == 0 or rc == -1):
            print(line)
            return
        print((stderr or "")[-2000:], file=sys.stderr)
    # last resort: in-process smoke (always works on CPU)
    measure("esm2_t6_8M")


if __name__ == "__main__":
    main()
