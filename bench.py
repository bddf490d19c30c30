"""Benchmark: ESM2-650M masked-marginal scoring throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no throughput numbers (BASELINE.md: accuracy
leaderboards only), so vs_baseline is measured against the north-star target
of 5000 mutants/sec/chip for ESM2-650M masked-marginal scoring (SURVEY.md §6).

Method: a real-size ESM2-650M (random weights — throughput is architecture-
bound), one assay of length 250 (median-ish for ProteinGym), masked-marginal
table via chunked batched forwards, then score a full single-substitution
DMS (L*19 mutants). Mutants/sec = mutants scored / wall time, where the
dominant cost is the L-masked-forwards table build, exactly as in production
scoring.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=sys.stderr)


_T0 = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp

    from proteingym_tpu.models.esm2 import ALPHABET, PRESETS, apply, init_params
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table,
        score_mutants_from_table,
    )

    backend = jax.default_backend()
    config = PRESETS["esm2_t33_650M"]
    if backend == "cpu":  # CI / smoke fallback
        from proteingym_tpu.models.esm2 import EsmConfig

        config = EsmConfig(name="esm2_smoke", num_layers=4, embed_dim=256, num_heads=8)

    _log(f"backend={backend} model={config.name}")
    rng = jax.random.PRNGKey(0)
    # jitted init: ONE device program instead of thousands of small eager
    # dispatches (the tunnel's per-op latency dominates otherwise)
    params = jax.jit(lambda k: init_params(k, config))(rng)
    jax.block_until_ready(params)
    _log("params initialized on device")

    seq_len = 250
    chunk = 32 if backend != "cpu" else 8
    aa = "ACDEFGHIKLMNPQRSTVWY"
    rs = np.random.RandomState(0)
    seq = "".join(aa[i] for i in rs.randint(0, 20, seq_len))
    mutants = [
        f"{seq[p]}{p + 1}{m}" for p in range(seq_len) for m in aa if m != seq[p]
    ]

    def logits_fn(p, toks):
        return apply(p, config, toks)

    tokens = ALPHABET.tokenize(seq)

    def run():
        table = masked_marginal_table(
            logits_fn, tokens, chunk=chunk, params=params
        )
        scores = score_mutants_from_table(table, mutants, seq)
        return scores

    # warmup/compile
    run()
    _log("warmup/compile done")
    t0 = time.perf_counter()
    n_iters = 2
    for _ in range(n_iters):
        scores = run()
    dt = (time.perf_counter() - t0) / n_iters

    mutants_per_sec = len(mutants) / dt
    target = 5000.0
    print(
        json.dumps(
            {
                "metric": f"esm2_{'650M' if backend != 'cpu' else 'smoke'}_masked_marginal_throughput",
                "value": round(mutants_per_sec, 2),
                "unit": "mutants/sec/chip",
                "vs_baseline": round(mutants_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
