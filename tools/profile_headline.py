"""On-device jax.profiler trace of the headline ESM2-650M masked-marginal
table (VERDICT r4 item 2: decompose the ~0.2 s/table attention-adjacent
residual that per-dispatch microbenchmarks cannot resolve through the
tunnel's ~27 ms RTT floor — a trace written to disk on the device side
does not pay that floor).

Usage:  python tools/profile_headline.py [trace_dir]
Prints the top HLO ops by self-time from the captured trace.
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
# python tools/x.py puts tools/ (not the repo root) on sys.path; the axon
# backend plugin also fails to register when PYTHONPATH is used instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pgym_trace"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgym_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from proteingym_tpu.models.esm2 import (
        ALPHABET, PRESETS, init_params, make_apply_fn,
    )
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_mutants_from_table,
    )

    config = PRESETS["esm2_t33_650M"]
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_params(k, config))(rng)
    jax.block_until_ready(params)
    apply_fn = make_apply_fn(config)

    AA = "ACDEFGHIKLMNPQRSTVWY"
    rs = np.random.RandomState(0)
    seq_len = 250

    def assay(seed):
        r = np.random.RandomState(seed)
        seq = "".join(AA[i] for i in r.randint(0, 20, seq_len))
        muts = [f"{seq[p]}{p+1}{m}" for p in range(seq_len) for m in AA
                if m != seq[p]]
        return seq, muts

    def run(seq, muts):
        tokens = ALPHABET.tokenize(seq)
        table = masked_marginal_table(apply_fn, tokens, chunk=32,
                                      params=params)
        return score_mutants_from_table(table, muts, seq)

    print("warmup...", flush=True)
    np.asarray(run(*assay(0)))
    t0 = time.perf_counter()
    np.asarray(run(*assay(1)))
    steady = time.perf_counter() - t0
    print(f"steady {steady:.3f}s/table "
          f"({19*seq_len/steady:.0f} mut/s)", flush=True)

    with jax.profiler.trace(trace_dir):
        np.asarray(run(*assay(2)))
    print(f"trace written to {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
