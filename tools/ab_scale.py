"""Measure the scale-fold move + G sweep at T=1024 (long path + prod)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgym_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from proteingym_tpu.models.esm2 import ALPHABET, PRESETS, init_params, make_apply_fn
    from proteingym_tpu.models.esm_scoring import masked_marginal_table, score_assay
    from proteingym_tpu.models.packed_scoring import score_assays_packed

    config = PRESETS["esm2_t33_650M"]
    params = jax.jit(lambda k: init_params(k, config))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    apply_fn = make_apply_fn(config)
    AA = "ACDEFGHIKLMNPQRSTVWY"

    def synth(L, seed):
        r = np.random.RandomState(seed)
        seq = "".join(AA[i] for i in r.randint(0, 20, L))
        muts = [f"{seq[p]}{p+1}{m}" for p in range(L) for m in AA if m != seq[p]]
        return seq, muts

    # headline
    run = lambda s: np.asarray(masked_marginal_table(
        apply_fn, ALPHABET.tokenize(synth(250, s)[0]), params=params,
        chunk=16, pad_to_multiple=64))
    run(0)
    ts = []
    for s in (1, 2):
        t0 = time.perf_counter(); run(s); ts.append(time.perf_counter()-t0)
    print(f"headline: {min(ts):.3f}s ({19*250/min(ts):.0f} mut/s)", flush=True)

    # long path
    def run_long(s):
        seq, muts = synth(1500, s)
        return np.asarray(score_assay(None, seq, muts,
            strategy="masked-marginals", chunk=16, window=1024,
            params=params, apply_fn=apply_fn))
    run_long(0)
    t0 = time.perf_counter(); run_long(1); dt = time.perf_counter()-t0
    print(f"long: {dt:.2f}s ({19*1500/dt:.0f} mut/s)", flush=True)

    # production mix
    prod_lengths = [72, 118, 250, 448, 709, 1500]
    prod = [synth(n, 100+i) for i, n in enumerate(prod_lengths)]
    n_mut = sum(len(m) for _, m in prod)
    def run_prod():
        return score_assays_packed(apply_fn, params, prod, chunk=16,
                                   super_chunks=8, pad_to_multiple=64)
    run_prod()
    t0 = time.perf_counter(); run_prod(); dt = time.perf_counter()-t0
    print(f"prod_mix: {dt:.2f}s ({n_mut/dt:.0f} mut/s)", flush=True)

if __name__ == "__main__":
    main()
