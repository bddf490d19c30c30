"""G sweep at T=1024: PGYM_ATTN_SCORES_VMEM raises the scores budget so
two heads share a program (fewer per-program overheads)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgym_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from proteingym_tpu.models.esm2 import ALPHABET, PRESETS, init_params, make_apply_fn
    from proteingym_tpu.models.esm_scoring import score_assay

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

    def run_long(s):
        seq, muts = synth(1500, s)
        return np.asarray(score_assay(None, seq, muts,
            strategy="masked-marginals", chunk=16, window=1024,
            params=params, apply_fn=apply_fn))
    run_long(0)
    t0 = time.perf_counter(); run_long(1); dt = time.perf_counter()-t0
    print(f"long budget={os.environ.get('PGYM_ATTN_SCORES_VMEM','5MB')}: "
          f"{dt:.2f}s ({19*1500/dt:.0f} mut/s)", flush=True)

if __name__ == "__main__":
    main()
