"""A/B the headline table: row padding to tile multiples + chunk size.
Derived from the trace finding (hlo_stats): 5.9% of device time is
q/k/v pad ops at T=252, plus data-formatting around them.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgym_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from proteingym_tpu.models.esm2 import ALPHABET, PRESETS, init_params, make_apply_fn
    from proteingym_tpu.models.esm_scoring import masked_marginal_table

    config = PRESETS["esm2_t33_650M"]
    params = jax.jit(lambda k: init_params(k, config))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    apply_fn = make_apply_fn(config)
    AA = "ACDEFGHIKLMNPQRSTVWY"

    def tokens(seed):
        r = np.random.RandomState(seed)
        return ALPHABET.tokenize("".join(AA[i] for i in r.randint(0, 20, 250)))

    variants = [
        ("base_c32", dict(chunk=32)),
        ("pad64_c32", dict(chunk=32, pad_to_multiple=64)),
        ("pad64_c64", dict(chunk=64, pad_to_multiple=64)),
        ("pad64_c16", dict(chunk=16, pad_to_multiple=64)),
    ]
    for name, kw in variants:
        def run(s):
            return np.asarray(masked_marginal_table(
                apply_fn, tokens(s), params=params, **kw))
        run(0)
        times = []
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            run(s)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name}: {best:.3f}s/table ({19*250/best:.0f} mut/s) "
              f"times={[round(t,3) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
