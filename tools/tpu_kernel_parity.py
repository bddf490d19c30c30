"""On-device sanity: grouped kernel vs reference_mha on the real TPU
(Mosaic miscompiles don't show in interpret-mode CPU tests)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from proteingym_tpu.ops.flash_attention import (
        _apply_rope_bhtd, grouped_mha, reference_mha)
    rs = np.random.RandomState(0)
    for (b, h, t, d) in ((2, 4, 256, 64), (1, 20, 1024, 64)):
        q, k, v = (jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
                   for _ in range(3))
        km = jnp.asarray(rs.rand(b, t) > 0.1)
        got = np.asarray(grouped_mha(q, k, v, key_mask=km,
                                     rope_base=10000.0)).astype(np.float32)
        qr, kr = _apply_rope_bhtd(q, k, 10000.0)
        want = np.asarray(reference_mha(
            qr, kr, v, key_mask=km, sm_scale=d**-0.5,
        )).astype(np.float32)
        err = np.max(np.abs(got - want)[np.asarray(km)[:, None, :, None]
                     .repeat(h, 1).repeat(d, 3)])
        print(f"T={t}: max|err| at real keys = {err:.4f}")
        assert err < 3e-2, err
    print("TPU kernel parity OK")

if __name__ == "__main__":
    main()
