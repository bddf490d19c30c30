"""Ring attention: exact-parity vs dense attention on an 8-device mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import Mesh

from proteingym_tpu.ops.flash_attention import reference_mha
from proteingym_tpu.ops.ring_attention import ring_attention


def _mesh(n, name="sp"):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


class TestRingAttention:
    def test_matches_dense_attention(self, rng):
        B, H, T, D = 2, 4, 64, 16
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        mesh = _mesh(8)
        out = ring_attention(q, k, v, mesh, axis="sp")
        ref = reference_mha(q, k, v, sm_scale=D**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_key_padding_mask(self, rng):
        B, H, T, D = 1, 2, 32, 8
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        mask = np.ones((B, T), bool)
        mask[:, 24:] = False  # last quarter of keys padded
        mesh = _mesh(4)
        out = ring_attention(q, k, v, mesh, axis="sp",
                             key_mask=jnp.asarray(mask))
        ref = reference_mha(q, k, v, key_mask=jnp.asarray(mask),
                            sm_scale=D**-0.5)
        # only REAL query rows matter (padded queries are discarded upstream)
        np.testing.assert_allclose(
            np.asarray(out)[:, :, :24], np.asarray(ref)[:, :, :24],
            atol=2e-5, rtol=2e-5,
        )

    def test_sharded_output_layout_and_jit(self, rng):
        """ring_attention composes under jit with sharded inputs."""
        B, H, T, D = 1, 2, 64, 8
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        mesh = _mesh(8)
        out = jax.jit(
            lambda a: ring_attention(a, a, a, mesh, axis="sp")
        )(q)
        ref = reference_mha(q, q, q, sm_scale=D**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )
