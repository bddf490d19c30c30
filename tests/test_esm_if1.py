"""ESM-IF1-class inverse folding: GVP equivariance, decoder causality."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import esm_if1
from proteingym_tpu.ops import gvp

AA = "ACDEFGHIKLMNPQRSTVWY"
TINY = esm_if1.EsmIf1Config(
    name="tiny", node_s=16, node_v=4, num_gvp_layers=2, k_neighbors=6,
    dec_layers=2, dec_dim=32, dec_heads=4,
)


class TestGvp:
    def test_scalar_invariance_vector_equivariance(self):
        rs = np.random.RandomState(0)
        key = jax.random.PRNGKey(0)
        p = gvp.gvp_init(key, s_in=5, v_in=3, s_out=7, v_out=2)
        s = jnp.asarray(rs.randn(4, 5).astype(np.float32))
        v = jnp.asarray(rs.randn(4, 3, 3).astype(np.float32))
        q, _ = np.linalg.qr(rs.randn(3, 3))
        qj = jnp.asarray(q.astype(np.float32))
        s1, v1 = gvp.gvp_apply(p, s, v)
        s2, v2 = gvp.gvp_apply(p, s, v @ qj)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(v1 @ qj), np.asarray(v2), atol=1e-4
        )

    def test_node_features_shapes(self):
        coords = synthetic_helix_backbone(12)
        s, v = gvp.backbone_node_features(coords)
        assert s.shape == (12, 6) and v.shape == (12, 3, 3)
        # dihedral sin/cos bounded
        assert (np.abs(s) <= 1 + 1e-6).all()


class TestEncoder:
    def test_memory_rotation_invariant(self):
        rs = np.random.RandomState(1)
        coords = synthetic_helix_backbone(14)
        params = esm_if1.init_params(jax.random.PRNGKey(0), TINY)
        q, _ = np.linalg.qr(rs.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        moved = coords @ q + np.array([3.0, 1.0, -2.0])
        m1 = np.asarray(esm_if1.encode_structure(params, TINY, coords))
        m2 = np.asarray(esm_if1.encode_structure(params, TINY, moved))
        np.testing.assert_allclose(m1, m2, atol=1e-3)


class TestDecoder:
    def test_causal(self):
        coords = synthetic_helix_backbone(10)
        params = esm_if1.init_params(jax.random.PRNGKey(0), TINY)
        memory = esm_if1.encode_structure(params, TINY, coords)
        t1 = esm_if1.tokenize("ACDEFGHIKL")
        t2 = t1.copy()
        t2[-2] = (t2[-2] + 1) % 20
        l1 = np.asarray(esm_if1.decode(params, TINY, memory,
                                       jnp.asarray(t1[None])))
        l2 = np.asarray(esm_if1.decode(params, TINY, memory,
                                       jnp.asarray(t2[None])))
        np.testing.assert_allclose(l1[0, :-2], l2[0, :-2], atol=1e-4)

    def test_structure_conditions_scores(self):
        rs = np.random.RandomState(2)
        params = esm_if1.init_params(jax.random.PRNGKey(0), TINY)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 12))
        c1 = synthetic_helix_backbone(12, seed=0)
        c2 = synthetic_helix_backbone(12, seed=3) + rs.randn(12, 4, 3) * 2.0
        s1 = esm_if1.score_sequences(params, TINY, c1, [seq])
        s2 = esm_if1.score_sequences(params, TINY, c2, [seq])
        assert not np.allclose(s1, s2)

    def test_batched_scoring_matches_single(self):
        rs = np.random.RandomState(3)
        params = esm_if1.init_params(jax.random.PRNGKey(0), TINY)
        coords = synthetic_helix_backbone(10)
        seqs = ["ACDEFGHIKL", "ACDEFGHIKW", "WCDEFGHIKL"]
        batched = esm_if1.score_sequences(params, TINY, coords, seqs,
                                          batch_size=3)
        singles = np.concatenate(
            [esm_if1.score_sequences(params, TINY, coords, [s]) for s in seqs]
        )
        np.testing.assert_allclose(batched, singles, atol=1e-4)
