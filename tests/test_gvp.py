"""GVP ops + ESM-IF1 (GVP-Transformer) behavioral invariants.

Fast CPU checks on the production inverse-folding path
(models/gvp_transformer.py — the implementation the ``esm_if1`` scorer
uses; weight-level parity lives in test_gvp_transformer_parity.py):
rotation invariance of the structure encoder, decoder causality,
structure conditioning, and batch/single consistency.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import gvp_transformer as gt
from proteingym_tpu.ops import gvp

AA = "ACDEFGHIKLMNPQRSTVWY"
TINY = gt.PRESETS["esm_if1_tiny"]


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


def _params():
    return gt.init_params(jax.random.PRNGKey(0), TINY)


class TestGvpTransformerBehavior:
    def test_scores_rotation_and_translation_invariant(self):
        rs = np.random.RandomState(1)
        coords = synthetic_helix_backbone(14)[:, :3]
        params = _params()
        q, _ = np.linalg.qr(rs.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        moved = coords @ q + np.array([3.0, 1.0, -2.0])
        seq = "".join(AA[i] for i in rs.randint(0, 20, 14))
        s1 = gt.score_sequences(params, TINY, coords, [seq])
        s2 = gt.score_sequences(params, TINY, moved, [seq])
        # invariant by construction (GVP + local frames); the slack is
        # f32 noise through the RBF distance features
        np.testing.assert_allclose(s1, s2, atol=5e-3)

    def test_decoder_causal(self):
        coords = synthetic_helix_backbone(10)[:, :3]
        params = _params()
        pc, conf, padding = gt.prepare_structure(coords)
        enc = gt.encoder_apply(
            params, TINY, jnp.asarray(pc)[None], jnp.asarray(padding)[None],
            jnp.asarray(conf)[None],
        )
        t1 = gt.tokenize("ACDEFGHIKL")
        t2 = t1.copy()
        t2[-2] = (t2[-2] + 1) % 20
        pad = jnp.asarray(padding)[None]
        l1 = np.asarray(gt.decoder_apply(
            params, TINY, jnp.asarray(t1[None]), enc, pad))
        l2 = np.asarray(gt.decoder_apply(
            params, TINY, jnp.asarray(t2[None]), enc, pad))
        # logits before the edited position are unchanged (causal mask)
        np.testing.assert_allclose(l1[0, : len(t1) - 2],
                                   l2[0, : len(t1) - 2], atol=1e-4)

    def test_structure_conditions_scores(self):
        rs = np.random.RandomState(2)
        params = _params()
        seq = "".join(AA[i] for i in rs.randint(0, 20, 12))
        c1 = synthetic_helix_backbone(12, seed=0)[:, :3]
        c2 = synthetic_helix_backbone(12, seed=3)[:, :3] + rs.randn(
            12, 3, 3) * 2.0
        s1 = gt.score_sequences(params, TINY, c1, [seq])
        s2 = gt.score_sequences(params, TINY, c2, [seq])
        assert not np.allclose(s1, s2)

    def test_batched_scoring_matches_single(self):
        params = _params()
        coords = synthetic_helix_backbone(10)[:, :3]
        seqs = ["ACDEFGHIKL", "ACDEFGHIKW", "WCDEFGHIKL"]
        batched = gt.score_sequences(params, TINY, coords, seqs,
                                     batch_size=3)
        singles = np.concatenate(
            [gt.score_sequences(params, TINY, coords, [s]) for s in seqs]
        )
        np.testing.assert_allclose(batched, singles, atol=1e-4)
