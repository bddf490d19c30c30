"""Structure-model stack: EGNN ops, ProtSSN, CARP conv LM."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import carp, protssn
from proteingym_tpu.ops.gnn import EgnnConfig, egnn_apply, egnn_init, knn_graph

AA = "ACDEFGHIKLMNPQRSTVWY"


class TestGnnOps:
    def test_knn_excludes_self_and_is_symmetric_under_translation(self):
        rs = np.random.RandomState(0)
        coords = jnp.asarray(rs.randn(12, 3))
        idx = np.asarray(knn_graph(coords, 4))
        assert idx.shape == (12, 4)
        for i in range(12):
            assert i not in idx[i]
        idx2 = np.asarray(knn_graph(coords + 5.0, 4))
        np.testing.assert_array_equal(idx, idx2)

    def test_egnn_feature_invariance_to_rigid_motion(self):
        """E(n) invariance: rotating + translating coords must not change
        node features (coords not updated)."""
        rs = np.random.RandomState(1)
        cfg = EgnnConfig(node_dim=8, hidden_dim=16, num_layers=2,
                         k_neighbors=5)
        params = egnn_init(jax.random.PRNGKey(0), cfg)
        feats = jnp.asarray(rs.randn(10, 8).astype(np.float32))
        coords = jnp.asarray(rs.randn(10, 3).astype(np.float32))
        # random rotation via QR
        q, _ = np.linalg.qr(rs.randn(3, 3))
        coords_rot = coords @ jnp.asarray(q.astype(np.float32)) + 2.0
        h1, _ = egnn_apply(params, cfg, feats, coords)
        h2, _ = egnn_apply(params, cfg, feats, coords_rot)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-3)

    def test_egnn_coord_update_equivariance(self):
        rs = np.random.RandomState(2)
        cfg = EgnnConfig(node_dim=4, hidden_dim=8, num_layers=1,
                         k_neighbors=4, update_coords=True)
        params = egnn_init(jax.random.PRNGKey(1), cfg)
        feats = jnp.asarray(rs.randn(8, 4).astype(np.float32))
        coords = jnp.asarray(rs.randn(8, 3).astype(np.float32))
        q, _ = np.linalg.qr(rs.randn(3, 3))
        qj = jnp.asarray(q.astype(np.float32))
        _, x1 = egnn_apply(params, cfg, feats, coords)
        _, x2 = egnn_apply(params, cfg, feats, coords @ qj)
        np.testing.assert_allclose(
            np.asarray(x1 @ qj), np.asarray(x2), atol=1e-3
        )


class TestProtssn:
    def test_score_and_denoise_training(self):
        rs = np.random.RandomState(3)
        L = 14
        cfg = protssn.ProtssnConfig(node_dim=16, hidden_dim=16, num_layers=2,
                                    k_neighbors=5)
        params = protssn.init_params(jax.random.PRNGKey(0), cfg)
        emb = rs.randn(L, 16).astype(np.float32)
        ca = synthetic_helix_backbone(L)[:, 1]
        seq = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{seq[2]}3A" if seq[2] != "A" else f"{seq[2]}3C",
                f"{seq[5]}6W" if seq[5] != "W" else f"{seq[5]}6C"]
        scores = protssn.score_mutants(
            params, cfg, jnp.asarray(emb), jnp.asarray(ca), seq, muts
        )
        assert scores.shape == (2,) and np.isfinite(scores).all()

        # denoising training drives up native-sequence likelihood
        native = np.asarray([AA.index(c) for c in seq])

        def native_ll(p):
            t = np.asarray(protssn.logits(p, cfg, jnp.asarray(emb), jnp.asarray(ca)))
            return t[np.arange(L), native].mean()

        before = native_ll(params)
        trained = protssn.train_denoising(
            params, cfg, emb, ca, native, steps=60, learning_rate=3e-3
        )
        assert native_ll(trained) > before

    def test_wt_mismatch_raises(self):
        cfg = protssn.ProtssnConfig(node_dim=8, hidden_dim=8, num_layers=1,
                                    k_neighbors=3)
        params = protssn.init_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            protssn.score_mutants(
                params, cfg, jnp.zeros((5, 8)),
                jnp.asarray(synthetic_helix_backbone(5)[:, 1]),
                "AAAAA", ["C1G"],
            )


class TestCarp:
    CFG = carp.CarpConfig(name="tiny", num_layers=4, embed_dim=32,
                          max_dilation=4, dtype=jnp.float32)

    def test_not_causal_and_context_sensitive(self):
        """CARP is a bidirectional conv LM: changing a LATER residue changes
        logits at EARLIER positions (receptive field k=5 dilated)."""
        params = carp.init_params(jax.random.PRNGKey(0), self.CFG)
        tok = carp.CarpTokenizer()
        a = tok.encode("ACDEFGHIKL")
        b = a.copy()
        b[8] = tok.get_idx("W")
        la = np.asarray(carp.apply(params, self.CFG, jnp.asarray(a[None])))
        lb = np.asarray(carp.apply(params, self.CFG, jnp.asarray(b[None])))
        assert not np.allclose(la[0, 6], lb[0, 6])

    def test_masked_vs_wt_marginals(self):
        params = carp.init_params(jax.random.PRNGKey(0), self.CFG)
        rs = np.random.RandomState(4)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 12))
        muts = [f"{seq[1]}2A" if seq[1] != "A" else f"{seq[1]}2C",
                f"{seq[3]}4C:{seq[7]}8W"]
        mm = carp.score_assay(params, self.CFG, seq, muts,
                              strategy="masked-marginals", chunk=4)
        wt = carp.score_assay(params, self.CFG, seq, muts,
                              strategy="wt-marginals")
        assert mm.shape == wt.shape == (2,)
        assert np.isfinite(mm).all() and np.isfinite(wt).all()
        assert not np.allclose(mm, wt)

    def test_multi_mutant_averages(self):
        """label_row divides by the number of positions (ref :29)."""
        params = carp.init_params(jax.random.PRNGKey(0), self.CFG)
        seq = "ACDEFGHIKL"
        single = carp.score_assay(params, self.CFG, seq, ["A1C"],
                                  strategy="wt-marginals")
        double = carp.score_assay(params, self.CFG, seq, ["A1C:A1C"],
                                  strategy="wt-marginals")
        np.testing.assert_allclose(single, double, rtol=1e-6)


class TestS3f:
    def test_multi_scale_fusion_scores(self):
        from proteingym_tpu.models import s3f

        rs = np.random.RandomState(9)
        L = 12
        cfg = s3f.S3fConfig(plm_dim=16, hidden_dim=16, num_layers=2,
                            k_neighbors=4)
        params = s3f.init_params(jax.random.PRNGKey(0), cfg)
        emb = rs.randn(L, 16).astype(np.float32)
        coords = synthetic_helix_backbone(L)
        seq = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{seq[2]}3{'A' if seq[2] != 'A' else 'C'}", "WT"]
        s = s3f.score_mutants(params, cfg, emb, coords, seq, muts)
        assert np.isfinite(s).all() and s[1] == 0.0
        # S3F-MSA variant shifts scores
        fam = [seq] * 3
        s_msa = s3f.score_mutants(params, cfg, emb, coords, seq, muts,
                                  msa_sequences=fam)
        assert not np.allclose(s[0], s_msa[0])

    def test_s2f_variant_ignores_surface(self):
        import dataclasses as dc

        from proteingym_tpu.models import s3f

        rs = np.random.RandomState(10)
        L = 10
        cfg3 = s3f.S3fConfig(plm_dim=8, hidden_dim=8, num_layers=1,
                             k_neighbors=3, use_surface=True)
        cfg2 = dc.replace(cfg3, use_surface=False)
        params = s3f.init_params(jax.random.PRNGKey(1), cfg3)
        emb = rs.randn(L, 8).astype(np.float32)
        coords = synthetic_helix_backbone(L)
        seq = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{seq[1]}2{'A' if seq[1] != 'A' else 'C'}"]
        a = s3f.score_mutants(params, cfg3, emb, coords, seq, muts)
        b = s3f.score_mutants(params, cfg2, emb, coords, seq, muts)
        assert not np.allclose(a, b)
