"""Breadth model families: ESM-C, xTrimoPGLM, MIF, MULAN, VenusREM, AIDO."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import esmc, structure_plms, xtrimo

AA = "ACDEFGHIKLMNPQRSTVWY"
TINY_ESMC = esmc.EsmcConfig("tiny", 2, 64, 4, dtype=jnp.float32)


class TestEsmc:
    def test_vocab_order_differs_from_esm2(self):
        from proteingym_tpu.models.esm2 import ALPHABET as E2

        assert esmc.ALPHABET.get_idx("L") == 4  # frequency-ordered
        assert E2.get_idx("L") == 4  # same here by coincidence of ordering
        assert esmc.ALPHABET.get_idx("A") == 5
        assert esmc.ALPHABET.mask_idx == 32

    def test_swiglu_hidden_rounding(self):
        # ref blocks.py:15-17: round up to multiple of 256
        assert esmc._swiglu_hidden(8 / 3, 960) == 2560
        assert esmc._swiglu_hidden(8 / 3, 1152) % 256 == 0

    def test_scoring_both_strategies(self):
        params = esmc.init_params(jax.random.PRNGKey(0), TINY_ESMC)
        rs = np.random.RandomState(0)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 12))
        muts = [f"{seq[1]}2{'A' if seq[1] != 'A' else 'C'}"]
        mm = esmc.score_assay(params, TINY_ESMC, seq, muts, chunk=4)
        wt = esmc.score_assay(params, TINY_ESMC, seq, muts,
                              strategy="wt-marginals")
        assert np.isfinite(mm).all() and np.isfinite(wt).all()

    def test_residue_scaling_changes_output(self):
        import dataclasses

        params = esmc.init_params(jax.random.PRNGKey(0), TINY_ESMC)
        scaled = dataclasses.replace(TINY_ESMC, residue_scaling=2.0)
        toks = jnp.asarray(esmc.ALPHABET.tokenize("ACDEFG")[None])
        a = np.asarray(esmc.apply(params, TINY_ESMC, toks))
        b = np.asarray(esmc.apply(params, scaled, toks))
        assert not np.allclose(a, b)


class TestXtrimo:
    def test_ar_mode_is_causal_mlm_is_not(self):
        params = esmc.init_params(jax.random.PRNGKey(0), TINY_ESMC)
        t1 = esmc.ALPHABET.tokenize("ACDEFGHI")
        t2 = t1.copy()
        t2[-2] = (t2[-2] + 1) % 24 + 4
        a_ar = np.asarray(xtrimo.apply(params, TINY_ESMC,
                                       jnp.asarray(t1[None]), mode="ar"))
        b_ar = np.asarray(xtrimo.apply(params, TINY_ESMC,
                                       jnp.asarray(t2[None]), mode="ar"))
        np.testing.assert_allclose(a_ar[0, :-2], b_ar[0, :-2], atol=1e-4)
        a_mlm = np.asarray(xtrimo.apply(params, TINY_ESMC,
                                        jnp.asarray(t1[None]), mode="mlm"))
        b_mlm = np.asarray(xtrimo.apply(params, TINY_ESMC,
                                        jnp.asarray(t2[None]), mode="mlm"))
        assert not np.allclose(a_mlm[0, 0], b_mlm[0, 0])

    def test_both_scoring_modes(self):
        params = esmc.init_params(jax.random.PRNGKey(0), TINY_ESMC)
        rs = np.random.RandomState(1)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 10))
        muts = [f"{seq[2]}3{'A' if seq[2] != 'A' else 'C'}"]
        mseqs = [seq[:2] + muts[0][-1] + seq[3:]]
        s_mlm = xtrimo.score_assay(params, TINY_ESMC, seq, muts, mseqs,
                                   mode="mlm", chunk=4)
        s_ar = xtrimo.score_assay(params, TINY_ESMC, seq, muts, mseqs,
                                  mode="ar", batch_size=4)
        assert np.isfinite(s_mlm).all() and np.isfinite(s_ar).all()


class TestMif:
    def test_structure_conditions_scores(self):
        from proteingym_tpu.models.carp import CarpConfig

        cfg = CarpConfig("tiny", 2, 32, max_dilation=2, dtype=jnp.float32)
        feat_dim = structure_plms.mif_structure_features(
            synthetic_helix_backbone(10)
        ).shape[1]
        params = structure_plms.mif_init(jax.random.PRNGKey(0), cfg, feat_dim)
        rs = np.random.RandomState(2)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 10))
        muts = [f"{seq[3]}4{'A' if seq[3] != 'A' else 'C'}"]
        c1 = synthetic_helix_backbone(10, seed=0)
        c2 = synthetic_helix_backbone(10, seed=1) + 3.0
        s1 = structure_plms.mif_score_assay(params, cfg, c1, seq, muts)
        s2 = structure_plms.mif_score_assay(params, cfg, c2, seq, muts)
        assert np.isfinite(s1).all()
        assert not np.allclose(s1, s2)


class TestMulan:
    def test_adapter_changes_scores(self):
        from proteingym_tpu.models import esm2

        cfg = esm2.EsmConfig("tiny", 2, 64, 4, dtype=jnp.float32)
        params = structure_plms.mulan_init(jax.random.PRNGKey(0), cfg)
        rs = np.random.RandomState(3)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 10))
        muts = [f"{seq[4]}5{'A' if seq[4] != 'A' else 'C'}"]
        coords = synthetic_helix_backbone(10)
        s = structure_plms.mulan_score_assay(params, cfg, coords, seq, muts,
                                             chunk=4)
        assert np.isfinite(s).all()
        # zeroing the adapter reduces to plain ESM scoring
        zeroed = dict(params)
        zeroed["angle_adapter"] = jax.tree.map(
            jnp.zeros_like, params["angle_adapter"]
        )
        from proteingym_tpu.models.esm_scoring import score_assay

        plain = score_assay(
            lambda t: esm2.apply(params, cfg, t), seq, muts, chunk=4
        )
        s0 = structure_plms.mulan_score_assay(zeroed, cfg, coords, seq, muts,
                                              chunk=4)
        np.testing.assert_allclose(s0, plain, atol=1e-4)
        assert not np.allclose(s, plain)


class TestVenusrem:
    def test_retrieval_shifts_scores(self):
        from proteingym_tpu.models import esm2

        cfg = esm2.EsmConfig("tiny", 2, 64, 4, dtype=jnp.float32)
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        rs = np.random.RandomState(4)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 10))
        muts = [f"{seq[2]}3{'A' if seq[2] != 'A' else 'C'}"]
        aln = [seq] + ["".join(AA[(AA.index(c) + rs.randint(3)) % 20]
                               for c in seq) for _ in range(5)]
        plain = structure_plms.venusrem_score_assay(
            params, cfg, seq, muts, chunk=4
        )
        fused = structure_plms.venusrem_score_assay(
            params, cfg, seq, muts, seq_alignment=aln, chunk=4
        )
        assert not np.allclose(plain, fused)

    def test_alignment_count_logits_normalized(self):
        logf = structure_plms.alignment_count_logits(["ACD", "ACD", "WCD"])
        np.testing.assert_allclose(np.exp(logf).sum(1), 1.0, rtol=1e-9)
        assert logf[0, 0] > logf[0, 5]  # A more frequent than F at pos 0


class TestAido:
    def test_moe_mlm_scoring_with_retrieval(self):
        cfg = structure_plms.AidoConfig(
            "tiny", num_layers=2, embed_dim=32, num_heads=4, ffn_dim=48,
            num_experts=4, top_k=2, dtype=jnp.float32,
        )
        params = structure_plms.aido_init(jax.random.PRNGKey(0), cfg)
        rs = np.random.RandomState(5)
        seq = "".join(AA[i] for i in rs.randint(0, 20, 10))
        muts = [f"{seq[1]}2{'A' if seq[1] != 'A' else 'C'}"]
        fam = [seq for _ in range(4)]
        plain = structure_plms.aido_score_assay(params, cfg, seq, muts,
                                                chunk=4)
        fused = structure_plms.aido_score_assay(
            params, cfg, seq, muts, msa_sequences=fam, chunk=4
        )
        assert np.isfinite(plain).all() and np.isfinite(fused).all()
        assert not np.allclose(plain, fused)


class TestCarpConverter:
    """Converter for zenodo ByteNetLM checkpoints: the op program is
    reconstructed from parameter shapes (models/carp.py banner)."""

    def _fabricate_sd(self, d_emb=8, d=32, n_layers=2, k=5, vocab=30):
        import torch

        torch.manual_seed(0)
        sd = {"embedder.embedder.weight": torch.randn(vocab, d_emb),
              "embedder.up_embedder.conv.weight": torch.randn(d, d_emb, 1),
              "last_norm.weight": torch.ones(d),
              "last_norm.bias": torch.zeros(d),
              "decoder.conv.weight": torch.randn(vocab, d, 1),
              "decoder.conv.bias": torch.zeros(vocab)}
        dh = d // 2
        for i in range(n_layers):
            b = f"embedder.layers.{i}"
            sd[f"{b}.sequence1.0.weight"] = torch.ones(d)
            sd[f"{b}.sequence1.0.bias"] = torch.zeros(d)
            sd[f"{b}.sequence1.2.conv.weight"] = torch.randn(dh, d, 1) * 0.1
            sd[f"{b}.sequence1.3.weight"] = torch.ones(dh)
            sd[f"{b}.sequence1.3.bias"] = torch.zeros(dh)
            sd[f"{b}.conv.conv.weight"] = torch.randn(dh, dh, k) * 0.1
            sd[f"{b}.conv.conv.bias"] = torch.zeros(dh)
            sd[f"{b}.sequence2.0.weight"] = torch.ones(dh)
            sd[f"{b}.sequence2.0.bias"] = torch.zeros(dh)
            sd[f"{b}.sequence2.2.conv.weight"] = torch.randn(d, dh, 1) * 0.1
            sd[f"{b}.sequence2.2.conv.bias"] = torch.zeros(d)
        return sd

    def test_op_program_inferred(self):
        from proteingym_tpu.models import carp

        sd = self._fabricate_sd()
        c = carp.CarpConfig("tiny", num_layers=2, embed_dim=32)
        params = carp.convert_torch_state_dict(sd, c)
        kinds = ["ln" if "ln" in op else "pff"
                 for op in params["blocks"][0]["pre"]]
        assert kinds == ["ln", "pff", "ln"]
        kinds2 = ["ln" if "ln" in op else "pff"
                  for op in params["blocks"][0]["post"]]
        assert kinds2 == ["ln", "pff"]
        assert "up" in params and "final_ln" in params

    def test_converted_apply_runs_and_scores(self):
        import jax.numpy as jnp

        from proteingym_tpu.models import carp

        sd = self._fabricate_sd()
        c = carp.CarpConfig("tiny", num_layers=2, embed_dim=32,
                            dtype=jnp.float32)
        params = carp.convert_torch_state_dict(sd, c)
        tok = carp.CarpTokenizer()
        seq = "MKTAYIAKQRQISFVK"
        logits = carp.apply_converted(
            params, c, jnp.asarray(tok.encode(seq)[None])
        )
        assert logits.shape == (1, len(seq), 30)
        assert np.isfinite(np.asarray(logits)).all()
        scores = carp.score_assay(params, c, seq, ["M1A", "K2W"],
                                  strategy="wt-marginals")
        assert np.isfinite(scores).all() and scores.std() > 0
