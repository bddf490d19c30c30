"""Real-architecture ProSST tests.

The HF modeling file isn't vendored/fetchable (trust_remote_code + zero
egress), so the positional disentangled machinery is validated against
transformers' OWN DeBERTa-v1 (which ProSST derives from), and the
structure-stream terms are checked behaviorally."""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

from proteingym_tpu.models import prosst

SEQ = "MKTAYIAKQRQISFVK"


class TestProSSTDebertaCrossCheck:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import DebertaConfig, DebertaForMaskedLM

        c = prosst.PROSST_PRESETS["prosst_tiny"]
        cfg = DebertaConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden,
            num_hidden_layers=c.num_layers, num_attention_heads=c.num_heads,
            intermediate_size=c.intermediate,
            relative_attention=True, pos_att_type=["c2p", "p2c"],
            max_relative_positions=c.max_relative_positions,
            position_biased_input=False, type_vocab_size=0,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64,
        )
        ref = DebertaForMaskedLM(cfg).eval()
        # scale_factor 3 = content + c2p + p2c (no structure terms)
        import dataclasses

        c3 = dataclasses.replace(c, scale_factor=3)
        params = prosst.convert_hf_state_dict(
            ref.state_dict(), c3, allow_missing_ss=True
        )
        return ref, c3, params

    def test_logits_match_deberta(self, pair):
        """With the ss stream zeroed and scale_factor=3 our model IS
        DeBERTa v1 — logits must match transformers exactly."""
        import jax.numpy as jnp

        ref, c3, params = pair
        tokens = prosst.tokenize_prosst(SEQ)[None]
        with torch.no_grad():
            out = ref(input_ids=torch.tensor(tokens).long()).logits.numpy()
        ss = np.zeros_like(tokens)
        got = np.asarray(
            prosst.prosst_apply(params, c3, jnp.asarray(tokens),
                                jnp.asarray(ss))
        )
        np.testing.assert_allclose(got, out, atol=2e-4, rtol=1e-3)

    def test_long_sequence_bucketing(self, pair):
        """Sequences longer than max_relative_positions exercise the
        att_span clipping path."""
        import jax.numpy as jnp

        ref, c3, params = pair
        long_seq = (SEQ * 3)[: c3.max_relative_positions + 10]
        tokens = prosst.tokenize_prosst(long_seq)[None]
        with torch.no_grad():
            out = ref(input_ids=torch.tensor(tokens).long()).logits.numpy()
        got = np.asarray(
            prosst.prosst_apply(params, c3, jnp.asarray(tokens),
                                jnp.asarray(np.zeros_like(tokens)))
        )
        np.testing.assert_allclose(got, out, atol=3e-4, rtol=1e-3)


class TestProSSTStructureStream:
    def test_structure_tokens_condition_the_logits(self):
        import jax

        c = prosst.PROSST_PRESETS["prosst_tiny"]
        params = prosst.prosst_init_params(jax.random.PRNGKey(0), c)
        # amplify the structure stream so the conditioning signal clears
        # float noise at tiny-random-init scale
        params["ss_embeddings"] = params["ss_embeddings"] * 50.0
        rng = np.random.RandomState(0)
        ss_a = rng.randint(0, 16, len(SEQ))
        ss_b = (ss_a + 1) % 16
        s_a = prosst.score_assay_prosst_real(
            params, c, SEQ, ss_a, [f"{SEQ[2]}3A", f"{SEQ[5]}6W"]
        )
        s_b = prosst.score_assay_prosst_real(
            params, c, SEQ, ss_b, [f"{SEQ[2]}3A", f"{SEQ[5]}6W"]
        )
        assert np.isfinite(s_a).all() and np.isfinite(s_b).all()
        assert not np.allclose(s_a, s_b)

    def test_tokenize_structure_sequence_shift(self):
        """[1] + (t+3) + [2] (ref prosst/compute_fitness.py:20-28)."""
        got = prosst.tokenize_structure_sequence([0, 5, 2047])
        np.testing.assert_array_equal(got, [1, 3, 8, 2050, 2])

    def test_structure_fasta_roundtrip(self, tmp_path):
        f = tmp_path / "p.fasta"
        f.write_text(">P\n3,14,15,92,6\n")
        got = prosst.read_structure_sequence_fasta(f)
        np.testing.assert_array_equal(got, [3, 14, 15, 92, 6])

    def test_mismatched_lengths_raise(self):
        import jax

        c = prosst.PROSST_PRESETS["prosst_tiny"]
        params = prosst.prosst_init_params(jax.random.PRNGKey(0), c)
        with pytest.raises(ValueError):
            prosst.score_assay_prosst_real(
                params, c, SEQ, [1, 2, 3], ["M1A"]
            )

    def test_wt_rows_score_zero(self):
        """Assays with a literal 'WT' row score it 0 instead of crashing
        (the reference label handling treats such rows as wild-type)."""
        import jax

        c = prosst.PROSST_PRESETS["prosst_tiny"]
        params = prosst.prosst_init_params(jax.random.PRNGKey(0), c)
        ss = np.zeros(len(SEQ), np.int64)
        s = prosst.score_assay_prosst_real(
            params, c, SEQ, ss, ["WT", "", f"{SEQ[2]}3A"]
        )
        assert s[0] == 0.0 and s[1] == 0.0 and s[2] != 0.0


class TestVenusRemReal:
    def test_alignment_count_log_softmax(self):
        seqs = ["MK-A", "MKTA", "mkta"]
        cm = prosst.alignment_count_log_softmax(seqs)
        assert cm.shape == (4, 25)
        # column 0: all M -> P(M)=1 -> log_softmax of a one-hot prob vector
        p = np.exp(cm[0])
        assert p.argmax() == prosst.PROSST_IDX["M"]
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
        # column 2: one gap -> pad mass dilutes
        assert np.exp(cm[2])[prosst.P_PAD] > np.exp(cm[0])[prosst.P_PAD]

    def test_parse_alignment_range(self):
        assert prosst.parse_alignment_range(">seq/5-20", 30) == (4, 20)
        assert prosst.parse_alignment_range(">seq", 30) == (0, 30)

    def test_blending_moves_scores(self):
        import jax

        c = prosst.PROSST_PRESETS["prosst_tiny"]
        params = prosst.prosst_init_params(jax.random.PRNGKey(0), c)
        rng = np.random.RandomState(0)
        ss = rng.randint(0, 16, len(SEQ))
        muts = [f"{SEQ[2]}3A", f"{SEQ[5]}6W"]
        base = prosst.venusrem_score_assay_real(
            params, c, SEQ, ss, muts, aa_alignment=None
        )
        # alignment that strongly supports A at position 3
        aln = ([f">hom/1-{len(SEQ)}"],
               [SEQ[:2] + "A" + SEQ[3:]] * 5 + [SEQ])
        blended = prosst.venusrem_score_assay_real(
            params, c, SEQ, ss, muts, aa_alignment=aln
        )
        assert blended[0] > base[0]  # retrieval favors the A mutation
