"""ESM-IF1 (GVP-Transformer) parity vs the reference's vendored torch model
(ref esm/esm/inverse_folding/): feature pipeline, GVP stack, encoder/decoder
logits, and the ll_fullseq scoring contract."""

import argparse

import numpy as np
import pytest
import torch

from tests.reference_torch import load_ref_if1, requires_reference

torch.manual_seed(0)

TINY = dict(
    dropout=0.0,
    attention_dropout=0.0,
    encoder_embed_dim=32,
    decoder_embed_dim=32,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=2,
    decoder_attention_heads=2,
    encoder_ffn_embed_dim=64,
    decoder_ffn_embed_dim=64,
    gvp_top_k_neighbors=6,
    gvp_node_hidden_dim_scalar=16,
    gvp_node_hidden_dim_vector=4,
    gvp_edge_hidden_dim_scalar=8,
    gvp_edge_hidden_dim_vector=1,
    gvp_num_encoder_layers=2,
    gvp_dropout=0.0,
)

SEQ = "MKTAYIAKQRQI"


def make_coords(L, seed=3):
    """A jagged backbone walk with realistic ~3.8A CA spacing."""
    rng = np.random.RandomState(seed)
    ca = np.cumsum(rng.randn(L, 3) * 1.2 + np.array([3.0, 0.5, 0.0]), axis=0)
    n = ca + rng.randn(L, 3) * 0.4 + np.array([-1.2, 0.4, 0.0])
    c = ca + rng.randn(L, 3) * 0.4 + np.array([1.2, -0.4, 0.0])
    return np.stack([n, ca, c], axis=1).astype(np.float32)


@requires_reference
class TestGvpTransformerParity:
    @pytest.fixture(scope="class")
    def pair(self):
        m = load_ref_if1()
        import esm as ref_esm

        alphabet = ref_esm.data.Alphabet.from_architecture("invariant_gvp")
        args = argparse.Namespace(**TINY)
        ref = m.GVPTransformerModel(args, alphabet).eval()

        from proteingym_tpu.models import gvp_transformer as ours

        config = ours.GVPTransformerConfig(
            name="tiny",
            **{k: v for k, v in TINY.items()
               if k not in ("dropout", "attention_dropout", "gvp_dropout")},
        )
        params = ours.convert_torch_state_dict(ref.state_dict(), config)
        return ref, alphabet, ours, config, params

    def test_alphabet_matches(self, pair):
        _, alphabet, ours, _, _ = pair
        assert ours.IF1_TOKENS == list(alphabet.all_toks)
        assert ours.PAD_IDX == alphabet.padding_idx
        assert ours.CATH_IDX == alphabet.get_idx("<cath>")
        assert ours.MASK_IDX == alphabet.mask_idx

    def _ref_batch(self, alphabet, coords, seq):
        from esm.inverse_folding.util import CoordBatchConverter

        converter = CoordBatchConverter(alphabet)
        return converter([(coords, None, seq)])

    def test_batch_preparation_matches(self, pair):
        ref, alphabet, ours, config, params = pair
        coords = make_coords(len(SEQ))
        rc, rconf, _, rtok, rpad = self._ref_batch(alphabet, coords, SEQ)
        pc, conf, padding = ours.prepare_structure(coords)
        np.testing.assert_allclose(pc, rc.numpy()[0])
        np.testing.assert_allclose(conf, rconf.numpy()[0])
        np.testing.assert_array_equal(padding, rpad.numpy()[0])
        np.testing.assert_array_equal(ours.tokenize(SEQ), rtok.numpy()[0])

    def test_encoder_matches(self, pair):
        ref, alphabet, ours, config, params = pair
        import jax.numpy as jnp

        coords = make_coords(len(SEQ))
        rc, rconf, _, rtok, rpad = self._ref_batch(alphabet, coords, SEQ)
        with torch.no_grad():
            enc = ref.encoder(rc, rpad, rconf)["encoder_out"][0]
        ref_enc = enc.numpy()[:, 0]  # T x B x C -> T x C
        got = np.asarray(
            ours.encoder_apply(
                params, config, jnp.asarray(rc.numpy()),
                jnp.asarray(rpad.numpy()), jnp.asarray(rconf.numpy()),
            )
        )[0]
        np.testing.assert_allclose(got, ref_enc, atol=2e-4, rtol=1e-3)

    def test_logits_match(self, pair):
        ref, alphabet, ours, config, params = pair
        import jax.numpy as jnp

        coords = make_coords(len(SEQ))
        rc, rconf, _, rtok, rpad = self._ref_batch(alphabet, coords, SEQ)
        prev = rtok[:, :-1]
        with torch.no_grad():
            logits, _ = ref(rc, rpad, rconf, prev)  # B x V x T
        ref_logits = logits.numpy()[0].T  # T x V
        got = np.asarray(
            ours.forward(
                params, config, jnp.asarray(rc.numpy()),
                jnp.asarray(rpad.numpy()), jnp.asarray(rconf.numpy()),
                jnp.asarray(prev.numpy()),
            )
        )[0]
        np.testing.assert_allclose(got, ref_logits, atol=2e-4, rtol=1e-3)

    def test_ll_fullseq_scoring_matches(self, pair):
        """End-to-end mutant scoring contract: mean per-token log-lik
        (ref esm/compute_fitness_esm_if1.py:33-39)."""
        ref, alphabet, ours, config, params = pair
        coords = make_coords(len(SEQ))
        mutants = [SEQ, "A" + SEQ[1:], SEQ[:5] + "W" + SEQ[6:]]

        ref_scores = []
        for seq in mutants:
            rc, rconf, _, rtok, rpad = self._ref_batch(alphabet, coords, seq)
            prev, tgt = rtok[:, :-1], rtok[:, 1:]
            with torch.no_grad():
                logits, _ = ref(rc, rpad, rconf, prev)
            loss = torch.nn.functional.cross_entropy(
                logits, tgt, reduction="none"
            )
            tpad = (tgt == alphabet.padding_idx).numpy()
            ref_scores.append(
                -np.sum(loss.numpy() * ~tpad) / np.sum(~tpad)
            )

        got = ours.score_sequences(params, config, coords, mutants,
                                   batch_size=2)
        np.testing.assert_allclose(got, np.asarray(ref_scores), atol=1e-5,
                                   rtol=1e-5)

    def test_nan_coords_handled(self, pair):
        """Residues with missing coords follow the reference masking path."""
        ref, alphabet, ours, config, params = pair
        import jax.numpy as jnp

        coords = make_coords(len(SEQ)).copy()
        coords[4] = np.nan  # missing residue -> becomes padding per converter
        rc, rconf, _, rtok, rpad = self._ref_batch(alphabet, coords, SEQ)
        prev = rtok[:, :-1]
        with torch.no_grad():
            logits, _ = ref(rc, rpad, rconf, prev)
        ref_logits = logits.numpy()[0].T
        got = np.asarray(
            ours.forward(
                params, config, jnp.asarray(rc.numpy()),
                jnp.asarray(rpad.numpy()), jnp.asarray(rconf.numpy()),
                jnp.asarray(prev.numpy()),
            )
        )[0]
        np.testing.assert_allclose(got, ref_logits, atol=2e-4, rtol=1e-3)


@requires_reference
class TestMultichainParity:
    def test_complex_scoring_matches(self):
        """score_sequence_in_complex: target chain decoded against the
        whole complex backbone with nan spacers
        (ref esm/esm/inverse_folding/multichain_util.py:54-135)."""
        m = load_ref_if1()
        import esm as ref_esm
        from esm.inverse_folding import multichain_util

        alphabet = ref_esm.data.Alphabet.from_architecture("invariant_gvp")
        args = argparse.Namespace(**TINY)
        torch.manual_seed(1)
        ref = m.GVPTransformerModel(args, alphabet).eval()

        from proteingym_tpu.models import gvp_transformer as ours

        config = ours.GVPTransformerConfig(
            name="tiny",
            **{k: v for k, v in TINY.items()
               if k not in ("dropout", "attention_dropout", "gvp_dropout")},
        )
        params = ours.convert_torch_state_dict(ref.state_dict(), config)

        coords = {
            "A": make_coords(len(SEQ), seed=3),
            "B": make_coords(8, seed=9),
        }
        mutants = [SEQ, "A" + SEQ[1:]]
        got = ours.score_sequences_in_complex(
            params, config, coords, "A", mutants, batch_size=2
        )
        exp = []
        for seq in mutants:
            ll_fullseq, _ = multichain_util.score_sequence_in_complex(
                ref, alphabet, coords, "A", seq
            )
            exp.append(ll_fullseq)
        np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)
