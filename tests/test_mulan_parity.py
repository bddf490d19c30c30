"""MULAN parity vs the vendored torch model (ref mulan/mulan/model.py,
model_utils.py): struct adapter, trunk injection point, masking semantics,
and the predict_mut scoring contract."""

import numpy as np
import pytest
import torch

from tests.reference_torch import load_ref_mulan, requires_reference

torch.manual_seed(0)

SEQ = "MKTAYIAKQRQISFVK"


def make_angles(L, seed=3):
    rng = np.random.RandomState(seed)
    ang = rng.uniform(-np.pi, np.pi, (L, 7))
    ang[2, 3:] = np.nan  # ragged chi slots
    return ang


@requires_reference
class TestMulanParity:
    @pytest.fixture(scope="class")
    def pair(self):
        m = load_ref_mulan()
        from transformers import EsmConfig as HfEsmConfig

        from proteingym_tpu.models import esm2, mulan

        tiny_esm = esm2.EsmConfig("tiny", 2, 64, 4)
        hf_cfg = HfEsmConfig(
            vocab_size=len(esm2.ALPHABET.all_toks),
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=256, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            max_position_embeddings=128, position_embedding_type="rotary",
            pad_token_id=esm2.ALPHABET.padding_idx,
            mask_token_id=esm2.ALPHABET.mask_idx,
            token_dropout=True, emb_layer_norm_before=False,
            # published ESM2 HF configs (and fair-esm without apex) use
            # eps=1e-5; transformers' EsmConfig default is 1e-12
            layer_norm_eps=1e-5,
        )
        hf_cfg._attn_implementation = "eager"
        ref = m.StructEsmForMaskedLM(
            hf_cfg, num_struct_embeddings_layers=1, struct_data_dim=7,
            use_struct_embeddings=True, predict_contacts="none",
            predict_angles=False,
        ).eval()
        import jax.numpy as jnp

        config = mulan.MulanConfig(
            name="tiny", esm=__import__("dataclasses").replace(
                tiny_esm, dtype=jnp.float32
            ),
        )
        params = mulan.convert_torch_state_dict(ref.state_dict(), config)
        return ref, mulan, config, params

    def _ref_forward(self, ref, tokens, feats):
        plddts = torch.ones(tokens.shape[0], tokens.shape[1] - 2)
        with torch.no_grad():
            out = ref(
                input_ids=torch.tensor(tokens).long(),
                attention_mask=torch.ones_like(
                    torch.tensor(tokens)).long(),
                struct_inputs=(torch.tensor(feats).float(), plddts),
            )
        logits = out["logits"] if isinstance(out, dict) else out.logits
        if isinstance(logits, dict):
            logits = logits["scores"]
        return logits.numpy()

    def test_logits_match(self, pair):
        ref, mulan, config, params = pair
        from proteingym_tpu.models import esm2

        tokens = esm2.ALPHABET.tokenize(SEQ)[None]
        feats = mulan.build_struct_features(make_angles(len(SEQ)))[None]
        want = self._ref_forward(ref, tokens, feats)
        import jax.numpy as jnp

        got = np.asarray(
            mulan.apply(params, config, jnp.asarray(tokens),
                        jnp.asarray(feats))
        )
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

    def test_masked_scoring_matches(self, pair):
        """predict_mut: mask token + -4.0 angle rows, p-ratio scoring
        (ref compute_fitness.py:27-77, 117-127)."""
        ref, mulan, config, params = pair
        from proteingym_tpu.models import esm2

        angles = make_angles(len(SEQ))
        muts = [f"{SEQ[2]}3A", f"{SEQ[5]}6W:{SEQ[8]}9L"]
        got = mulan.score_mutants(params, config, SEQ, angles, muts,
                                  batch_size=2)

        A = esm2.ALPHABET
        exp = []
        for m_info in muts:
            tokens = A.tokenize(SEQ)[None].copy()
            feats = mulan.build_struct_features(angles)[None].copy()
            for single in m_info.split(":"):
                pos = int(single[1:-1])
                tokens[0, pos] = A.mask_idx
                feats[0, pos] = -4.0
            logits = self._ref_forward(ref, tokens, feats)
            probs = torch.softmax(torch.tensor(logits), -1).numpy()
            score = 0.0
            for single in m_info.split(":"):
                wt, pos, mt = single[0], int(single[1:-1]), single[-1]
                score += np.log(
                    probs[0, pos, A.get_idx(mt)]
                    / probs[0, pos, A.get_idx(wt)]
                )
            exp.append(score)
        np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4)

    def test_struct_features_grid(self, pair):
        _, mulan, _, _ = pair
        ang = make_angles(5)
        grid = mulan.build_struct_features(ang)
        assert grid.shape == (7, 7)
        assert (grid[0] == 4.0).all() and (grid[-1] == 4.0).all()
        assert grid[3, 3] == pytest.approx(np.deg2rad(182.0))  # NaN fill
