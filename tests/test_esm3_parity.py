"""ESM3 parity vs the vendored evoscale SDK: multi-track encoder, geometric
attention block, trunk, structure VQ-VAE tokenizer, and the
structure-conditioned masked-marginal scoring contract."""

import types

import numpy as np
import pytest
import torch

from tests.reference_torch import load_ref_esm3, requires_reference

torch.manual_seed(0)

SEQ = "MKTAYIAKQRQISFVK"


def make_coords(L, seed=11):
    rng = np.random.RandomState(seed)
    ca = np.cumsum(rng.randn(L, 3) * 1.1 + np.array([3.5, 0.4, 0.1]), axis=0)
    n = ca + rng.randn(L, 3) * 0.3 + np.array([-1.2, 0.4, 0.0])
    c = ca + rng.randn(L, 3) * 0.3 + np.array([1.2, -0.4, 0.0])
    return np.stack([n, ca, c], axis=1).astype(np.float32)


def _fake_tokenizers():
    seq = types.SimpleNamespace(mask_token_id=32)
    return types.SimpleNamespace(sequence=seq)


@requires_reference
class TestEsm3Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        m3, mv = load_ref_esm3()
        from proteingym_tpu.models import esm3 as ours

        c = ours.TINY
        ref = m3.ESM3(
            d_model=c.d_model, n_heads=c.n_heads, v_heads=c.v_heads,
            n_layers=c.n_layers,
            structure_encoder_fn=lambda d: None,
            structure_decoder_fn=lambda d: None,
            function_decoder_fn=lambda d: None,
            tokenizers=_fake_tokenizers(),
        ).eval()
        params = ours.convert_torch_state_dict(ref.state_dict(), c)
        return ref, ours, c, params

    def test_sequence_tokenizer_matches(self, pair):
        from tests.reference_torch import evoscale_module

        tok = evoscale_module("esm.tokenization").EsmSequenceTokenizer()
        _, ours, _, _ = pair
        got = ours.tokenize_sequence(SEQ)
        want = tok(SEQ)["input_ids"]
        np.testing.assert_array_equal(got, np.asarray(want))
        assert tok.mask_token_id == ours.SEQ_MASK

    def test_sequence_only_logits(self, pair):
        ref, ours, c, params = pair
        import jax.numpy as jnp

        tokens = ours.tokenize_sequence(SEQ)[None]
        with torch.no_grad():
            out = ref.forward(sequence_tokens=torch.tensor(tokens).long())
        got, _ = ours.forward(params, c, jnp.asarray(tokens))
        np.testing.assert_allclose(
            np.asarray(got), out.sequence_logits.numpy(), atol=2e-4, rtol=1e-3
        )

    def test_structure_conditioned_logits(self, pair):
        ref, ours, c, params = pair
        import jax.numpy as jnp

        L = len(SEQ)
        tokens = ours.tokenize_sequence(SEQ)[None]
        coords = np.full((L + 2, 3, 3), np.inf, np.float32)
        coords[1:-1] = make_coords(L)
        struct = np.random.RandomState(1).randint(
            0, 4096, L + 2
        ).astype(np.int32)
        struct[0] = ours.STRUCT_BOS
        struct[-1] = ours.STRUCT_EOS
        per_res = np.isfinite(coords).all(-1).any(-1).astype(np.float32)
        with torch.no_grad():
            out = ref.forward(
                sequence_tokens=torch.tensor(tokens).long(),
                structure_tokens=torch.tensor(struct[None]).long(),
                structure_coords=torch.tensor(coords[None]),
                average_plddt=torch.ones(1, L + 2),
                per_res_plddt=torch.tensor(per_res[None]),
            )
        got, _ = ours.forward(
            params, c, jnp.asarray(tokens),
            structure_tokens=jnp.asarray(struct[None]),
            coords=jnp.asarray(coords[None]),
            per_res_plddt=jnp.asarray(per_res[None]),
        )
        np.testing.assert_allclose(
            np.asarray(got), out.sequence_logits.numpy(), atol=3e-4, rtol=1e-3
        )

    @pytest.fixture(scope="class")
    def struct_pair(self):
        m3, mv = load_ref_esm3()
        from proteingym_tpu.models import esm3 as ours

        sc = ours.STRUCTURE_ENCODER_PRESETS["esm3_structure_encoder_tiny"]
        ref = mv.StructureTokenEncoder(
            d_model=sc.d_model, n_heads=sc.n_heads, v_heads=sc.v_heads,
            n_layers=sc.n_layers, d_out=sc.d_out, n_codes=sc.n_codes,
        ).eval()
        ref.knn = sc.knn
        params = ours.convert_structure_encoder_state_dict(
            ref.state_dict(), sc
        )
        return ref, ours, sc, params

    def test_structure_tokens_match(self, struct_pair):
        ref, ours, sc, params = struct_pair
        L = 20
        coords = make_coords(L, seed=5)
        residue_index = np.arange(L) + 1
        with torch.no_grad():
            _, idx = ref.encode(
                torch.tensor(coords[None]),
                residue_index=torch.tensor(residue_index[None]),
            )
        got = ours.structure_tokens_from_coords(
            params, sc, coords, residue_index
        )
        np.testing.assert_array_equal(got, idx.numpy()[0])

    def test_masked_marginal_scoring(self, pair, struct_pair):
        """End-to-end: mask each mutated position, structure fixed,
        score = logp[mt] - logp[wt] (ref evoscale/compute_fitness.py)."""
        ref, ours, c, params = pair
        sref, _, sc, sparams = struct_pair
        L = len(SEQ)
        coords = make_coords(L, seed=7)
        mutants = [f"{SEQ[2]}3A", f"{SEQ[5]}6W", f"{SEQ[2]}3A:{SEQ[5]}6W"]
        got = ours.score_assay_esm3(
            params, c, sparams, sc, SEQ, mutants, coords=coords, batch=2
        )

        # reference-path scores driven through the vendored torch model
        tokens, struct_tokens, pc = ours.prepare_tracks(
            sparams, sc, SEQ, coords
        )
        per_res = np.isfinite(pc).all(-1).any(-1).astype(np.float32)
        aa_tok = {a: int(ours.tokenize_sequence(a)[1])
                  for a in "ACDEFGHIKLMNPQRSTVWY"}
        ref_logp = {}
        for p in (2, 5):
            tok = tokens.copy()
            tok[p + 1] = ours.SEQ_MASK
            with torch.no_grad():
                out = ref.forward(
                    sequence_tokens=torch.tensor(tok[None]).long(),
                    structure_tokens=torch.tensor(
                        struct_tokens[None]).long(),
                    structure_coords=torch.tensor(pc[None]),
                    average_plddt=torch.ones(1, len(tok)),
                    per_res_plddt=torch.tensor(per_res[None]),
                )
            ref_logp[p] = torch.log_softmax(
                out.sequence_logits[0, p + 1], -1
            ).numpy()
        exp = [
            ref_logp[2][aa_tok["A"]] - ref_logp[2][aa_tok[SEQ[2]]],
            ref_logp[5][aa_tok["W"]] - ref_logp[5][aa_tok[SEQ[5]]],
        ]
        exp.append(exp[0] + exp[1])
        np.testing.assert_allclose(got, exp, atol=1e-3, rtol=1e-3)
