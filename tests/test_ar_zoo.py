"""AR zoo (ProGen2/RITA/ProtGPT2) + UniRep: causality, scoring semantics."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.models import ar_zoo, unirep
from proteingym_tpu.models.ar_scoring import batched_ar_loglik, score_mutants_ar

AA = "ACDEFGHIKLMNPQRSTVWY"

TINY_PROGEN = ar_zoo.ProGen2Config(
    name="tiny", num_layers=2, embed_dim=64, num_heads=8, rotary_dim=4,
    mp_num=8, dtype=jnp.float32,
)
TINY_RITA = ar_zoo.RitaConfig(
    name="tiny", num_layers=2, embed_dim=32, num_heads=4, ffn_dim=64,
    dtype=jnp.float32,
)
TINY_GPT2 = ar_zoo.Gpt2Config(
    name="tiny", num_layers=2, embed_dim=32, num_heads=4, vocab_size=64,
    dtype=jnp.float32,
)


def _causality_check(apply_fn, params, cfg, vocab, rs):
    """Changing a suffix token must not change logits at earlier positions."""
    t = 12
    toks = rs.randint(0, vocab, (1, t)).astype(np.int32)
    toks2 = toks.copy()
    toks2[0, -1] = (toks2[0, -1] + 1) % vocab
    a = np.asarray(apply_fn(params, cfg, jnp.asarray(toks)))
    b = np.asarray(apply_fn(params, cfg, jnp.asarray(toks2)))
    np.testing.assert_allclose(a[0, : t - 1], b[0, : t - 1], atol=1e-4)
    assert not np.allclose(a[0, t - 1], b[0, t - 1])


class TestProGen2:
    def test_causal(self):
        rs = np.random.RandomState(0)
        params = ar_zoo.progen2_init(jax.random.PRNGKey(0), TINY_PROGEN)
        _causality_check(
            ar_zoo.progen2_apply, params, TINY_PROGEN, 30, rs
        )

    def test_restricted_logits_renormalize(self):
        params = ar_zoo.progen2_init(jax.random.PRNGKey(0), TINY_PROGEN)
        fn = ar_zoo.progen2_restricted_logits_fn(params, TINY_PROGEN)
        toks = jnp.asarray(np.zeros((1, 6), np.int32))
        out = fn(toks)
        assert out.shape == (1, 6, 25)

    def test_tokenizer(self):
        tok = ar_zoo.ProGen2Tokenizer()
        ids = tok.encode("1ACDE2")
        assert ids[0] == 3 and ids[-1] == 4  # terminal tokens "1"/"2"
        assert (ids[1:-1] >= ar_zoo.PROGEN2_AA_FIRST).all()

    def test_absolute_ar_scoring_no_wt(self):
        """ProGen2-style scoring: no WT delta, mirrored, length-normalized
        (ref progen2/compute_fitness.py:34-87)."""
        params = ar_zoo.progen2_init(jax.random.PRNGKey(0), TINY_PROGEN)
        fn = ar_zoo.progen2_restricted_logits_fn(params, TINY_PROGEN)
        rs = np.random.RandomState(1)
        seqs = ["".join(AA[i] for i in rs.randint(0, 20, 15)) for _ in range(4)]
        aa_tok = {c: i for i, c in enumerate("ABCDEFGHIKLMNOPQRSTUVWXYZ")}

        def tokenize(s):
            return np.asarray([aa_tok[c] for c in s], np.int32)

        frame = score_mutants_ar(
            fn, tokenize, pad_id=aa_tok["X"], mutants=["m"] * 4,
            mutated_sequences=seqs, target_seq=None, model_context_len=10,
            scoring_mirror=True, batch_size=4,
        )
        assert len(frame) == 4
        assert np.isfinite(frame["avg_score"]).all()


class TestRita:
    def test_causal(self):
        rs = np.random.RandomState(2)
        params = ar_zoo.rita_init(jax.random.PRNGKey(0), TINY_RITA)
        _causality_check(ar_zoo.rita_apply, params, TINY_RITA, 26, rs)

    def test_tokenizer_covers_extended_aas(self):
        tok = ar_zoo.RitaTokenizer()
        ids = tok.encode("ACDEUXZB")
        assert len(ids) == 8
        assert (ids >= 2).all()


class TestGpt2:
    def test_causal(self):
        rs = np.random.RandomState(3)
        params = ar_zoo.gpt2_init(jax.random.PRNGKey(0), TINY_GPT2)
        _causality_check(ar_zoo.gpt2_apply, params, TINY_GPT2, 64, rs)


class TestUniRep:
    def test_causal_mlstm(self):
        cfg = unirep.UniRepConfig(embed_dim=8, hidden_dim=32)
        params = unirep.init_params(jax.random.PRNGKey(0), cfg)
        rs = np.random.RandomState(4)
        _causality_check(unirep.apply, params, cfg, 26, rs)

    def test_loglik_via_harness(self):
        cfg = unirep.UniRepConfig(embed_dim=8, hidden_dim=32)
        params = unirep.init_params(jax.random.PRNGKey(0), cfg)
        tok = unirep.UniRepTokenizer()
        rows = [tok.encode("MKT"), tok.encode("MKTAYIA")]
        lls = batched_ar_loglik(
            lambda t: unirep.apply(params, cfg, t), rows, tok.PAD, batch_size=2
        )
        assert lls.shape == (2,)
        assert (lls < 0).all()

    def test_evotune_improves_family_loglik(self):
        cfg = unirep.UniRepConfig(embed_dim=8, hidden_dim=32)
        params = unirep.init_params(jax.random.PRNGKey(0), cfg)
        rs = np.random.RandomState(5)
        fam = ["MK" + "".join(AA[i] for i in rs.randint(0, 4, 10))
               for _ in range(16)]
        tok = unirep.UniRepTokenizer()
        rows = [tok.encode(s) for s in fam]

        def ll(p):
            return batched_ar_loglik(
                lambda t: unirep.apply(p, cfg, t), rows, tok.PAD
            ).mean()

        before = ll(params)
        tuned = unirep.evotune(params, cfg, fam, steps=60, learning_rate=1e-2)
        after = ll(tuned)
        assert after > before
