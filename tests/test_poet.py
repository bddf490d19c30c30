"""PoET tiered transformer: segment isolation, causality, context scoring."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.models import poet

AA = "ACDEFGHIKLMNPQRSTWYV"
TINY = poet.PoetConfig(name="tiny", num_layers=2, hidden_dim=32, num_heads=4,
                       ffn_dim=64, dtype=jnp.float32)


def _family(rs, n, L):
    focus = "".join(AA[i] for i in rs.randint(0, 20, L))
    out = [focus]
    for _ in range(n - 1):
        s = list(focus)
        for p in rs.choice(L, 3, replace=False):
            s[p] = AA[rs.randint(20)]
        out.append("".join(s))
    return out


class TestAlphabet:
    def test_tokens(self):
        enc = poet.ALPHABET.encode("ARN-XOUBZ")
        assert enc[0] == 0 and enc[1] == 1 and enc[2] == 2
        assert enc[3] == poet.GAP
        assert enc[4] == poet.MASK_X
        # synonyms: O->K(11), U->C(4); B/Z encode as mask
        # (ref alphabets.py:81-87 maps 'OUBZ' -> [11, 4, mask, mask])
        assert list(enc[5:]) == [11, 4, poet.MASK_X, poet.MASK_X]


class TestTieredAttention:
    def test_causality_over_flattened_row(self):
        rs = np.random.RandomState(0)
        params = poet.init_params(jax.random.PRNGKey(0), TINY)
        ctx = _family(rs, 2, 6)
        t1, s1, p1, v1, _ = poet.build_rows(ctx, ["ACDEFG"])
        t2 = t1.copy()
        t2[0, -2] = (t2[0, -2] + 1) % 20  # change a late query residue
        l1 = np.asarray(poet.apply(params, TINY, jnp.asarray(t1),
                                   jnp.asarray(s1), jnp.asarray(p1),
                                   jnp.asarray(v1)))
        l2 = np.asarray(poet.apply(params, TINY, jnp.asarray(t2),
                                   jnp.asarray(s1), jnp.asarray(p1),
                                   jnp.asarray(v1)))
        np.testing.assert_allclose(l1[0, : t1.shape[1] - 2],
                                   l2[0, : t1.shape[1] - 2], atol=1e-4)

    def test_context_changes_query_logits(self):
        """The multi tier must let the query see the family context."""
        rs = np.random.RandomState(1)
        params = poet.init_params(jax.random.PRNGKey(0), TINY)
        fam1 = _family(rs, 3, 8)
        fam2 = _family(np.random.RandomState(99), 3, 8)
        q = ["ACDEFGHI"]
        s1 = poet.score_queries(params, TINY, fam1, q)
        s2 = poet.score_queries(params, TINY, fam2, q)
        assert not np.allclose(s1, s2)

    def test_empty_context_still_scores(self):
        params = poet.init_params(jax.random.PRNGKey(0), TINY)
        s = poet.score_queries(params, TINY, [], ["ACDEFG", "ACDEFG"])
        assert np.isfinite(s).all()
        np.testing.assert_allclose(s[0], s[1], rtol=1e-5)

    def test_query_padding_invariance(self):
        """Scores must not depend on other (longer) queries in the batch."""
        rs = np.random.RandomState(2)
        params = poet.init_params(jax.random.PRNGKey(0), TINY)
        ctx = _family(rs, 2, 6)
        alone = poet.score_queries(params, TINY, ctx, ["ACDEFG"])
        padded = poet.score_queries(
            params, TINY, ctx, ["ACDEFG", "ACDEFGHIKLMN"]
        )
        np.testing.assert_allclose(alone[0], padded[0], atol=1e-3)


class TestContextSampling:
    def test_budget_respected_and_deterministic(self):
        rs = np.random.RandomState(3)
        fam = _family(rs, 30, 10)
        w = rs.rand(30)
        ctx1 = poet.sample_context(fam, w, max_tokens=60, seed=5)
        ctx2 = poet.sample_context(fam, w, max_tokens=60, seed=5)
        assert ctx1 == ctx2
        assert sum(len(s) + 2 for s in ctx1) <= 60

    def test_gaps_stripped(self):
        ctx = poet.sample_context(["AC-DE", "A..CD"], None, 100, 0)
        assert all("-" not in s and "." not in s for s in ctx)


class TestAssayScoring:
    def test_ensemble_over_contexts(self):
        rs = np.random.RandomState(4)
        params = poet.init_params(jax.random.PRNGKey(0), TINY)
        fam = _family(rs, 10, 8)
        muts = [fam[0], fam[0][:3] + "W" + fam[0][4:]]
        scores = poet.score_assay_poet(
            params, TINY, muts, fam, max_context_tokens=40,
            n_context_samples=2, batch_size=2,
        )
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()
        assert scores[0] != scores[1]
