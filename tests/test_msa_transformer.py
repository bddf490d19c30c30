"""MSA Transformer: axial-attention structure, batched masked-marginals,
weighted subsampling (ref esm/model/msa_transformer.py, compute_fitness.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.models import msa_transformer as mt
from proteingym_tpu.models.esm2 import ALPHABET

AA = "ACDEFGHIKLMNPQRSTVWY"
TINY = mt.MsaTransformerConfig(
    name="tiny", num_layers=2, embed_dim=32, num_heads=4, ffn_dim=64,
    max_rows=64, dtype=jnp.float32,
)


def _family(rs, n, L):
    focus = "".join(AA[i] for i in rs.randint(0, 20, L))
    seqs = [focus]
    for _ in range(n - 1):
        s = list(focus)
        for p in rs.choice(L, max(1, L // 5), replace=False):
            s[p] = AA[rs.randint(20)]
        seqs.append("".join(s))
    return focus, seqs


class TestForward:
    def test_shapes_and_finite(self):
        rs = np.random.RandomState(0)
        _, seqs = _family(rs, 6, 12)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        tokens = jnp.asarray(mt.tokenize_msa(seqs))[None]  # (1, R, C)
        logits = mt.apply(params, TINY, tokens)
        assert logits.shape == (1, 6, 13, TINY.alphabet_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_row_permutation_equivariance_of_first_row(self):
        """Tied row attention + column attention are permutation-equivariant
        over non-focus rows, so with the (row-order-sensitive) MSA position
        embedding zeroed, shuffling them must not change row-0 logits."""
        rs = np.random.RandomState(1)
        _, seqs = _family(rs, 8, 10)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        params["msa_position_embedding"] = jnp.zeros_like(
            params["msa_position_embedding"]
        )
        tokens = mt.tokenize_msa(seqs)
        perm = np.concatenate([[0], 1 + rs.permutation(7)])
        a = np.asarray(mt.apply(params, TINY, jnp.asarray(tokens[None]))[0, 0])
        b = np.asarray(
            mt.apply(params, TINY, jnp.asarray(tokens[perm][None]))[0, 0]
        )
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_padding_does_not_change_logits(self):
        rs = np.random.RandomState(2)
        _, seqs = _family(rs, 4, 9)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        tokens = mt.tokenize_msa(seqs)
        padded = np.full((4, 14), ALPHABET.padding_idx, dtype=np.int32)
        padded[:, :10] = tokens
        a = np.asarray(mt.apply(params, TINY, jnp.asarray(tokens[None]))[0, 0])
        b = np.asarray(mt.apply(params, TINY, jnp.asarray(padded[None]))[0, 0])
        np.testing.assert_allclose(a, b[:10], atol=2e-3)


class TestMaskedMarginals:
    def test_batched_equals_sequential(self):
        rs = np.random.RandomState(3)
        _, seqs = _family(rs, 5, 8)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        tokens = mt.tokenize_msa(seqs)

        def logits_fn(toks):
            return mt.apply(params, TINY, toks)

        table = np.asarray(
            mt.masked_marginal_table_msa(logits_fn, tokens, chunk=4)
        )
        # sequential loop (the reference's semantics, one mask per forward)
        for i in range(tokens.shape[1]):
            masked = tokens.copy()
            masked[0, i] = ALPHABET.mask_idx
            logps = jax.nn.log_softmax(
                logits_fn(jnp.asarray(masked[None])).astype(jnp.float32), -1
            )
            np.testing.assert_allclose(
                table[i], np.asarray(logps[0, 0, i]), atol=1e-4,
                err_msg=f"position {i}",
            )


    def test_params_mode_super_chunks_match_host_path(self):
        # the device fast path splits the work grid into (K, chunk)
        # dispatches with a power-of-two tail; results must not depend on
        # the split (super_chunks=2 forces multiple dispatches + tail)
        rs = np.random.RandomState(7)
        _, seqs = _family(rs, 5, 11)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        tokens = mt.tokenize_msa(seqs)

        def logits_fn(p, toks):
            return mt.apply(p, TINY, toks)

        host = np.asarray(
            mt.masked_marginal_table_msa(
                lambda t: logits_fn(params, t), tokens, chunk=3
            )
        )
        for sc in (2, 64):
            dev = np.asarray(
                mt.masked_marginal_table_msa(
                    logits_fn, tokens, chunk=3, params=params,
                    super_chunks=sc,
                )
            )
            np.testing.assert_allclose(dev, host, atol=1e-4)


class TestMultiColumnMasking:
    """VERDICT r4 item 4: k columns masked per forward, each masked
    column's own logits read (reference protocol is k=1,
    esm/compute_fitness.py:379-396)."""

    def _setup(self, L=14, n=5, seed=11):
        rs = np.random.RandomState(seed)
        focus, seqs = _family(rs, n, L)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        tokens = mt.tokenize_msa(seqs)

        def logits_fn(p, toks):
            return mt.apply(p, TINY, toks)

        return params, tokens, logits_fn, focus

    def test_k_equals_one_is_exact(self):
        params, tokens, logits_fn, _ = self._setup()
        base = np.asarray(mt.masked_marginal_table_msa(
            logits_fn, tokens, chunk=3, params=params))
        k1 = np.asarray(mt.masked_marginal_table_msa(
            logits_fn, tokens, chunk=3, params=params, cols_per_forward=1))
        np.testing.assert_allclose(k1, base, atol=0)

    def test_bookkeeping_exact_vs_manual_k_masked_forward(self):
        """Each returned row must equal a MANUAL forward where exactly
        that grid's k max-stride columns are masked and that column's
        row-0 logits are read — proving the scatter/gather and the
        stride assignment, independent of the k>1 approximation."""
        params, tokens, logits_fn, _ = self._setup()
        total = tokens.shape[1]
        k = 4
        table = np.asarray(mt.masked_marginal_table_msa(
            logits_fn, tokens, chunk=2, params=params, cols_per_forward=k))
        n_grids = (total + k - 1) // k
        offs_flat = np.concatenate(
            [np.arange(total), np.zeros(n_grids * k - total, int)])
        valid = np.arange(n_grids * k) < total
        offs_grids = offs_flat.reshape(k, n_grids).T
        valid_grids = valid.reshape(k, n_grids).T
        for g in range(n_grids):
            cols = offs_grids[g][valid_grids[g]]
            masked = tokens.copy()
            masked[0, cols] = ALPHABET.mask_idx
            logps = np.asarray(jax.nn.log_softmax(
                logits_fn(params, jnp.asarray(masked[None])).astype(
                    jnp.float32), -1))
            for c in cols:
                # atol 1e-3: the table path runs chunked batches, the
                # manual check batch-of-1 — XLA regroups the matmuls
                np.testing.assert_allclose(
                    table[c], logps[0, 0, c], atol=1e-3,
                    err_msg=f"grid {g} col {c}")
        # masked columns within one grid really are max-stride apart
        gaps = np.diff(np.sort(offs_grids[0][valid_grids[0]]))
        assert (gaps >= n_grids).all()

    def test_k_masked_scores_agree_with_reference_protocol(self):
        """Mutant scores from the k>1 table must track the k=1
        (reference-exact) table: deterministic tiny-model check that the
        approximation's ranking agreement is high and per-score deltas
        stay small relative to score spread."""
        from scipy.stats import spearmanr

        from proteingym_tpu.models.esm_scoring import (
            score_mutants_from_table,
        )

        params, tokens, logits_fn, seq = self._setup(L=18, n=6, seed=13)
        muts = [f"{seq[p]}{p + 1}{a}" for p in range(len(seq))
                for a in AA[:4] if a != seq[p]]
        t1 = mt.masked_marginal_table_msa(
            logits_fn, tokens, chunk=3, params=params, cols_per_forward=1)
        tk = mt.masked_marginal_table_msa(
            logits_fn, tokens, chunk=3, params=params, cols_per_forward=4)
        s1 = np.asarray(score_mutants_from_table(t1, muts, seq))
        sk = np.asarray(score_mutants_from_table(tk, muts, seq))
        rho = spearmanr(s1, sk).statistic
        assert rho > 0.99, rho
        assert np.max(np.abs(s1 - sk)) < 0.2 * (s1.max() - s1.min())


class TestSampling:
    def test_wt_kept_first_and_deterministic(self):
        rs = np.random.RandomState(4)
        focus, seqs = _family(rs, 30, 10)
        w = rs.rand(30)
        a = mt.sample_msa_weighted(seqs, w, nseq=8, seed=7)
        b = mt.sample_msa_weighted(seqs, w, nseq=8, seed=7)
        c = mt.sample_msa_weighted(seqs, w, nseq=8, seed=8)
        assert a[0] == focus.upper()
        assert len(a) == 8
        assert a == b
        assert a != c

    def test_weights_bias_sampling(self):
        seqs = ["AAAA", "CCCC", "DDDD"]
        w = np.array([1.0, 100.0, 1e-9])
        out = mt.sample_msa_weighted(seqs, w, nseq=50, seed=0)
        counts = {s: out.count(s) for s in set(out[1:])}
        assert counts.get("CCCC", 0) > counts.get("DDDD", 0)


class TestEndToEnd:
    def test_score_assay_ensemble(self):
        rs = np.random.RandomState(5)
        focus, seqs = _family(rs, 20, 10)
        params = mt.init_params(jax.random.PRNGKey(0), TINY)
        w = np.ones(20)
        muts = [f"{focus[2]}3A" if focus[2] != "A" else f"{focus[2]}3C",
                f"{focus[5]}6W" if focus[5] != "W" else f"{focus[5]}6Y"]
        scores = mt.score_assay_msa_transformer(
            params, TINY, focus, muts, seqs, w, nseq=6, seeds=(1, 2),
        )
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()


class TestConversion:
    def test_fake_state_dict_matches_init_shapes(self):
        import torch

        cfg = TINY
        init = mt.init_params(jax.random.PRNGKey(0), cfg)
        sd = {}
        sd["embed_tokens.weight"] = torch.randn(cfg.alphabet_size, cfg.embed_dim)
        sd["embed_positions.weight"] = torch.randn(
            cfg.max_positions + 2, cfg.embed_dim
        )
        sd["msa_position_embedding"] = torch.randn(1, cfg.max_rows, 1, cfg.embed_dim)
        for nm in ("emb_layer_norm_before", "emb_layer_norm_after"):
            sd[f"{nm}.weight"] = torch.randn(cfg.embed_dim)
            sd[f"{nm}.bias"] = torch.randn(cfg.embed_dim)
        sd["lm_head.dense.weight"] = torch.randn(cfg.embed_dim, cfg.embed_dim)
        sd["lm_head.dense.bias"] = torch.randn(cfg.embed_dim)
        sd["lm_head.layer_norm.weight"] = torch.randn(cfg.embed_dim)
        sd["lm_head.layer_norm.bias"] = torch.randn(cfg.embed_dim)
        sd["lm_head.bias"] = torch.randn(cfg.alphabet_size)
        for i in range(cfg.num_layers):
            for mod in ("row_self_attention", "column_self_attention"):
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    sd[f"layers.{i}.{mod}.layer.{proj}.weight"] = torch.randn(
                        cfg.embed_dim, cfg.embed_dim
                    )
                    sd[f"layers.{i}.{mod}.layer.{proj}.bias"] = torch.randn(
                        cfg.embed_dim
                    )
                sd[f"layers.{i}.{mod}.layer_norm.weight"] = torch.randn(cfg.embed_dim)
                sd[f"layers.{i}.{mod}.layer_norm.bias"] = torch.randn(cfg.embed_dim)
            sd[f"layers.{i}.feed_forward_layer.layer.fc1.weight"] = torch.randn(
                cfg.ffn_dim, cfg.embed_dim
            )
            sd[f"layers.{i}.feed_forward_layer.layer.fc1.bias"] = torch.randn(
                cfg.ffn_dim
            )
            sd[f"layers.{i}.feed_forward_layer.layer.fc2.weight"] = torch.randn(
                cfg.embed_dim, cfg.ffn_dim
            )
            sd[f"layers.{i}.feed_forward_layer.layer.fc2.bias"] = torch.randn(
                cfg.embed_dim
            )
            sd[f"layers.{i}.feed_forward_layer.layer_norm.weight"] = torch.randn(
                cfg.embed_dim
            )
            sd[f"layers.{i}.feed_forward_layer.layer_norm.bias"] = torch.randn(
                cfg.embed_dim
            )
        params = mt.convert_torch_state_dict(sd, cfg)

        def shapes(tree):
            return jax.tree.map(lambda x: tuple(x.shape), tree)

        assert shapes(params) == shapes(init)
        tokens = jnp.asarray(
            mt.tokenize_msa(["ACDE", "ACDF"])
        )[None]
        out = mt.apply(params, cfg, tokens)
        assert np.isfinite(np.asarray(out)).all()
