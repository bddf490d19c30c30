import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proteingym_tpu.models import esm2
from proteingym_tpu.models.esm2 import ALPHABET, EsmConfig, apply, init_params
from proteingym_tpu.models.esm_scoring import (
    esm_overlap_weights,
    masked_marginal_table,
    overlapping_window_plan,
    pseudo_ppl,
    score_assay,
    score_mutants_from_table,
    wt_marginal_table,
    wt_marginal_table_overlapping,
)

TINY = EsmConfig(
    name="tiny", num_layers=2, embed_dim=64, num_heads=4, dtype=jnp.float32
)
TINY_1B = EsmConfig(
    name="tiny1b", num_layers=2, embed_dim=64, num_heads=4, dtype=jnp.float32,
    use_rotary=False, emb_layer_norm_before=True, max_positions=128,
)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_params(jax.random.PRNGKey(0), TINY)
    return params, lambda toks: apply(params, TINY, toks)


def test_alphabet_layout():
    # exact fair-esm ESM-1b/ESM2 ordering (ref esm/data.py:91-143)
    assert len(ALPHABET) == 33
    assert ALPHABET.cls_idx == 0
    assert ALPHABET.padding_idx == 1
    assert ALPHABET.eos_idx == 2
    assert ALPHABET.unk_idx == 3
    assert ALPHABET.get_idx("L") == 4
    assert ALPHABET.get_idx("A") == 5
    assert ALPHABET.get_idx("C") == 23
    assert ALPHABET.get_idx("-") == 30
    assert ALPHABET.mask_idx == 32
    toks = ALPHABET.tokenize("LAG")
    assert toks.tolist() == [0, 4, 5, 6, 2]


def test_forward_shapes(tiny_model):
    _, logits_fn = tiny_model
    toks = jnp.asarray(ALPHABET.tokenize("MKLVAGDE"))[None]
    logits = logits_fn(toks)
    assert logits.shape == (1, 10, 33)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_padding_invariance(tiny_model):
    """Padded forward must give identical logits at real positions."""
    _, logits_fn = tiny_model
    seq = "MKLVAGDE"
    t1 = jnp.asarray(ALPHABET.tokenize(seq))[None]
    t2 = jnp.asarray(ALPHABET.tokenize(seq, pad_to=16))[None]
    l1 = logits_fn(t1)
    l2 = logits_fn(t2)
    np.testing.assert_allclose(
        np.asarray(l1[0]), np.asarray(l2[0, : t1.shape[1]]), atol=1e-4
    )


def test_token_dropout_rescale():
    """With a masked token present, unmasked embeddings are rescaled
    (ref esm2.py:85-91): scaling changes logits vs token_dropout=False."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    cfg_off = EsmConfig(
        name="tiny", num_layers=2, embed_dim=64, num_heads=4,
        dtype=jnp.float32, token_dropout=False,
    )
    toks = np.asarray(ALPHABET.tokenize("MKLVAGDE"))
    toks[3] = ALPHABET.mask_idx
    toks = jnp.asarray(toks)[None]
    l_on = apply(params, TINY, toks)
    l_off = apply(params, cfg_off, toks)
    assert not np.allclose(np.asarray(l_on), np.asarray(l_off))


def test_esm1b_variant_runs():
    params = init_params(jax.random.PRNGKey(1), TINY_1B)
    toks = jnp.asarray(ALPHABET.tokenize("MKLVAGDE"))[None]
    logits = apply(params, TINY_1B, toks)
    assert logits.shape == (1, 10, 33)
    assert "embed_positions" in params and "emb_ln_before" in params


def test_masked_marginal_batched_equals_loop(tiny_model):
    """The chunked/batched masked-marginal table must equal the reference's
    one-forward-per-position loop (ref :489-504)."""
    _, logits_fn = tiny_model
    seq = "MKLVAGDEFWHC"
    tokens = ALPHABET.tokenize(seq)
    table = masked_marginal_table(logits_fn, tokens, chunk=5)
    assert table.shape == (len(seq) + 2, 33)
    for i in [0, 1, 5, len(seq) + 1]:
        masked = tokens.copy()
        masked[i] = ALPHABET.mask_idx
        logps = jax.nn.log_softmax(
            logits_fn(jnp.asarray(masked)[None])[0].astype(jnp.float32), axis=-1
        )
        np.testing.assert_allclose(
            np.asarray(table[i]), np.asarray(logps[i]), atol=2e-4
        )


def test_score_mutants_from_table(tiny_model):
    _, logits_fn = tiny_model
    seq = "MKLVAGDEFW"
    tokens = ALPHABET.tokenize(seq)
    table = wt_marginal_table(logits_fn, tokens)
    scores = score_mutants_from_table(table, ["M1A", "K2C:L3P"], seq)
    t = np.asarray(table)
    exp0 = t[1, ALPHABET.get_idx("A")] - t[1, ALPHABET.get_idx("M")]
    exp1 = (
        t[2, ALPHABET.get_idx("C")]
        - t[2, ALPHABET.get_idx("K")]
        + t[3, ALPHABET.get_idx("P")]
        - t[3, ALPHABET.get_idx("L")]
    )
    np.testing.assert_allclose(scores, [exp0, exp1], atol=1e-5)


def test_score_mutants_wt_mismatch_raises(tiny_model):
    _, logits_fn = tiny_model
    seq = "MKLV"
    table = wt_marginal_table(logits_fn, ALPHABET.tokenize(seq))
    with pytest.raises(ValueError):
        score_mutants_from_table(table, ["C1A"], seq)


def test_esm_overlap_weights_exact():
    """Weights must match the reference loop exactly (ref :439-443)."""
    import math

    w = esm_overlap_weights(1024)
    expected = np.ones(1024)
    for i in range(1, 257):
        expected[i] = 1 / (1 + math.exp(-(i - 128) / 16))
    for i in range(1022 - 256, 1023):
        expected[i] = 1 / (1 + math.exp((i - 1022 + 128) / 16))
    np.testing.assert_allclose(w, expected, atol=0)


def test_overlapping_window_plan_covers():
    starts = overlapping_window_plan(3000, window=1024, step=511)
    covered = np.zeros(3000, dtype=bool)
    for s in starts:
        assert 0 <= s and s + 1024 <= 3000
        covered[s : s + 1024] = True
    assert covered.all()


def test_wt_marginal_overlapping_short_seq_passthrough(tiny_model):
    _, logits_fn = tiny_model
    tokens = ALPHABET.tokenize("MKLVAGDE")
    t1 = wt_marginal_table(logits_fn, tokens)
    t2 = wt_marginal_table_overlapping(logits_fn, tokens, window=1024)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=0)


def test_masked_marginal_optimal_window_long_seq(tiny_model):
    """Long sequences: each row comes from its optimal window slice."""
    _, logits_fn = tiny_model
    seq = "MKLVAGDEFWHC" * 4  # 48 aa -> 50 tokens, use window=16
    tokens = ALPHABET.tokenize(seq)
    table = masked_marginal_table(logits_fn, tokens, chunk=10, window=16)
    assert table.shape == (50, 33)
    # check one interior position against a manual windowed forward
    from proteingym_tpu.data.windows import get_optimal_window

    i = 25
    start, end = get_optimal_window(i, 50, 16)
    masked = tokens[start:end].copy()
    masked[i - start] = ALPHABET.mask_idx
    logps = jax.nn.log_softmax(
        logits_fn(jnp.asarray(masked)[None])[0].astype(jnp.float32), axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(table[i]), np.asarray(logps[i - start]), atol=2e-4
    )


def test_score_assay_strategies_agree_on_sign_conventions(tiny_model):
    _, logits_fn = tiny_model
    seq = "MKLVAGDEFW"
    muts = ["M1A", "V4C", "W10Y"]
    wt = score_assay(logits_fn, seq, muts, strategy="wt-marginals")
    mm = score_assay(logits_fn, seq, muts, strategy="masked-marginals", chunk=4)
    assert wt.shape == mm.shape == (3,)
    assert np.isfinite(wt).all() and np.isfinite(mm).all()


def test_pseudo_ppl(tiny_model):
    _, logits_fn = tiny_model
    v = pseudo_ppl(logits_fn, "MKLVAGDE", chunk=4)
    assert np.isfinite(v) and v < 0  # sum of log-probs


def test_convert_torch_state_dict_roundtrip():
    """Build a fake torch-style state dict from our params and convert."""
    import torch

    params = init_params(jax.random.PRNGKey(2), TINY)
    sd = {}
    sd["embed_tokens.weight"] = torch.tensor(np.asarray(params["embed_tokens"]))
    for i, layer in enumerate(params["layers"]):
        p = f"layers.{i}"
        for ours, theirs in [
            ("q", "self_attn.q_proj"),
            ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"),
            ("out", "self_attn.out_proj"),
            ("fc1", "fc1"),
            ("fc2", "fc2"),
        ]:
            sd[f"{p}.{theirs}.weight"] = torch.tensor(
                np.asarray(layer[ours]["kernel"]).T
            )
            sd[f"{p}.{theirs}.bias"] = torch.tensor(np.asarray(layer[ours]["bias"]))
        for ours, theirs in [
            ("attn_ln", "self_attn_layer_norm"),
            ("ffn_ln", "final_layer_norm"),
        ]:
            sd[f"{p}.{theirs}.weight"] = torch.tensor(np.asarray(layer[ours]["scale"]))
            sd[f"{p}.{theirs}.bias"] = torch.tensor(np.asarray(layer[ours]["bias"]))
    sd["emb_layer_norm_after.weight"] = torch.tensor(
        np.asarray(params["final_ln"]["scale"])
    )
    sd["emb_layer_norm_after.bias"] = torch.tensor(np.asarray(params["final_ln"]["bias"]))
    sd["lm_head.dense.weight"] = torch.tensor(
        np.asarray(params["lm_head"]["dense"]["kernel"]).T
    )
    sd["lm_head.dense.bias"] = torch.tensor(np.asarray(params["lm_head"]["dense"]["bias"]))
    sd["lm_head.layer_norm.weight"] = torch.tensor(np.asarray(params["lm_head"]["ln"]["scale"]))
    sd["lm_head.layer_norm.bias"] = torch.tensor(np.asarray(params["lm_head"]["ln"]["bias"]))
    sd["lm_head.bias"] = torch.tensor(np.asarray(params["lm_head"]["bias"]))

    converted = esm2.convert_torch_state_dict(sd, TINY)
    toks = jnp.asarray(ALPHABET.tokenize("MKLVAGDE"))[None]
    l1 = apply(params, TINY, toks)
    l2 = apply(converted, TINY, toks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_params_table_paths_match_host_path(tiny_model):
    """The single-dispatch params-mode tables (device-built rows, lax.map
    over the chunk grid, length bucketing) must match the host-built
    reference path exactly — short fast path AND long-sequence window
    path."""
    from proteingym_tpu.models.esm2 import make_apply_fn

    params, logits_fn = tiny_model
    apply_fn = make_apply_fn(TINY)

    # short path, with bucketing (pad rows discarded)
    seq = "MKLVAGDEFWHCRNQY"  # 18 tokens -> bucket 32
    tokens = ALPHABET.tokenize(seq)
    host = masked_marginal_table(logits_fn, tokens, chunk=5)
    dev = masked_marginal_table(
        apply_fn, tokens, chunk=5, params=params,
        pad_to_multiple=32, pad_idx=ALPHABET.padding_idx,
    )
    assert dev.shape == host.shape
    np.testing.assert_allclose(
        np.asarray(dev), np.asarray(host), atol=2e-4
    )

    # long-sequence optimal-window path, with bucketing
    seq_long = "MKLVAGDEFWHC" * 4  # 50 tokens, window 16
    tokens_long = ALPHABET.tokenize(seq_long)
    host_w = masked_marginal_table(
        logits_fn, tokens_long, chunk=10, window=16
    )
    dev_w = masked_marginal_table(
        apply_fn, tokens_long, chunk=10, window=16, params=params,
        pad_to_multiple=32, pad_idx=ALPHABET.padding_idx,
    )
    assert dev_w.shape == host_w.shape
    np.testing.assert_allclose(
        np.asarray(dev_w), np.asarray(host_w), atol=2e-4
    )
