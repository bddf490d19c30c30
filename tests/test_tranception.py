import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proteingym_tpu.models.ar_scoring import (
    batched_ar_loglik,
    get_sequence_slices,
    score_mutants_ar,
)
from proteingym_tpu.models.tranception import (
    VOCAB,
    TranceptionConfig,
    alibi_bias,
    apply,
    get_slopes,
    init_params,
    sample_indeterminate,
)

TINY = TranceptionConfig(
    name="tiny", num_layers=2, embed_dim=64, num_heads=8, n_ctx=64,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_params(jax.random.PRNGKey(0), TINY)
    return params, lambda toks: apply(params, TINY, toks)


def test_vocab():
    assert len(VOCAB) == 25
    assert VOCAB.get_idx("A") == 5
    assert VOCAB.get_idx("Y") == 24
    toks = VOCAB.tokenize("AC")
    assert toks.tolist() == [1, 5, 6, 2]


def test_get_slopes_reference_formula():
    # reference: for grouped_alibi with 8 heads -> slopes for 2 heads tiled x4
    s = get_slopes(8, "grouped_alibi")
    assert len(s) == 8
    base = get_slopes(2, "standard_alibi")
    assert s == base * 4
    # standard slopes for power of 2: start = 2^(-2^-(log2(n)-3))
    n = 8
    start = 2 ** (-(2 ** -(math.log2(n) - 3)))
    expected = [start * start**i for i in range(n)]
    np.testing.assert_allclose(get_slopes(8, "standard_alibi"), expected)


def test_alibi_bias_shape():
    b = alibi_bias(8, 32)
    assert b.shape == (8, 1, 32)
    assert (np.diff(b[0, 0]) >= 0).all()  # monotone in key position


def test_forward_shapes(tiny_model):
    _, fn = tiny_model
    toks = jnp.asarray(VOCAB.tokenize("MKLVAGDE"))[None]
    logits = fn(toks)
    assert logits.shape == (1, 10, 25)
    assert np.isfinite(np.asarray(logits)).all()


def test_causality(tiny_model):
    """Changing a future token must not change past logits (incl. the
    depthwise convolutions, which must be causal)."""
    _, fn = tiny_model
    t1 = VOCAB.tokenize("MKLVAGDEFW")
    t2 = t1.copy()
    t2[8] = VOCAB.get_idx("C")  # change a late token
    l1 = np.asarray(fn(jnp.asarray(t1)[None]))
    l2 = np.asarray(fn(jnp.asarray(t2)[None]))
    np.testing.assert_allclose(l1[0, :8], l2[0, :8], atol=1e-4)
    assert not np.allclose(l1[0, 8:], l2[0, 8:])


def test_sample_indeterminate():
    rng = np.random.default_rng(0)
    out = sample_indeterminate("AXBJZC", rng)
    assert out[0] == "A" and out[5] == "C"
    assert out[2] in "DN" and out[3] in "IL" and out[4] in "EQ"
    assert out[1] in "ACDEFGHIKLMNPQRSTVWY"


def test_get_sequence_slices_optimal():
    target = "A" * 50
    muts = ["A10C", "A40W"]
    seqs = [target[:9] + "C" + target[10:], target[:39] + "W" + target[40:]]
    plans = get_sequence_slices(muts, seqs, target, model_context_len=20)
    # each mutant window + matching WT window, deduplicated
    mut_plans = [p for p in plans if p.mutated_sequence != target]
    wt_plans = [p for p in plans if p.mutated_sequence == target]
    assert len(mut_plans) == 2
    assert len(wt_plans) == 2
    for mp in mut_plans:
        assert len(mp.sliced_sequence) == 20
        ws = {p.window_start for p in wt_plans}
        assert mp.window_start in ws


def test_get_sequence_slices_sliding():
    target = "ACDEFGHIKL" * 5  # 50 aa
    seqs = [target.replace("A", "W", 1)]
    plans = get_sequence_slices(["A1W"], seqs, target, 20, scoring_window="sliding")
    starts = sorted({p.window_start for p in plans})
    assert starts == [0, 20, 40]


def test_batched_ar_loglik_matches_manual(tiny_model):
    _, fn = tiny_model
    rows = [VOCAB.tokenize(s) for s in ["MKLV", "ACDEFGHIKL", "WY"]]
    lls = batched_ar_loglik(fn, rows, VOCAB.PAD, batch_size=2)
    for row, ll in zip(rows, lls):
        logits = fn(jnp.asarray(row)[None])
        logps = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
        manual = sum(logps[t - 1, row[t]] for t in range(1, len(row)))
        assert ll == pytest.approx(manual, abs=1e-4)


def test_score_mutants_ar_end_to_end(tiny_model):
    _, fn = tiny_model
    target = "MKLVAGDEFW"
    muts = ["M1A", "K2C", "W10Y"]
    seqs = ["AKLVAGDEFW", "MCLVAGDEFW", "MKLVAGDEFY"]
    out = score_mutants_ar(
        fn,
        lambda s: VOCAB.tokenize(s),
        VOCAB.PAD,
        muts,
        seqs,
        target,
        model_context_len=62,
        scoring_mirror=True,
        batch_size=4,
    )
    assert len(out) == 3
    assert set(out.columns) >= {"mutated_sequence", "avg_score_L_to_R", "avg_score_R_to_L", "avg_score"}
    assert np.isfinite(out["avg_score"]).all()
    # mirroring averages the two directions
    np.testing.assert_allclose(
        out["avg_score"],
        (out["avg_score_L_to_R"] + out["avg_score_R_to_L"]) / 2,
        atol=1e-9,
    )


def test_score_mutants_ar_wt_scores_zero(tiny_model):
    _, fn = tiny_model
    target = "MKLVAGDEFW"
    out = score_mutants_ar(
        fn,
        lambda s: VOCAB.tokenize(s),
        VOCAB.PAD,
        ["M1A", "M1M"],  # M1M is silent: mutated seq == target
        ["AKLVAGDEFW", target],
        target,
        model_context_len=62,
        scoring_mirror=False,
    )
    wt_score = out[out.mutated_sequence == target]["avg_score"].iloc[0]
    assert wt_score == 0.0


def test_depthwise_conv_matches_torch():
    """Our causal depthwise conv vs the reference SpatialDepthWiseConvolution."""
    import torch
    import torch.nn as nn

    from proteingym_tpu.models.tranception import _causal_depthwise_conv

    rng = np.random.default_rng(0)
    b, h, t, hd, k = 2, 3, 10, 8, 5
    x = rng.normal(size=(b, h, t, hd)).astype(np.float32)
    conv = nn.Conv1d(hd, hd, kernel_size=k, padding=k - 1, groups=hd)
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 1, 3, 2).reshape(b * h, hd, t)
        yt = conv(xt)[:, :, : -(k - 1)]
        yt = yt.reshape(b, h, hd, t).permute(0, 1, 3, 2).numpy()
    params = {
        "kernel": jnp.asarray(conv.weight.detach().numpy()[:, 0, :].T),  # (K, hd)
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    got = np.asarray(_causal_depthwise_conv(jnp.asarray(x), params))
    np.testing.assert_allclose(got, yt, atol=1e-5)
