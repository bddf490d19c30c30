"""Weight-compatible ProtT5 (T5 encoder) trunk + converter.

The reference's VESPA baseline shells out to the ``vespa`` pip CLI
(ref: proteingym/baselines/vespa/compute_fitness.py:1-114, subprocess at
:4), whose trunk is Rostlab/prot_t5_xl_uniref50 — a HF T5 v1.0 encoder
(d_model 1024, 24 layers, 32 heads, d_kv 128, relu FFN). The pip package
and ProtT5 weights are offline-blocked here, but the architecture is
not: this module ports the T5 encoder stack exactly (HF
transformers/models/t5/modeling_t5.py semantics) so published ProtT5
checkpoints convert and load, and VESPA-class scoring can run on the
real embeddings.

Matched conventions (parity-tested against transformers' T5EncoderModel
at tiny config in tests/test_prot_t5.py):
  - RMS layer norm (T5LayerNorm: no mean subtraction, no bias), pre-norm
    blocks, final_layer_norm after the stack
  - NO attention softmax scaling (T5 folds 1/sqrt(d_kv) into init)
  - q/k/v/o and FFN projections without biases; d_kv independent of
    d_model/num_heads
  - relative position bias: bucketed (bidirectional, 32 buckets, max
    distance 128) embedding computed once from block 0 and ADDED to the
    attention scores of every layer
  - relu FFN (v1.0 / ProtT5) and gated-act FFN (v1.1 wi_0/wi_1) both
    supported; the converter detects the variant from the state dict

The attention uses the XLA path (a full (H, T, T) additive bias is
outside the grouped Pallas kernel's key-bias form); ProtT5 here feeds
per-residue embeddings to VESPA-class heads, where the one-off forward
is far from the hot loop.

Tokenizer note: ProtT5's sentencepiece ids (pad=0, </s>=1, unk=2, then
amino-acid tokens) ship inside the downloadable tokenizer, not in this
offline environment. ``AA_TOKEN_IDS`` carries the published frequency-
ordered layout [reconstruction — verify against the real tokenizer when
weights are present]; pass ``token_ids=`` to override.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Rostlab ProtT5 sentencepiece layout: specials then single-AA tokens in
# UniRef50 frequency order (README of Rostlab/prot_t5_xl_uniref50).
PAD_ID, EOS_ID, UNK_ID = 0, 1, 2
AA_TOKEN_IDS = {
    aa: 3 + i for i, aa in enumerate("ALGVSREDTIPKFQNYMHWCXBOUZ")
}


@dataclasses.dataclass(frozen=True)
class ProtT5Config:
    name: str = "prot_t5"
    vocab_size: int = 128
    d_model: int = 1024
    d_kv: int = 128
    num_heads: int = 32
    num_layers: int = 24
    d_ff: int = 16384
    num_buckets: int = 32
    max_distance: int = 128
    gated: bool = False  # v1.1 wi_0/wi_1 gated act; ProtT5 is v1.0 relu
    dtype: Any = jnp.float32


PRESETS = {
    # Rostlab/prot_t5_xl_uniref50 (the VESPA trunk)
    "prot_t5_xl": ProtT5Config(name="prot_t5_xl"),
    "prot_t5_tiny": ProtT5Config(
        name="prot_t5_tiny", vocab_size=48, d_model=64, d_kv=16,
        num_heads=4, num_layers=2, d_ff=128,
    ),
}


def tokenize(seq: str, pad_to: Optional[int] = None,
             token_ids: Optional[Dict[str, int]] = None) -> np.ndarray:
    """ProtT5 input row: per-residue AA tokens + </s> (the tokenizer's
    space-separated-residue convention yields exactly one token per AA)."""
    ids = token_ids or AA_TOKEN_IDS
    row = [ids.get(a, UNK_ID) for a in seq.upper()] + [EOS_ID]
    if pad_to is not None:
        if pad_to < len(row):
            raise ValueError(
                f"pad_to={pad_to} < sequence length + EOS = {len(row)}"
            )
        row = row + [PAD_ID] * (pad_to - len(row))
    return np.asarray(row, np.int32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rms_norm(x, scale, eps=1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def _relative_position_bucket(relative_position: np.ndarray,
                              num_buckets: int = 32,
                              max_distance: int = 128) -> np.ndarray:
    """Bidirectional bucket map, transcribed from HF
    T5Attention._relative_position_bucket (static; computed in numpy at
    trace time — positions are static shapes)."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(np.int64) * num_buckets
    rel = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    rel_large = np.minimum(rel_large, num_buckets - 1)
    return buckets + np.where(is_small, rel, rel_large)


def position_bias_buckets(t: int, c: ProtT5Config) -> np.ndarray:
    """(T, T) bucket indices: relative_position = key_pos - query_pos."""
    ctx = np.arange(t)[:, None]
    mem = np.arange(t)[None, :]
    return _relative_position_bucket(
        mem - ctx, num_buckets=c.num_buckets, max_distance=c.max_distance
    )


def init_params(rng: jax.Array, c: ProtT5Config) -> Dict[str, Any]:
    keys = jax.random.split(rng, 2 + c.num_layers)
    init = jax.nn.initializers.normal(1.0)

    def dense(key, din, dout):
        return init(key, (din, dout), jnp.float32) / math.sqrt(din)

    inner = c.num_heads * c.d_kv
    layers = []
    for i in range(c.num_layers):
        ks = jax.random.split(keys[2 + i], 8)
        layer = {
            "ln_attn": jnp.ones(c.d_model),
            "q": dense(ks[0], c.d_model, inner),
            "k": dense(ks[1], c.d_model, inner),
            "v": dense(ks[2], c.d_model, inner),
            "o": dense(ks[3], inner, c.d_model),
            "ln_ff": jnp.ones(c.d_model),
            "wo": dense(ks[5], c.d_ff, c.d_model),
        }
        if c.gated:
            layer["wi_0"] = dense(ks[4], c.d_model, c.d_ff)
            layer["wi_1"] = dense(ks[6], c.d_model, c.d_ff)
        else:
            layer["wi"] = dense(ks[4], c.d_model, c.d_ff)
        layers.append(layer)
    return {
        "embed": init(keys[0], (c.vocab_size, c.d_model), jnp.float32),
        "rel_bias": init(keys[1], (c.num_buckets, c.num_heads),
                         jnp.float32) * 0.1,
        "layers": layers,
        "final_ln": jnp.ones(c.d_model),
    }


def apply(params: Dict[str, Any], c: ProtT5Config, tokens: jnp.ndarray
          ) -> jnp.ndarray:
    """(B, T) int tokens -> (B, T, d_model) final hidden states
    (T5EncoderModel.last_hidden_state). PAD tokens are masked out of
    attention exactly as HF's extended attention mask does."""
    b, t = tokens.shape
    h, dk = c.num_heads, c.d_kv
    x = params["embed"].astype(c.dtype)[tokens]

    buckets = jnp.asarray(position_bias_buckets(t, c))
    pos_bias = params["rel_bias"].astype(jnp.float32)[buckets]  # (T, T, H)
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # (1, H, T, T)
    pad = (tokens == PAD_ID)
    mask_bias = jnp.where(pad, -1e9, 0.0)[:, None, None, :]  # (B,1,1,T)
    bias = pos_bias + mask_bias  # (B, H, T, T)

    for layer in params["layers"]:
        y = _rms_norm(x, layer["ln_attn"])
        q = (y @ layer["q"].astype(y.dtype)).reshape(b, t, h, dk)
        k = (y @ layer["k"].astype(y.dtype)).reshape(b, t, h, dk)
        v = (y @ layer["v"].astype(y.dtype)).reshape(b, t, h, dk)
        # T5: NO softmax scale; full (B, H, T, T) additive bias
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(y.dtype).reshape(b, t, h * dk)
        x = x + ctx @ layer["o"].astype(y.dtype)

        y = _rms_norm(x, layer["ln_ff"])
        if c.gated:
            ff = jax.nn.gelu(
                (y @ layer["wi_0"].astype(y.dtype)).astype(jnp.float32),
                approximate=True,
            ) * (y @ layer["wi_1"].astype(y.dtype)).astype(jnp.float32)
        else:
            ff = jax.nn.relu(
                (y @ layer["wi"].astype(y.dtype)).astype(jnp.float32)
            )
        x = x + (ff.astype(y.dtype) @ layer["wo"].astype(y.dtype))

    return _rms_norm(x, params["final_ln"]).astype(jnp.float32)


def embeddings(params: Dict[str, Any], c: ProtT5Config, seq: str,
               token_ids: Optional[Dict[str, int]] = None) -> jnp.ndarray:
    """(L, d_model) per-residue embeddings (</s> stripped) — the
    representation the vespa CLI extracts for its conservation head."""
    tokens = tokenize(seq, token_ids=token_ids)[None]
    hidden = apply(params, c, jnp.asarray(tokens))
    return hidden[0, : len(seq)]


# ---------------------------------------------------------------------------
# decoder + masked log-odds (the VESPA signal)
# ---------------------------------------------------------------------------

DECODER_START_ID = PAD_ID  # T5 decoder_start_token_id == pad


def sentinel_id(c: ProtT5Config, k: int = 0) -> int:
    """<extra_id_k>: T5 sentinels occupy the top of the vocab in reverse
    order (HF convention: extra_id_0 = vocab_size - 1)."""
    return c.vocab_size - 1 - k


def decoder_apply(params: Dict[str, Any], c: ProtT5Config,
                  dec_tokens: jnp.ndarray, enc_hidden: jnp.ndarray,
                  enc_pad: jnp.ndarray) -> jnp.ndarray:
    """T5 decoder stack -> (B, Td, V) lm logits.

    dec_tokens: (B, Td) decoder input ids (start token first);
    enc_hidden: (B, Te, d_model) encoder output; enc_pad: (B, Te) bool.
    Matches T5ForConditionalGeneration: unidirectional relative bias
    shared from decoder block 0, causal self-attention, biasless
    cross-attention, and (when the embedding is tied) the d_model**-0.5
    output scale before the lm head."""
    dec = params["decoder"]
    b, t = dec_tokens.shape
    h, dk = c.num_heads, c.d_kv
    x = params["embed"].astype(c.dtype)[dec_tokens]

    ctx_pos = np.arange(t)[:, None]
    mem_pos = np.arange(t)[None, :]
    rel = mem_pos - ctx_pos
    # unidirectional buckets (bidirectional=False in HF): only past keys
    neg = -np.minimum(rel, 0)
    max_exact = c.num_buckets // 2
    is_small = neg < max_exact
    large = max_exact + (
        np.log(np.maximum(neg, 1) / max_exact)
        / math.log(c.max_distance / max_exact)
        * (c.num_buckets - max_exact)
    ).astype(np.int64)
    buckets = np.where(is_small, neg, np.minimum(large, c.num_buckets - 1))
    pos_bias = dec["rel_bias"].astype(jnp.float32)[jnp.asarray(buckets)]
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # (1, H, Td, Td)
    causal = np.triu(np.ones((t, t), bool), 1)
    self_bias = pos_bias + jnp.where(jnp.asarray(causal), -1e9, 0.0)
    cross_bias = jnp.where(enc_pad, -1e9, 0.0)[:, None, None, :]

    def attn(y, kv, proj, bias):
        bq, tq = y.shape[:2]
        tk = kv.shape[1]
        q = (y @ proj["q"].astype(y.dtype)).reshape(bq, tq, h, dk)
        k = (kv @ proj["k"].astype(y.dtype)).reshape(bq, tk, h, dk)
        v = (kv @ proj["v"].astype(y.dtype)).reshape(bq, tk, h, dk)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(y.dtype).reshape(bq, tq, h * dk)
        return ctx @ proj["o"].astype(y.dtype)

    enc_kv = enc_hidden.astype(c.dtype)
    for layer in dec["layers"]:
        y = _rms_norm(x, layer["ln_self"])
        x = x + attn(y, y, layer["self"], self_bias)
        y = _rms_norm(x, layer["ln_cross"])
        x = x + attn(y, enc_kv, layer["cross"], cross_bias)
        y = _rms_norm(x, layer["ln_ff"])
        if c.gated:
            ff = jax.nn.gelu(
                (y @ layer["wi_0"].astype(y.dtype)).astype(jnp.float32),
                approximate=True,
            ) * (y @ layer["wi_1"].astype(y.dtype)).astype(jnp.float32)
        else:
            ff = jax.nn.relu(
                (y @ layer["wi"].astype(y.dtype)).astype(jnp.float32)
            )
        x = x + (ff.astype(y.dtype) @ layer["wo"].astype(y.dtype))
    x = _rms_norm(x, dec["final_ln"]).astype(jnp.float32)
    if dec.get("lm_head") is not None:
        return x @ dec["lm_head"]
    # tied embedding: HF scales by d_model**-0.5 before the shared head
    return (x * (c.d_model ** -0.5)) @ params["embed"].astype(
        jnp.float32).T


def masked_logodds(params: Dict[str, Any], c: ProtT5Config, seq: str,
                   token_ids: Optional[Dict[str, int]] = None,
                   chunk: int = 32) -> np.ndarray:
    """(L, V) log-probabilities of the reconstruction for each masked
    position — the VESPA log-odds signal (Marquet et al. 2022): replace
    residue i with <extra_id_0>, decode [start, <extra_id_0>] and read
    the distribution at the slot after the sentinel. Requires a decoder
    (converted from T5ForConditionalGeneration).

    VESPA's per-mutation log-odds ratio is then
    ``table[i, tok(mt)] - table[i, tok(wt)]``."""
    if "decoder" not in params:
        raise ValueError("masked_logodds needs a decoder-bearing "
                         "checkpoint (convert --family prot_t5 on a "
                         "T5ForConditionalGeneration state dict)")
    L = len(seq)
    base = tokenize(seq, token_ids=token_ids)
    sid = sentinel_id(c)
    rows = np.tile(base[None], (L, 1))
    rows[np.arange(L), np.arange(L)] = sid
    dec_in = np.asarray([[DECODER_START_ID, sid]], np.int32)
    out = np.zeros((L, c.vocab_size), np.float32)
    for s0 in range(0, L, chunk):
        blk = rows[s0 : s0 + chunk]
        enc = apply(params, c, jnp.asarray(blk))
        pad = jnp.asarray(blk == PAD_ID)
        dec = jnp.broadcast_to(jnp.asarray(dec_in), (len(blk), 2))
        logits = decoder_apply(params, c, dec, enc, pad)
        # slot 1 (after the sentinel) predicts the masked residue
        out[s0 : s0 + len(blk)] = np.asarray(
            jax.nn.log_softmax(logits[:, 1], axis=-1)
        )
    return out


# ---------------------------------------------------------------------------
# converter (HF T5EncoderModel state dict)
# ---------------------------------------------------------------------------


def config_from_state_dict(sd: Dict[str, Any],
                           name: str = "prot_t5") -> ProtT5Config:
    def a(key):
        return np.asarray(sd[key])

    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.block.")
    )
    vocab, d_model = a("shared.weight").shape
    nb, h = a(
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ).shape
    inner = a("encoder.block.0.layer.0.SelfAttention.q.weight").shape[0]
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in sd
    wi_key = "wi_0" if gated else "wi"
    d_ff = a(f"encoder.block.0.layer.1.DenseReluDense.{wi_key}.weight"
             ).shape[0]
    return ProtT5Config(
        name=name, vocab_size=vocab, d_model=d_model, d_kv=inner // h,
        num_heads=h, num_layers=n_layers, d_ff=d_ff, num_buckets=nb,
        gated=gated,
    )


def convert_torch_state_dict(sd: Dict[str, Any],
                             c: Optional[ProtT5Config] = None
                             ) -> Dict[str, Any]:
    if c is None:
        c = config_from_state_dict(sd)

    def t(key):  # torch Linear stores (out, in); we use (in, out)
        return jnp.asarray(np.asarray(sd[key], np.float32).T)

    def a(key):
        return jnp.asarray(np.asarray(sd[key], np.float32))

    def ffn(layer, prefix):
        layer["wo"] = t(f"{prefix}.wo.weight")
        if c.gated:
            layer["wi_0"] = t(f"{prefix}.wi_0.weight")
            layer["wi_1"] = t(f"{prefix}.wi_1.weight")
        else:
            layer["wi"] = t(f"{prefix}.wi.weight")
        return layer

    def attn_proj(prefix):
        return {
            "q": t(f"{prefix}.q.weight"), "k": t(f"{prefix}.k.weight"),
            "v": t(f"{prefix}.v.weight"), "o": t(f"{prefix}.o.weight"),
        }

    layers = []
    for i in range(c.num_layers):
        p = f"encoder.block.{i}.layer"
        layer = {
            "ln_attn": a(f"{p}.0.layer_norm.weight"),
            "ln_ff": a(f"{p}.1.layer_norm.weight"),
            **attn_proj(f"{p}.0.SelfAttention"),
        }
        layers.append(ffn(layer, f"{p}.1.DenseReluDense"))
    out = {
        "embed": a("shared.weight"),
        "rel_bias": a(
            "encoder.block.0.layer.0.SelfAttention."
            "relative_attention_bias.weight"
        ),
        "layers": layers,
        "final_ln": a("encoder.final_layer_norm.weight"),
    }

    # decoder (T5ForConditionalGeneration state dicts) — enables the
    # VESPA masked-reconstruction log-odds
    if "decoder.final_layer_norm.weight" in sd:
        n_dec = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("decoder.block.")
        )
        dec_layers = []
        for i in range(n_dec):
            p = f"decoder.block.{i}.layer"
            layer = {
                "ln_self": a(f"{p}.0.layer_norm.weight"),
                "self": attn_proj(f"{p}.0.SelfAttention"),
                "ln_cross": a(f"{p}.1.layer_norm.weight"),
                "cross": attn_proj(f"{p}.1.EncDecAttention"),
                "ln_ff": a(f"{p}.2.layer_norm.weight"),
            }
            dec_layers.append(ffn(layer, f"{p}.2.DenseReluDense"))
        out["decoder"] = {
            "rel_bias": a(
                "decoder.block.0.layer.0.SelfAttention."
                "relative_attention_bias.weight"
            ),
            "layers": dec_layers,
            "final_ln": a("decoder.final_layer_norm.weight"),
        }
        # v1.1 has an untied lm_head; v1.0/ProtT5 ties it to the shared
        # embedding, in which case HF ALSO scales the decoder output by
        # d_model**-0.5 (decoder_apply's tied path). A tied state dict
        # still contains lm_head.weight (same tensor as shared.weight),
        # so tying is detected by value equality.
        if "lm_head.weight" in sd and not np.array_equal(
            np.asarray(sd["lm_head.weight"]), np.asarray(sd["shared.weight"])
        ):
            out["decoder"]["lm_head"] = t("lm_head.weight")
    return out
