"""Tranception: GPT-2-style AR protein LM with grouped ALiBi + depthwise convs.

Architecture semantics match the reference
(ref: proteingym/baselines/tranception/tranception/model_pytorch.py):

  - vocab 25: [UNK][CLS][SEP][PAD][MASK] + 20 AAs in ACDEFGHIKLMNPQRSTVWY
    order (ref utils/tokenizers/Basic_tokenizer); scoring rows are
    [CLS] seq [SEP]
  - grouped ALiBi position bias: slopes computed for n_heads//4 then tiled
    x4; bias[h, k] = slope[h] * k added to attention scores (:50-71, :373-377)
  - "tranception" attention: heads split into 4 groups with causal
    depthwise convolutions of kernel {1(identity), 3, 5, 7} applied to
    Q, K, V per group (:73-88, :240-251)
  - squared-ReLU MLP activation (activations.py:79-86)
  - pre-LN blocks, final LN, LM head tied to the token embedding
  - optional retrieval: fused log-probs (1-alpha) AR + alpha MSA prior on
    the AA vocabulary slice (:792-846) — see models/retrieval.py

TPU design: pure functional apply; the depthwise convs lower to
lax.conv_general_dilated with feature_group_count = head_dim (VPU-friendly);
ALiBi bias is a compile-time constant per length bucket.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------

AA_VOCAB = "ACDEFGHIKLMNPQRSTVWY"


class TranceptionVocab:
    UNK, CLS, SEP, PAD, MASK = 0, 1, 2, 3, 4

    def __init__(self):
        self.tok_to_idx = {"[UNK]": 0, "[CLS]": 1, "[SEP]": 2, "[PAD]": 3, "[MASK]": 4}
        for i, aa in enumerate(AA_VOCAB):
            self.tok_to_idx[aa] = 5 + i

    def __len__(self):
        return 25

    def get_idx(self, c: str) -> int:
        return self.tok_to_idx.get(c, self.UNK)

    def tokenize(self, seq: str, pad_to: Optional[int] = None) -> np.ndarray:
        ids = [self.CLS] + [self.get_idx(c) for c in seq] + [self.SEP]
        if pad_to is not None:
            ids += [self.PAD] * (pad_to - len(ids))
        return np.asarray(ids, dtype=np.int32)


VOCAB = TranceptionVocab()


def sample_indeterminate(seq: str, rng: np.random.Generator) -> str:
    """Resample ambiguity codes (ref model_pytorch.py:930-938 encode_batch):
    X -> any AA, B -> D/N, J -> I/L, Z -> E/Q."""
    table = {"X": AA_VOCAB, "B": "DN", "J": "IL", "Z": "EQ"}
    out = list(seq)
    for i, c in enumerate(out):
        if c in table:
            out[i] = table[c][rng.integers(0, len(table[c]))]
    return "".join(out)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TranceptionConfig:
    name: str = "tranception_large"
    num_layers: int = 36
    embed_dim: int = 1280
    num_heads: int = 20
    n_ctx: int = 1024
    vocab_size: int = 25
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    @property
    def ffn_dim(self):
        return 4 * self.embed_dim


PRESETS = {
    "tranception_small": TranceptionConfig("tranception_small", 12, 768, 12),
    "tranception_medium": TranceptionConfig("tranception_medium", 24, 1024, 16),
    "tranception_large": TranceptionConfig("tranception_large", 36, 1280, 20),
}


# ---------------------------------------------------------------------------
# ALiBi
# ---------------------------------------------------------------------------

def get_slopes(n: int, mode: str = "grouped_alibi"):
    """Exact reference slope schedule (ref :50-71)."""

    def power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    def standard(n):
        if math.log2(n).is_integer():
            return power_of_2(n)
        closest = 2 ** math.floor(math.log2(n))
        return power_of_2(closest) + standard(2 * closest)[0::2][: n - closest]

    if mode == "grouped_alibi":
        result = standard(n // 4) * 4
    else:
        result = standard(n)
    return result


def alibi_bias(num_heads: int, seq_len: int) -> np.ndarray:
    """(H, 1, T) bias: slope_h * k (key-position form, ref :374-377).
    Per-query-row constant offsets cancel in softmax, making this
    equivalent to the distance form for causal attention."""
    slopes = np.asarray(get_slopes(num_heads, "grouped_alibi"), dtype=np.float32)
    return slopes[:, None, None] * np.arange(seq_len, dtype=np.float32)[None, None, :]


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, config: TranceptionConfig) -> Dict[str, Any]:
    c = config
    keys = iter(jax.random.split(rng, 8 + 8 * c.num_layers))
    d, f, v, hd = c.embed_dim, c.ffn_dim, c.vocab_size, c.head_dim

    def dense(key, n_in, n_out, std=0.02):
        return {
            "kernel": jax.random.normal(key, (n_in, n_out), jnp.float32) * std,
            "bias": jnp.zeros((n_out,), jnp.float32),
        }

    def ln():
        return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}

    def dconv(key, kernel):
        # depthwise causal conv over head_dim channels (ref :73-88)
        return {
            "kernel": jax.random.normal(key, (kernel, hd), jnp.float32) * 0.02,
            "bias": jnp.zeros((hd,), jnp.float32),
        }

    layers = []
    for _ in range(c.num_layers):
        k_attn, k_proj, k_fc1, k_fc2, k_dw = (next(keys) for _ in range(5))
        dw_keys = jax.random.split(k_dw, 9)
        layers.append(
            {
                "ln_1": ln(),
                "c_attn": dense(k_attn, d, 3 * d),
                "c_proj": dense(k_proj, d, d),
                "ln_2": ln(),
                "c_fc": dense(k_fc1, d, f),
                "c_proj_mlp": dense(k_fc2, f, d),
                "dwconv": {
                    # groups 1..3 use kernels 3, 5, 7 on q, k, v
                    f"{name}{gi}": dconv(dw_keys[3 * gi + ni], kernel)
                    for gi, kernel in enumerate([3, 5, 7])
                    for ni, name in enumerate(["q", "k", "v"])
                },
            }
        )
    return {
        "wte": jax.random.normal(next(keys), (v, d), jnp.float32) * 0.02,
        "layers": layers,
        "ln_f": ln(),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _dense(x, p):
    return (
        jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
        .astype(x.dtype)
        + p["bias"].astype(x.dtype)
    )


def _causal_depthwise_conv(x, p):
    """x: (B, H_grp, T, hd); causal depthwise conv along T per channel.

    Equivalent to the reference's Conv1d(groups=head_dim, padding=k-1) with
    the right-overhang trimmed (ref :79-88).
    """
    b, h, t, hd = x.shape
    k = p["kernel"].shape[0]
    xx = x.reshape(b * h, t, hd)
    out = jax.lax.conv_general_dilated(
        xx.astype(jnp.float32),
        p["kernel"][:, None, :].astype(jnp.float32),  # (K, 1, hd) = (spatial, in/g, out)
        window_strides=(1,),
        padding=[(k - 1, 0)],  # left (causal) padding only
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=hd,
    )
    out = out + p["bias"]
    return out.reshape(b, h, t, hd).astype(x.dtype)


def apply(
    params: Dict[str, Any],
    config: TranceptionConfig,
    tokens: jnp.ndarray,
) -> jnp.ndarray:
    """(B, T) tokens -> (B, T, V) f32 logits (causal, ALiBi positions)."""
    c = config
    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    grp = h // 4

    x = params["wte"].astype(c.dtype)[tokens]
    bias = jnp.asarray(alibi_bias(h, t))  # (H, 1, T)
    pad_mask = tokens == VOCAB.PAD

    for layer in params["layers"]:
        residual = x
        y = _ln(x, layer["ln_1"])
        qkv = _dense(y, layer["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, h, hd).transpose(0, 2, 1, 3)  # (B, H, T, hd)

        q, k, v = heads(q), heads(k), heads(v)
        # grouped depthwise convs: group 0 untouched; groups 1-3 kernels 3/5/7
        qs, ks, vs = [q[:, :grp]], [k[:, :grp]], [v[:, :grp]]
        for gi in range(3):
            sl = slice((gi + 1) * grp, (gi + 2) * grp)
            qs.append(_causal_depthwise_conv(q[:, sl], layer["dwconv"][f"q{gi}"]))
            ks.append(_causal_depthwise_conv(k[:, sl], layer["dwconv"][f"k{gi}"]))
            vs.append(_causal_depthwise_conv(v[:, sl], layer["dwconv"][f"v{gi}"]))
        q = jnp.concatenate(qs, axis=1)
        k = jnp.concatenate(ks, axis=1)
        v = jnp.concatenate(vs, axis=1)

        # shared mha dispatcher: grouped Pallas kernel on TPU (scores in
        # VMEM), XLA reference elsewhere. The grouped-ALiBi bias is a
        # KEY-position bias (H, T), which is exactly mha's bias contract.
        # Post-softmax parity with the reference's -1e4-then-bias fill
        # order holds because exp of either fill underflows to exactly 0.
        from proteingym_tpu.ops.flash_attention import mha

        ctx = mha(
            q, k, v, key_mask=~pad_mask, bias=bias[:, 0],
            causal=True, sm_scale=1.0 / math.sqrt(hd),
        ).astype(x.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        x = residual + _dense(ctx, layer["c_proj"])

        residual = x
        y = _ln(x, layer["ln_2"])
        y = _dense(y, layer["c_fc"])
        y32 = jnp.maximum(y.astype(jnp.float32), 0.0)
        y = (y32 * y32).astype(x.dtype)  # squared ReLU (activations.py:79-86)
        y = _dense(y, layer["c_proj_mlp"])
        x = residual + y

    x = _ln(x, params["ln_f"])
    return jnp.dot(
        x,
        params["wte"].astype(x.dtype).T,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Checkpoint conversion (HF Tranception state_dict -> pytree)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict, config: TranceptionConfig):
    """Convert a HF Tranception checkpoint (transformer.* naming, GPT-2
    Conv1D weights stored as (in, out))."""

    def get(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    def conv1d(prefix):  # GPT2 Conv1D: weight already (in, out)
        return {"kernel": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    layers = []
    for i in range(config.num_layers):
        p = f"transformer.h.{i}"
        dw = {}
        for gi in range(3):
            for name, ref in [("q", "query"), ("k", "key"), ("v", "value")]:
                w = get(f"{p}.attn.{ref}_depthwiseconv.{gi}.conv.weight")
                # torch conv weight: (out=hd, in/groups=1, K) -> (K, hd)
                dw[f"{name}{gi}"] = {
                    "kernel": jnp.transpose(w[:, 0, :], (1, 0)),
                    "bias": get(f"{p}.attn.{ref}_depthwiseconv.{gi}.conv.bias"),
                }
        layers.append(
            {
                "ln_1": ln(f"{p}.ln_1"),
                "c_attn": conv1d(f"{p}.attn.c_attn"),
                "c_proj": conv1d(f"{p}.attn.c_proj"),
                "ln_2": ln(f"{p}.ln_2"),
                "c_fc": conv1d(f"{p}.mlp.c_fc"),
                "c_proj_mlp": conv1d(f"{p}.mlp.c_proj"),
                "dwconv": dw,
            }
        )
    return {
        "wte": get("transformer.wte.weight"),
        "layers": layers,
        "ln_f": ln("transformer.ln_f"),
    }
