"""AR protein LM zoo: ProGen2 (GPT-J style), RITA, ProtGPT2 (GPT-2 style).

All three plug into the generic AR harness (models/ar_scoring.py) via a
``logits_fn`` + tokenizer. Architecture parity targets:

  - ProGen2 (ref progen2/models/progen/modeling_progen.py): GPT-J layout —
    single ln_1 per block feeding BOTH attention and MLP in PARALLEL
    (x = attn(ln(x)) + mlp(ln(x)) + x, ref :252-283); fused qkv projection
    without bias, GPT-J mp_num=8 shard-interleaved qkv ordering (:92-94);
    interleaved ("rotate_every_two") rotary on the first rotary_dim dims
    (:47-57, :178-194); fp32 attention scores / sqrt(head_dim); lm_head with
    bias. Scoring (ref progen2/compute_fitness.py:34-87): no WT delta,
    mirrored, non-overlapping chunks, CE over logits RESTRICTED to the AA
    token range 5..29 (renormalized!), mean over sequence length.

  - RITA (ref rita/rita_modeling.py): sequential pre-LN decoder; rotary over
    the FULL head dim ("rotate_half" halves convention, :39-67); GELU MLP
    with bias; final LayerNorm; untied lm_head.

  - ProtGPT2: stock GPT-2 (learned positions, pre-LN, gelu, tied head) over
    a BPE vocabulary; the tokenizer is pluggable (HF tokenizer files).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Shared primitives
# ---------------------------------------------------------------------------


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _gelu(x):
    x32 = x.astype(jnp.float32)
    return (
        0.5 * x32 * (1.0 + jnp.tanh(0.7978845608028654 * (x32 + 0.044715 * x32**3)))
    ).astype(x.dtype)


def _causal_attend(q, k, v, dtype):
    """(B, H, T, hd) fp32-score causal attention.

    Routed through the shared mha dispatcher: on TPU the grouped Pallas
    kernel keeps the (T, T) f32 scores in VMEM instead of materializing
    a (B, H, T, T) tensor in HBM (the old einsum form). Operands stay
    f32 for reference parity (ref modeling_progen.py fp32 scores);
    post-softmax results are identical (exp of the masked fill
    underflows to exactly 0 either way)."""
    from proteingym_tpu.ops.flash_attention import mha

    return mha(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), causal=True,
    ).astype(dtype)


def _rope_tables(t, dim, interleaved: bool):
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2) / dim))
    freqs = np.einsum("i,j->ij", np.arange(t), inv_freq)  # (T, dim/2)
    if interleaved:  # GPT-J: repeat each frequency twice (d j) interleave
        emb = np.repeat(freqs, 2, axis=-1)
    else:  # rotate_half: concat halves
        emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_every_two(x):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(x, cos, sin, interleaved: bool):
    """x: (B, T, H, hd_rot); tables: (T, hd_rot)."""
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    rot = _rotate_every_two(x) if interleaved else _rotate_half(x)
    return x * cos + rot * sin


# ---------------------------------------------------------------------------
# ProGen2
# ---------------------------------------------------------------------------

# tokenizer.json vocabulary: specials then terminals then 25 AA letters
PROGEN2_TOKENS = (
    ["<|pad|>", "<|bos|>", "<|eos|>", "1", "2"]
    + list("ABCDEFGHIKLMNOPQRSTUVWXYZ")
)
PROGEN2_AA_FIRST, PROGEN2_AA_LAST = 5, 29  # ref compute_fitness.py:70-71


class ProGen2Tokenizer:
    PAD = 0

    def __init__(self):
        self.tok_to_idx = {t: i for i, t in enumerate(PROGEN2_TOKENS)}

    def encode(self, seq: str) -> np.ndarray:
        return np.asarray(
            [self.tok_to_idx[c] for c in seq if c in self.tok_to_idx],
            dtype=np.int32,
        )


@dataclasses.dataclass(frozen=True)
class ProGen2Config:
    name: str = "progen2-small"
    num_layers: int = 12
    embed_dim: int = 1024
    num_heads: int = 16
    rotary_dim: int = 32
    vocab_size: int = 32
    n_ctx: int = 1024
    mp_num: int = 8  # GPT-J qkv shard interleave factor
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads


PROGEN2_PRESETS = {
    "progen2-small": ProGen2Config("progen2-small", 12, 1024, 16),
    "progen2-medium": ProGen2Config("progen2-medium", 27, 1536, 16),
    "progen2-base": ProGen2Config("progen2-base", 27, 1536, 16),
    "progen2-large": ProGen2Config("progen2-large", 32, 2560, 16),
    "progen2-xlarge": ProGen2Config("progen2-xlarge", 32, 4096, 16, 64),
}


def progen2_init(rng: jax.Array, c: ProGen2Config) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 + 4 * c.num_layers))

    def dense(n_in, n_out, bias=True):
        p = {"w": jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * 0.02}
        if bias:
            p["b"] = jnp.zeros(n_out, jnp.float32)
        return p

    def ln():
        return {"g": jnp.ones(c.embed_dim, jnp.float32),
                "b": jnp.zeros(c.embed_dim, jnp.float32)}

    params = {
        "wte": jax.random.normal(
            next(keys), (c.vocab_size, c.embed_dim), jnp.float32
        ) * 0.02,
        "ln_f": ln(),
        "lm_head": dense(c.embed_dim, c.vocab_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "ln_1": ln(),
                "qkv": dense(c.embed_dim, 3 * c.embed_dim, bias=False),
                "out": dense(c.embed_dim, c.embed_dim, bias=False),
                "fc_in": dense(c.embed_dim, 4 * c.embed_dim),
                "fc_out": dense(4 * c.embed_dim, c.embed_dim),
            }
        )
    return params


def progen2_apply(params, c: ProGen2Config, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, T, V) f32 logits."""
    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    x = params["wte"].astype(c.dtype)[tokens]
    cos, sin = _rope_tables(t, c.rotary_dim, interleaved=True)

    for layer in params["layers"]:
        y = _ln(x, layer["ln_1"])
        qkv = _dense(y, layer["qkv"])  # (B, T, 3D)
        # GPT-J mp ordering: (B,T,mp,3*local), split order is q, VALUE, k
        # (ref modeling_progen.py:164)
        local = 3 * c.embed_dim // c.mp_num
        qkv = qkv.reshape(b, t, c.mp_num, local)
        q, v, k = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, h, hd)

        q, k, v = heads(q), heads(k), heads(v)
        q_rot = _apply_rope(q[..., : c.rotary_dim], cos, sin, True)
        k_rot = _apply_rope(k[..., : c.rotary_dim], cos, sin, True)
        q = jnp.concatenate([q_rot, q[..., c.rotary_dim :]], -1)
        k = jnp.concatenate([k_rot, k[..., c.rotary_dim :]], -1)
        ctx = _causal_attend(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), x.dtype,
        )
        attn_out = _dense(ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim),
                          layer["out"])
        mlp_out = _dense(_gelu(_dense(y, layer["fc_in"])), layer["fc_out"])
        x = attn_out + mlp_out + x  # parallel residual (ref :275)

    x = _ln(x, params["ln_f"])
    return _dense(x.astype(jnp.float32), params["lm_head"])


def progen2_restricted_logits_fn(params, c: ProGen2Config):
    """logits over the 25-token AA range only (ref :69-73 renormalizes CE
    over this slice). Pair with a tokenizer emitting ids in 0..24."""

    def fn(tokens):
        full = progen2_apply(params, c, tokens + PROGEN2_AA_FIRST)
        return full[..., PROGEN2_AA_FIRST : PROGEN2_AA_LAST + 1]

    return fn


def _progen2_restricted_apply(params, c: ProGen2Config, tokens):
    full = progen2_apply(params, c, tokens + PROGEN2_AA_FIRST)
    return full[..., PROGEN2_AA_FIRST : PROGEN2_AA_LAST + 1]


def progen2_restricted_apply_fn(c: ProGen2Config):
    """STABLE (params, tokens) -> restricted logits for the AR harness
    (weights flow as jit arguments; one compile across assays)."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn

    return stable_params_fn(_progen2_restricted_apply, c)


def progen2_convert_torch_state_dict(state_dict, c: ProGen2Config):
    def get(key):
        v = state_dict[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
        )

    def dense(prefix, bias=True):
        p = {"w": jnp.asarray(get(f"{prefix}.weight").T)}
        if bias:
            p["b"] = jnp.asarray(get(f"{prefix}.bias"))
        return p

    def ln(prefix):
        return {"g": jnp.asarray(get(f"{prefix}.weight")),
                "b": jnp.asarray(get(f"{prefix}.bias"))}

    pfx = "transformer." if any(k.startswith("transformer.") for k in state_dict) else ""
    params = {
        "wte": jnp.asarray(get(f"{pfx}wte.weight")),
        "ln_f": ln(f"{pfx}ln_f"),
        "lm_head": dense("lm_head"),
        "layers": [],
    }
    for i in range(c.num_layers):
        lp = f"{pfx}h.{i}"
        params["layers"].append(
            {
                "ln_1": ln(f"{lp}.ln_1"),
                "qkv": dense(f"{lp}.attn.qkv_proj", bias=False),
                "out": dense(f"{lp}.attn.out_proj", bias=False),
                "fc_in": dense(f"{lp}.mlp.fc_in"),
                "fc_out": dense(f"{lp}.mlp.fc_out"),
            }
        )
    return params


# ---------------------------------------------------------------------------
# RITA
# ---------------------------------------------------------------------------

# HF RITA tokenizer vocabulary (vocab_size 26): specials then AAs
RITA_TOKENS = ["<PAD>", "<EOS>"] + list("ACDEFGHIKLMNPQRSTVWYUXZB")


class RitaTokenizer:
    PAD = 0
    EOS = 1

    def __init__(self):
        self.tok_to_idx = {t: i for i, t in enumerate(RITA_TOKENS)}

    def encode(self, seq: str) -> np.ndarray:
        return np.asarray(
            [self.tok_to_idx.get(c, self.tok_to_idx["X"]) for c in seq],
            dtype=np.int32,
        )


@dataclasses.dataclass(frozen=True)
class RitaConfig:
    name: str = "RITA_s"
    num_layers: int = 12
    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    vocab_size: int = 26
    n_ctx: int = 1024
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads


RITA_PRESETS = {
    "RITA_s": RitaConfig("RITA_s", 12, 768, 12, 3072),
    "RITA_m": RitaConfig("RITA_m", 24, 1024, 16, 4096),
    "RITA_l": RitaConfig("RITA_l", 24, 1536, 16, 6144),
    "RITA_xl": RitaConfig("RITA_xl", 24, 2048, 16, 8192),
}


def rita_init(rng: jax.Array, c: RitaConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 + 6 * c.num_layers))

    def dense(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * 0.02,
            "b": jnp.zeros(n_out, jnp.float32),
        }

    def ln(d):
        return {"g": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)}

    params = {
        "embedding": jax.random.normal(
            next(keys), (c.vocab_size, c.embed_dim), jnp.float32
        ) * 0.02,
        "final_norm": ln(c.embed_dim),
        "lm_head": dense(c.embed_dim, c.vocab_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "attn_norm": ln(c.embed_dim),
                "q": dense(c.embed_dim, c.embed_dim),
                "k": dense(c.embed_dim, c.embed_dim),
                "v": dense(c.embed_dim, c.embed_dim),
                "o": dense(c.embed_dim, c.embed_dim),
                "mlp_norm": ln(c.embed_dim),
                "fc1": dense(c.embed_dim, c.ffn_dim),
                "fc2": dense(c.ffn_dim, c.embed_dim),
            }
        )
    return params


def rita_apply(params, c: RitaConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    x = params["embedding"].astype(c.dtype)[tokens]
    cos, sin = _rope_tables(t, hd, interleaved=False)

    for layer in params["layers"]:
        y = _ln(x, layer["attn_norm"])
        q = _dense(y, layer["q"]).reshape(b, t, h, hd)
        k = _dense(y, layer["k"]).reshape(b, t, h, hd)
        v = _dense(y, layer["v"]).reshape(b, t, h, hd)
        q = _apply_rope(q, cos, sin, False)
        k = _apply_rope(k, cos, sin, False)
        ctx = _causal_attend(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), x.dtype,
        )
        x = x + _dense(ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim),
                       layer["o"])
        y = _ln(x, layer["mlp_norm"])
        x = x + _dense(_gelu(_dense(y, layer["fc1"])), layer["fc2"])

    x = _ln(x, params["final_norm"])
    return _dense(x.astype(jnp.float32), params["lm_head"])


# ---------------------------------------------------------------------------
# ProtGPT2 / generic GPT-2
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Gpt2Config:
    name: str = "protgpt2"
    num_layers: int = 36
    embed_dim: int = 1280
    num_heads: int = 20
    vocab_size: int = 50257  # BPE over protein "words"
    n_ctx: int = 1024
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads


def gpt2_init(rng: jax.Array, c: Gpt2Config) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 4 + 4 * c.num_layers))

    def dense(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * 0.02,
            "b": jnp.zeros(n_out, jnp.float32),
        }

    def ln():
        return {"g": jnp.ones(c.embed_dim, jnp.float32),
                "b": jnp.zeros(c.embed_dim, jnp.float32)}

    params = {
        "wte": jax.random.normal(
            next(keys), (c.vocab_size, c.embed_dim), jnp.float32
        ) * 0.02,
        "wpe": jax.random.normal(
            next(keys), (c.n_ctx, c.embed_dim), jnp.float32
        ) * 0.01,
        "ln_f": ln(),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "ln_1": ln(),
                "c_attn": dense(c.embed_dim, 3 * c.embed_dim),
                "c_proj": dense(c.embed_dim, c.embed_dim),
                "ln_2": ln(),
                "c_fc": dense(c.embed_dim, 4 * c.embed_dim),
                "c_proj_mlp": dense(4 * c.embed_dim, c.embed_dim),
            }
        )
    return params


def gpt2_apply(params, c: Gpt2Config, tokens: jnp.ndarray) -> jnp.ndarray:
    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    x = params["wte"].astype(c.dtype)[tokens] + params["wpe"].astype(c.dtype)[:t]

    for layer in params["layers"]:
        y = _ln(x, layer["ln_1"])
        qkv = _dense(y, layer["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        ctx = _causal_attend(heads(q), heads(k), heads(v), x.dtype)
        x = x + _dense(ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim),
                       layer["c_proj"])
        y = _ln(x, layer["ln_2"])
        x = x + _dense(_gelu(_dense(y, layer["c_fc"])), layer["c_proj_mlp"])

    x = _ln(x, params["ln_f"])
    return jnp.dot(
        x, params["wte"].astype(x.dtype).T, preferred_element_type=jnp.float32
    )


def rita_convert_torch_state_dict(state_dict, c: RitaConfig):
    """HF RITA state_dict -> pytree (ref rita/rita_modeling.py module names:
    transformer.layers.N.{self_attention.{q,k,v,out}_proj, attn_norm,
    mlp.{0,2}, mlp_norm}, transformer.final_norm, lm_head)."""
    def get(key):
        v = state_dict[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32,
        )

    def dense(prefix):
        return {"w": jnp.asarray(get(f"{prefix}.weight").T),
                "b": jnp.asarray(get(f"{prefix}.bias"))}

    def ln(prefix):
        return {"g": jnp.asarray(get(f"{prefix}.weight")),
                "b": jnp.asarray(get(f"{prefix}.bias"))}

    pfx = "transformer." if any(k.startswith("transformer.") for k in state_dict) else ""
    # lm_head is bias-free in the reference (rita_modeling.py:291)
    lm_head = {"w": jnp.asarray(get("lm_head.weight").T)}
    lm_head["b"] = (
        jnp.asarray(get("lm_head.bias"))
        if "lm_head.bias" in state_dict
        else jnp.zeros(lm_head["w"].shape[1], jnp.float32)
    )
    params = {
        "embedding": jnp.asarray(get(f"{pfx}embedding.weight")),
        "final_norm": ln(f"{pfx}final_norm"),
        "lm_head": lm_head,
        "layers": [],
    }
    for i in range(c.num_layers):
        lp = f"{pfx}layers.{i}"
        params["layers"].append(
            {
                "attn_norm": ln(f"{lp}.attn_norm"),
                # ref module names are key/query/value/proj (rita_modeling.py:113-121)
                "q": dense(f"{lp}.self_attention.query"),
                "k": dense(f"{lp}.self_attention.key"),
                "v": dense(f"{lp}.self_attention.value"),
                "o": dense(f"{lp}.self_attention.proj"),
                "mlp_norm": ln(f"{lp}.mlp_norm"),
                "fc1": dense(f"{lp}.mlp.0"),
                "fc2": dense(f"{lp}.mlp.2"),
            }
        )
    return params


def gpt2_convert_torch_state_dict(state_dict, c: Gpt2Config):
    """HF GPT-2 state_dict (ProtGPT2 is a stock GPT2LMHeadModel over BPE
    protein "words", ref protgpt2/compute_fitness.py:13-97) -> pytree.

    HF GPT-2 uses Conv1D modules whose weights are stored (in, out) —
    i.e. already in our matmul layout; do NOT transpose them. LayerNorms
    and the (tied) wte/wpe convert directly.
    """

    def get(key):
        v = state_dict[key]
        return jnp.asarray(np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32,
        ))

    pfx = "transformer." if any(k.startswith("transformer.") for k in state_dict) else ""

    def conv1d(prefix):
        return {"w": get(f"{prefix}.weight"), "b": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"g": get(f"{prefix}.weight"), "b": get(f"{prefix}.bias")}

    params = {
        "wte": get(f"{pfx}wte.weight"),
        "wpe": get(f"{pfx}wpe.weight"),
        "ln_f": ln(f"{pfx}ln_f"),
        "layers": [],
    }
    for i in range(c.num_layers):
        lp = f"{pfx}h.{i}"
        params["layers"].append(
            {
                "ln_1": ln(f"{lp}.ln_1"),
                "c_attn": conv1d(f"{lp}.attn.c_attn"),
                "c_proj": conv1d(f"{lp}.attn.c_proj"),
                "ln_2": ln(f"{lp}.ln_2"),
                "c_fc": conv1d(f"{lp}.mlp.c_fc"),
                "c_proj_mlp": conv1d(f"{lp}.mlp.c_proj"),
            }
        )
    return params
