"""ESM-C / ESM3-class masked LM (EvolutionaryScale SDK family).

Covers the reference's ``evoscale`` baselines — ESM-C 300M/600M and the
ESM3-open sequence track (ref: proteingym/baselines/evoscale/
compute_fitness.py:20-291, esm/layers/blocks.py:15-120, attention.py):

  - blocks: x += attn(x)/scale; x += ffn(x)/scale, with
    scale = sqrt(n_layers/36) for ESM3-style residue scaling (blocks.py:51)
  - attention: LN -> fused qkv (no bias) -> per-channel q/k LayerNorm
    (qk_layernorm) -> rotary -> softmax attention -> out proj
  - ffn: LN -> linear(2h, no bias) -> SwiGLU -> linear, hidden rounded up
    to a multiple of 256 (swiglu_correction_fn, blocks.py:15-17)
  - final LayerNorm without bias; untied sequence head
  - vocabulary: the ESM3 SEQUENCE_VOCAB ordering (4 specials +
    'LAGVSERTIDPKQNFYMHWC' + X B U Z O . - | + <mask>; esm3.py:52-58) —
    NOTE this differs from the ESM2 alphabet order.

Scoring: wt-marginals / masked-marginals with a 1024 sliding window
(ref compute_fitness.py:20-145), reusing the batched masked-table
machinery. ESM3's geometric-attention structure track is out of scope for
sequence-only scoring (the reference's default path also scores
sequence-only unless PDBs are supplied)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SEQUENCE_VOCAB = (
    ["<cls>", "<pad>", "<eos>", "<unk>"]
    + list("LAGVSERTIDPKQNFYMHWC")
    + ["X", "B", "U", "Z", "O", ".", "-", "|", "<mask>"]
)


class EsmcAlphabet:
    def __init__(self):
        self.tok_to_idx = {t: i for i, t in enumerate(SEQUENCE_VOCAB)}
        self.cls_idx = 0
        self.padding_idx = 1
        self.eos_idx = 2
        self.unk_idx = 3
        self.mask_idx = self.tok_to_idx["<mask>"]

    def __len__(self):
        return len(SEQUENCE_VOCAB)

    def get_idx(self, tok: str) -> int:
        return self.tok_to_idx.get(tok, self.unk_idx)

    def tokenize(self, seq: str, pad_to: Optional[int] = None) -> np.ndarray:
        ids = [self.cls_idx] + [self.get_idx(c) for c in seq] + [self.eos_idx]
        if pad_to is not None:
            ids += [self.padding_idx] * (pad_to - len(ids))
        return np.asarray(ids, np.int32)


ALPHABET = EsmcAlphabet()


def _swiglu_hidden(expansion: float, d: int) -> int:
    return int(((expansion * d) + 255) // 256 * 256)


@dataclasses.dataclass(frozen=True)
class EsmcConfig:
    name: str = "esmc_600m"
    num_layers: int = 36
    embed_dim: int = 1152
    num_heads: int = 18
    expansion_ratio: float = 8 / 3
    residue_scaling: float = 1.0  # ESM3: sqrt(n_layers / 36)
    alphabet_size: int = 33
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    @property
    def ffn_hidden(self):
        return _swiglu_hidden(self.expansion_ratio, self.embed_dim)


PRESETS = {
    "esmc_tiny": EsmcConfig("esmc_tiny", 2, 64, 4),
    "esmc_300m": EsmcConfig("esmc_300m", 30, 960, 15),
    "esmc_600m": EsmcConfig("esmc_600m", 36, 1152, 18),
    "esm3_open_1.4b_seq": EsmcConfig(
        "esm3_open_1.4b_seq", 48, 1536, 24,
        residue_scaling=float(np.sqrt(48 / 36)),
    ),
}


def init_params(rng: jax.Array, c: EsmcConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 + 4 * c.num_layers))

    def mat(n_in, n_out):
        return jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * 0.02

    def ln(d, bias=True):
        p = {"g": jnp.ones(d, jnp.float32)}
        if bias:
            p["b"] = jnp.zeros(d, jnp.float32)
        return p

    params: Dict[str, Any] = {
        "embed": mat(c.alphabet_size, c.embed_dim),
        "final_ln": ln(c.embed_dim, bias=False),
        "head": mat(c.embed_dim, c.alphabet_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "attn_ln": ln(c.embed_dim),
                "qkv": mat(c.embed_dim, 3 * c.embed_dim),
                "q_ln": ln(c.embed_dim, bias=False),
                "k_ln": ln(c.embed_dim, bias=False),
                "out": mat(c.embed_dim, c.embed_dim),
                "ffn_ln": ln(c.embed_dim),
                "ffn_in": mat(c.embed_dim, 2 * c.ffn_hidden),
                "ffn_out": mat(c.ffn_hidden, c.embed_dim),
            }
        )
    return params


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"]
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def apply(params, c: EsmcConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, T, V) f32 logits."""
    from proteingym_tpu.ops.flash_attention import mha
    from proteingym_tpu.ops.rotary import apply_rotary

    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    pad_mask = tokens == ALPHABET.padding_idx
    x = params["embed"].astype(c.dtype)[tokens]

    for layer in params["layers"]:
        y = _ln(x, layer["attn_ln"])
        qkv = (
            jnp.dot(y, layer["qkv"].astype(y.dtype),
                    preferred_element_type=jnp.float32)
        ).astype(c.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _ln(q, layer["q_ln"])
        k = _ln(k, layer["k_ln"])
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        q, k = apply_rotary(q, k)
        ctx = mha(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), key_mask=~pad_mask,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        attn_out = jnp.dot(
            ctx.astype(c.dtype), layer["out"].astype(c.dtype),
            preferred_element_type=jnp.float32,
        ).astype(c.dtype)
        x = x + attn_out / c.residue_scaling

        y = _ln(x, layer["ffn_ln"])
        hidden = jnp.dot(
            y, layer["ffn_in"].astype(y.dtype),
            preferred_element_type=jnp.float32,
        )
        h1, h2 = jnp.split(hidden, 2, axis=-1)
        gated = (jax.nn.silu(h1) * h2).astype(c.dtype)
        ffn_out = jnp.dot(
            gated, layer["ffn_out"].astype(c.dtype),
            preferred_element_type=jnp.float32,
        ).astype(c.dtype)
        x = x + ffn_out / c.residue_scaling

    x = _ln(x, params["final_ln"])
    x = x.astype(jnp.float32)
    if "head_dense" in params:
        # SDK RegressionHead: Linear -> GELU -> LayerNorm -> Linear(d, V)
        # (a single-matrix head would silently misread converted weights)
        x = jnp.dot(x, params["head_dense"],
                    preferred_element_type=jnp.float32) + params["head_dense_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = _ln(x, params["head_ln"])
    return (
        jnp.dot(x, params["head"], preferred_element_type=jnp.float32)
        + params.get("head_b", 0.0)
    )


def score_assay(
    params,
    c: EsmcConfig,
    sequence: str,
    mutants: Sequence[str],
    strategy: str = "masked-marginals",
    chunk: int = 16,
    window: int = 1024,
) -> np.ndarray:
    """Marginal scoring with the ESM harness but the ESM-C alphabet."""
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_mutants_from_table, wt_marginal_table,
    )

    from proteingym_tpu.models.ar_scoring import stable_params_fn
    from proteingym_tpu.models.esm_scoring import wt_marginal_table_overlapping

    apply_fn = stable_params_fn(apply, c)
    tokens = ALPHABET.tokenize(sequence)
    if strategy == "wt-marginals":
        if tokens.shape[0] > window:  # stitched windows, as in the ref SDK
            table = wt_marginal_table_overlapping(
                apply_fn, tokens, window=window, params=params,
                apply_fn=apply_fn,
            )
        else:
            table = wt_marginal_table(apply_fn, tokens, params=params)
    else:
        table = masked_marginal_table(
            apply_fn, tokens,
            mask_idx=ALPHABET.mask_idx, chunk=chunk, window=window,
            params=params, pad_to_multiple=64, pad_idx=ALPHABET.padding_idx,
        )
    return score_mutants_from_table(
        table, mutants, sequence, alphabet=ALPHABET
    )


def convert_torch_state_dict(state_dict, c: EsmcConfig):
    """ESM-C / ESM3 sequence-track state_dict -> pytree (SDK module names:
    transformer.blocks.N.attn.{layernorm_qkv.{0,1}, q_ln, k_ln, out_proj},
    .ffn.{0,1,3}, transformer.norm, embed, sequence_head/lm_head)."""
    def get(key):
        v = state_dict[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32,
        )

    def maybe(key):
        return key in state_dict

    def ln(prefix, bias=True):
        p = {"g": jnp.asarray(get(f"{prefix}.weight"))}
        if bias and maybe(f"{prefix}.bias"):
            p["b"] = jnp.asarray(get(f"{prefix}.bias"))
        return p

    params = {
        "embed": jnp.asarray(get("embed.weight")),
        "final_ln": ln("transformer.norm", bias=False),
        "layers": [],
    }
    if maybe("sequence_head.0.weight"):
        # SDK RegressionHead is a 4-module stack: Linear(d,d) -> GELU ->
        # LayerNorm -> Linear(d, out); collapsing it to one matrix would
        # produce (B, T, d)-shaped "logits" and meaningless scores
        params["head_dense"] = jnp.asarray(get("sequence_head.0.weight").T)
        params["head_dense_b"] = jnp.asarray(get("sequence_head.0.bias"))
        params["head_ln"] = ln("sequence_head.2")
        params["head"] = jnp.asarray(get("sequence_head.3.weight").T)
        if maybe("sequence_head.3.bias"):
            params["head_b"] = jnp.asarray(get("sequence_head.3.bias"))
    else:
        params["head"] = jnp.asarray(get("lm_head.weight").T)
    for i in range(c.num_layers):
        lp = f"transformer.blocks.{i}"
        params["layers"].append(
            {
                "attn_ln": ln(f"{lp}.attn.layernorm_qkv.0"),
                "qkv": jnp.asarray(get(f"{lp}.attn.layernorm_qkv.1.weight").T),
                "q_ln": ln(f"{lp}.attn.q_ln", bias=False),
                "k_ln": ln(f"{lp}.attn.k_ln", bias=False),
                "out": jnp.asarray(get(f"{lp}.attn.out_proj.weight").T),
                "ffn_ln": ln(f"{lp}.ffn.0"),
                "ffn_in": jnp.asarray(get(f"{lp}.ffn.1.weight").T),
                "ffn_out": jnp.asarray(get(f"{lp}.ffn.3.weight").T),
            }
        )
    return params
