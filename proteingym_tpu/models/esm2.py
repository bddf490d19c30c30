"""ESM family (ESM2 / ESM-1b / ESM-1v) as functional JAX, TPU-first.

Architecture semantics match the vendored fair-esm models used by the
reference scorer (ref: proteingym/baselines/esm/esm/model/esm2.py:13-146,
esm/model/esm1.py:40-200, esm/modules.py:84-143):

  - alphabet: prepend (<cls>, <pad>, <eos>, <unk>) + 27 AA/extra chars +
    null padding to a multiple of 8 + <mask> (ref esm/data.py:91-143)
  - token dropout rescale at inference: masked embeddings zeroed and the
    rest scaled by (1 - 0.12) / (1 - observed_mask_ratio) (ref esm2.py:85-91)
  - pre-LN transformer blocks, exact-erf GELU, rotary Q/K (ESM2) or learned
    positional embeddings (ESM-1b/1v), final LN, tied Roberta LM head

TPU design: a single params pytree + pure ``apply`` so the whole scorer
(jit ∘ vmap over masked positions) compiles to one program; attention runs
through a Pallas flash kernel when available, XLA dot-product otherwise.
All matmuls run in bf16 with f32 softmax/logits.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Segment packing: upper bound on independent sequences per packed row
# (sized for 1024-token rows of the shortest DMS assays, ~39 tokens each);
# one-hot machinery in ``apply`` is shaped by this, so packers must not
# exceed it.
MAX_ROW_SEGMENTS = 28


# ---------------------------------------------------------------------------
# Alphabet (ESM-1b/ESM2 convention)
# ---------------------------------------------------------------------------

_PROTEINSEQ_TOKS = [
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
]


class EsmAlphabet:
    """Token vocabulary with ESM-1b/ESM2 ordering (ref esm/data.py:91-143)."""

    def __init__(self):
        prepend = ["<cls>", "<pad>", "<eos>", "<unk>"]
        toks = prepend + list(_PROTEINSEQ_TOKS)
        while len(toks) % 8 != 0:
            toks.append(f"<null_{len(toks) - len(prepend) - len(_PROTEINSEQ_TOKS) + 1}>")
        toks.append("<mask>")
        self.all_toks = toks
        self.tok_to_idx = {t: i for i, t in enumerate(toks)}
        self.cls_idx = self.tok_to_idx["<cls>"]
        self.padding_idx = self.tok_to_idx["<pad>"]
        self.eos_idx = self.tok_to_idx["<eos>"]
        self.unk_idx = self.tok_to_idx["<unk>"]
        self.mask_idx = self.tok_to_idx["<mask>"]
        self.prepend_bos = True
        self.append_eos = True

    def __len__(self):
        return len(self.all_toks)

    def get_idx(self, tok: str) -> int:
        return self.tok_to_idx.get(tok, self.unk_idx)

    def encode(self, seq: str) -> np.ndarray:
        """Tokenize one sequence WITHOUT bos/eos."""
        return np.asarray([self.get_idx(c) for c in seq], dtype=np.int32)

    def tokenize(self, seq: str, pad_to: Optional[int] = None) -> np.ndarray:
        """<cls> + seq + <eos> (+ padding)."""
        ids = [self.cls_idx] + [self.get_idx(c) for c in seq] + [self.eos_idx]
        if pad_to is not None:
            ids = ids + [self.padding_idx] * (pad_to - len(ids))
        return np.asarray(ids, dtype=np.int32)


ALPHABET = EsmAlphabet()


# ---------------------------------------------------------------------------
# Config and presets
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EsmConfig:
    name: str = "esm2_t33_650M"
    num_layers: int = 33
    embed_dim: int = 1280
    num_heads: int = 20
    alphabet_size: int = 33
    token_dropout: bool = True
    use_rotary: bool = True  # ESM2; False -> learned positions (ESM-1b/1v)
    emb_layer_norm_before: bool = False  # ESM-1b only
    max_positions: int = 1024  # for learned positional embeddings
    remat: bool = False  # rematerialize each layer (training memory)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def ffn_dim(self) -> int:
        return 4 * self.embed_dim


PRESETS: Dict[str, EsmConfig] = {
    # f32 tiny config for CPU tests / mesh-parity checks
    "esm2_tiny": EsmConfig("esm2_tiny", 2, 128, 4, dtype=jnp.float32),
    "esm2_t6_8M": EsmConfig("esm2_t6_8M", 6, 320, 20),
    "esm2_t12_35M": EsmConfig("esm2_t12_35M", 12, 480, 20),
    "esm2_t30_150M": EsmConfig("esm2_t30_150M", 30, 640, 20),
    "esm2_t33_650M": EsmConfig("esm2_t33_650M", 33, 1280, 20),
    "esm2_t36_3B": EsmConfig("esm2_t36_3B", 36, 2560, 40),
    "esm2_t48_15B": EsmConfig("esm2_t48_15B", 48, 5120, 40),
    "esm1b_t33_650M": EsmConfig(
        "esm1b_t33_650M", 33, 1280, 20,
        use_rotary=False, emb_layer_norm_before=True, token_dropout=True,
    ),
    "esm1v_t33_650M": EsmConfig(
        "esm1v_t33_650M", 33, 1280, 20,
        use_rotary=False, emb_layer_norm_before=False, token_dropout=True,
    ),
}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, config: EsmConfig) -> Dict[str, Any]:
    """Random-normal initialized parameter pytree (f32 master weights)."""
    keys = iter(jax.random.split(rng, 16 + 16 * config.num_layers))
    d, f, v = config.embed_dim, config.ffn_dim, config.alphabet_size

    def dense(key, n_in, n_out):
        return {
            "kernel": jax.random.normal(key, (n_in, n_out), jnp.float32)
            / math.sqrt(n_in),
            "bias": jnp.zeros((n_out,), jnp.float32),
        }

    def ln():
        return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}

    layers = []
    for _ in range(config.num_layers):
        layers.append(
            {
                "attn_ln": ln(),
                "q": dense(next(keys), d, d),
                "k": dense(next(keys), d, d),
                "v": dense(next(keys), d, d),
                "out": dense(next(keys), d, d),
                "ffn_ln": ln(),
                "fc1": dense(next(keys), d, f),
                "fc2": dense(next(keys), f, d),
            }
        )
    params = {
        "embed_tokens": jax.random.normal(next(keys), (v, d), jnp.float32) * 0.02,
        "layers": layers,
        "final_ln": ln(),
        "lm_head": {
            "dense": dense(next(keys), d, d),
            "ln": ln(),
            # output projection is tied to embed_tokens; only a bias here
            "bias": jnp.zeros((v,), jnp.float32),
        },
    }
    if not config.use_rotary:
        params["embed_positions"] = (
            jax.random.normal(
                next(keys), (config.max_positions + 2, d), jnp.float32
            )
            * 0.02
        )
        if config.emb_layer_norm_before:
            params["emb_ln_before"] = ln()
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return (
        jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
        + p["bias"]
    ).astype(x.dtype)


def _gelu(x):
    # exact erf GELU (ref esm/modules.py gelu)
    x32 = x.astype(jnp.float32)
    return (x32 * 0.5 * (1.0 + jax.lax.erf(x32 / math.sqrt(2.0)))).astype(x.dtype)


def _attention(x, layer, config: EsmConfig, padding_mask, segment_ids=None):
    """Bidirectional multi-head self-attention, (B, T, D)."""
    b, t, d = x.shape
    h, hd = config.num_heads, config.head_dim
    # softmax scale folded into the q projection EPILOGUE: the scalar
    # multiply fuses into the matmul output fusion for free, where
    # scaling inside the attention entry costs a standalone (B, T, H, D)
    # HBM pass (measured 0.84 s per L=1500 table, r5 trace). Linearity
    # of RoPE keeps this exact in the rotated path.
    scale = jnp.asarray(hd ** -0.5, x.dtype)
    key_mask = None if padding_mask is None else ~padding_mask
    rope_base = 10000.0 if config.use_rotary else None
    if os.environ.get("PGYM_ATTN_EINSUM", "1") != "0":
        # DEFAULT path (r5): project straight into the kernel's
        # (B, H, T, D) layout via einsum so XLA folds the layout change
        # into the matmuls instead of materializing four per-layer HBM
        # transposes (r5 long-path trace: 1.8 s/table of
        # transpose/data-formatting around the custom call). Measured on
        # v5e vs the transpose route: headline 7,465 vs 7,083-7,277
        # mut/s, L=1500 window path 1,603 vs 1,466, production mix
        # 2,107 vs 1,961 (tools/ab_scale.py). PGYM_ATTN_EINSUM=0
        # restores the transpose route for re-measurement.
        from proteingym_tpu.ops.flash_attention import mha

        def proj_heads(p, s=None):
            w = p["kernel"].astype(x.dtype).reshape(d, h, hd)
            y = jnp.einsum("bte,ehd->bhtd", x, w,
                           preferred_element_type=jnp.float32)
            y = y + p["bias"].reshape(h, 1, hd)
            if s is not None:
                y = y * s
            return y.astype(x.dtype)

        q = proj_heads(layer["q"], scale)
        k = proj_heads(layer["k"])
        v = proj_heads(layer["v"])
        ctx = mha(q, k, v, key_mask=key_mask, sm_scale=1.0,
                  rope_base=rope_base, segment_ids=segment_ids)
        wo = layer["out"]["kernel"].astype(x.dtype).reshape(d, d)
        out = jnp.einsum(
            "bhtd,hde->bte", ctx.astype(x.dtype),
            wo.reshape(h, hd, d), preferred_element_type=jnp.float32,
        ) + layer["out"]["bias"]
        return out.astype(x.dtype)
    q = (_dense(x, layer["q"]) * scale).reshape(b, t, h, hd)
    k = _dense(x, layer["k"]).reshape(b, t, h, hd)
    v = _dense(x, layer["v"]).reshape(b, t, h, hd)
    # fused Pallas attention on TPU, XLA einsum elsewhere. RoPE rides into
    # the kernel unapplied: it rotates q/k in VMEM (the in-graph rotary's
    # elementwise HBM passes measured ~23% of a forward at T=256).
    # mha_natural keeps the (B, T, H, D) projection layout; with
    # PGYM_MHA_LAYOUT=bthd the heads-mid kernel skips the four per-layer
    # HBM transposes around the custom call.
    from proteingym_tpu.ops.flash_attention import mha_natural

    ctx = mha_natural(
        q, k, v,
        key_mask=key_mask,
        sm_scale=1.0,  # q is pre-scaled above
        rope_base=rope_base,
        segment_ids=segment_ids,
    )
    ctx = ctx.astype(x.dtype).reshape(b, t, d)
    return _dense(ctx, layer["out"])


def _learned_positions(tokens, padding_idx):
    """fairseq LearnedPositionalEmbedding indices: cumsum over non-pad +
    padding_idx (pad positions get padding_idx)."""
    mask = (tokens != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def apply(
    params: Dict[str, Any],
    config: EsmConfig,
    tokens: jnp.ndarray,
    return_representations: bool = False,
    extra_embedding=None,
    segment_ids: Optional[jnp.ndarray] = None,
):
    """Forward pass: (B, T) int tokens -> (B, T, V) f32 logits.

    Mirrors ref esm2.py:76-143 (minus contact head, which lives in
    models/contacts.py when needed). ``extra_embedding`` (T, D) is an
    optional additive per-position conditioning signal (structure
    adapters, e.g. MULAN in models/structure_plms.py).

    ``segment_ids`` (B, T) int32, 0 = padding, 1..S contiguous: each row
    packs several independent sequences (segment packing — every segment
    scores EXACTLY as if it were alone in the row). Attention is
    block-diagonal per segment, token-dropout scaling is computed per
    segment, and learned positions restart at each segment boundary;
    rotary needs no adjustment (RoPE attention sees only position
    differences, and cross-segment pairs are masked).
    """
    pad = ALPHABET.padding_idx
    mask_idx = ALPHABET.mask_idx
    padding_mask = tokens == pad
    any_padding = padding_mask  # static-shape friendly: always mask

    seg_onehot = None
    if segment_ids is not None:
        # (B, T, S) one-hot over live segments; built once, reused by the
        # token-dropout and positional machinery below (einsum -> MXU).
        # Packers must keep per-row segment counts <= MAX_ROW_SEGMENTS
        # (ids above it would silently fall out of the one-hot).
        seg_onehot = (
            segment_ids[..., None]
            == jnp.arange(1, MAX_ROW_SEGMENTS + 1)[None, None]
        ).astype(jnp.float32)

    x = params["embed_tokens"].astype(config.dtype)[tokens]
    if extra_embedding is not None:
        cond = jnp.asarray(extra_embedding)
        if cond.ndim == 2:  # shared (T, D) conditioning
            cond = cond[None, : x.shape[1]]
        x = x + cond.astype(x.dtype)

    if config.token_dropout:
        is_masked = tokens == mask_idx
        x = jnp.where(is_masked[..., None], 0.0, x)
        mask_ratio_train = 0.15 * 0.8
        if seg_onehot is None:
            src_lengths = jnp.sum(~padding_mask, axis=-1)
            mask_ratio_obs = (
                jnp.sum(is_masked, axis=-1) / jnp.maximum(src_lengths, 1)
            )
            scale = (1 - mask_ratio_train) / (1 - mask_ratio_obs)
            x = x * scale[:, None, None].astype(x.dtype)
        else:
            # per-SEGMENT observed mask ratio (each packed sequence must
            # see the same scale it would get alone, ref esm2.py:95-101)
            seg_len = jnp.einsum("bts->bs", seg_onehot)
            seg_masked = jnp.einsum(
                "bts,bt->bs", seg_onehot, is_masked.astype(jnp.float32)
            )
            seg_scale = (1 - mask_ratio_train) / (
                1 - seg_masked / jnp.maximum(seg_len, 1.0)
            )
            tok_scale = jnp.einsum("bts,bs->bt", seg_onehot, seg_scale)
            x = x * tok_scale[..., None].astype(x.dtype)

    if not config.use_rotary:
        if seg_onehot is None:
            pos = _learned_positions(tokens, pad)
        else:
            # fairseq indices restarted per segment: rank of the token
            # within its own segment (+ padding_idx; pads get padding_idx)
            csum = jnp.cumsum(seg_onehot, axis=1)  # (B, T, S)
            rank = jnp.einsum("bts,bts->bt", seg_onehot, csum)
            pos = (rank.astype(jnp.int32) + pad) * (segment_ids > 0) + pad * (
                segment_ids == 0
            )
        x = x + params["embed_positions"].astype(config.dtype)[pos]
        if config.emb_layer_norm_before and "emb_ln_before" in params:
            x = _layer_norm(x, params["emb_ln_before"])

    x = jnp.where(padding_mask[..., None], 0.0, x)

    def layer_fn(x, layer):
        residual = x
        y = _layer_norm(x, layer["attn_ln"])
        y = _attention(y, layer, config, any_padding, segment_ids)
        x = residual + y
        residual = x
        y = _layer_norm(x, layer["ffn_ln"])
        y = _gelu(_dense(y, layer["fc1"]))
        y = _dense(y, layer["fc2"])
        return residual + y

    if config.remat:
        # trade FLOPs for HBM during training (jax.checkpoint per layer)
        layer_fn = jax.checkpoint(layer_fn)

    reps = {}
    for i, layer in enumerate(params["layers"]):
        x = layer_fn(x, layer)
        if return_representations:
            reps[i + 1] = x

    x = _layer_norm(x, params["final_ln"])
    if return_representations:
        # fair-esm overwrites representations[num_layers] with the
        # POST-final-LN tensor (ref esm2.py:120-123) — downstream consumers
        # (ProtSSN embeddings, supervised embedding baselines) expect the
        # normalized scale
        reps[config.num_layers] = x

    # Roberta LM head: dense -> gelu -> LN -> tied linear + bias
    h = _dense(x, params["lm_head"]["dense"])
    h = _gelu(h)
    h = _layer_norm(h, params["lm_head"]["ln"])
    logits = (
        jnp.dot(
            h,
            params["embed_tokens"].astype(h.dtype).T,
            preferred_element_type=jnp.float32,
        )
        + params["lm_head"]["bias"]
    )
    if return_representations:
        return logits, reps
    return logits


@functools.lru_cache(maxsize=32)
def make_apply_fn(config: EsmConfig):
    """STABLE (params, tokens) -> logits callable for ``config``.

    The scoring harness caches its jitted wrappers per callable object
    (esm_scoring._cached_jit); building a fresh lambda per assay or per
    call would recompile the full model graph every time. This helper is
    lru-cached on the (hashable, frozen) config so every caller with the
    same config shares one callable — and therefore one compiled program
    per input shape.
    """

    def apply_fn(params, tokens):
        return apply(params, config, tokens)

    return apply_fn


@functools.lru_cache(maxsize=32)
def make_segmented_apply_fn(config: EsmConfig):
    """STABLE (params, tokens, segment_ids) -> logits callable for packed
    rows (see ``apply``'s segment_ids contract)."""

    def apply_fn(params, tokens, segment_ids):
        return apply(params, config, tokens, segment_ids=segment_ids)

    return apply_fn


# ---------------------------------------------------------------------------
# Checkpoint conversion (fair-esm torch state_dict -> params pytree)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict, config: EsmConfig) -> Dict[str, Any]:
    """Convert a fair-esm checkpoint (model state_dict) to our pytree.

    Accepts tensors or numpy arrays; key layout follows the vendored ESM2
    module names (ref esm2.py:40-74, modules.py:103-119).
    """

    def get(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    def dense(prefix):
        return {"kernel": get(f"{prefix}.weight").T, "bias": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    layers = []
    for i in range(config.num_layers):
        p = f"layers.{i}"
        layers.append(
            {
                "attn_ln": ln(f"{p}.self_attn_layer_norm"),
                "q": dense(f"{p}.self_attn.q_proj"),
                "k": dense(f"{p}.self_attn.k_proj"),
                "v": dense(f"{p}.self_attn.v_proj"),
                "out": dense(f"{p}.self_attn.out_proj"),
                "ffn_ln": ln(f"{p}.final_layer_norm"),
                "fc1": dense(f"{p}.fc1"),
                "fc2": dense(f"{p}.fc2"),
            }
        )
    params = {
        "embed_tokens": get("embed_tokens.weight"),
        "layers": layers,
        "final_ln": ln("emb_layer_norm_after"),
        "lm_head": {
            "dense": dense("lm_head.dense"),
            "ln": ln("lm_head.layer_norm"),
            "bias": get("lm_head.bias"),
        },
    }
    if not config.use_rotary:
        params["embed_positions"] = get("embed_positions.weight")
        if config.emb_layer_norm_before:
            params["emb_ln_before"] = ln("emb_layer_norm_before")
    return params


def convert_hf_esm_state_dict(state_dict, config: EsmConfig,
                              prefix: str = "esm.") -> Dict[str, Any]:
    """Convert a HuggingFace EsmForMaskedLM state_dict (transformers
    modeling_esm layout: {prefix}embeddings/encoder.layer.N.attention...)
    to our pytree. The math is identical to fair-esm (HF's EsmSelfAttention
    scales the query and fixes rotary exactly like the original); only key
    names differ. Used for MULAN's trunk and any HF-format ESM2 release."""

    def get(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    def dense(p):
        return {"kernel": get(f"{p}.weight").T, "bias": get(f"{p}.bias")}

    def ln(p):
        return {"scale": get(f"{p}.weight"), "bias": get(f"{p}.bias")}

    enc = f"{prefix}encoder"
    layers = []
    for i in range(config.num_layers):
        p = f"{enc}.layer.{i}"
        layers.append(
            {
                "attn_ln": ln(f"{p}.attention.LayerNorm"),
                "q": dense(f"{p}.attention.self.query"),
                "k": dense(f"{p}.attention.self.key"),
                "v": dense(f"{p}.attention.self.value"),
                "out": dense(f"{p}.attention.output.dense"),
                "ffn_ln": ln(f"{p}.LayerNorm"),
                "fc1": dense(f"{p}.intermediate.dense"),
                "fc2": dense(f"{p}.output.dense"),
            }
        )
    params = {
        "embed_tokens": get(f"{prefix}embeddings.word_embeddings.weight"),
        "layers": layers,
        "final_ln": ln(f"{enc}.emb_layer_norm_after"),
        "lm_head": {
            "dense": dense("lm_head.dense"),
            "ln": ln("lm_head.layer_norm"),
            "bias": get("lm_head.bias"),
        },
    }
    if "lm_head.decoder.weight" in state_dict:
        # our head reuses embed_tokens (the published ESM2/MULAN releases
        # tie them); an untied fine-tune would silently mis-score otherwise
        dec = np.asarray(get("lm_head.decoder.weight"))
        emb = np.asarray(params["embed_tokens"])
        if not np.allclose(dec, emb, atol=1e-6):
            raise ValueError(
                "HF checkpoint has an untied lm_head.decoder.weight; this "
                "converter assumes weight tying with word_embeddings"
            )
    if not config.use_rotary:
        params["embed_positions"] = get(
            f"{prefix}embeddings.position_embeddings.weight"
        )
        if config.emb_layer_norm_before:
            params["emb_ln_before"] = ln(f"{prefix}embeddings.layer_norm")
    return params


@functools.lru_cache(maxsize=16)
def make_sharded_apply_fn(config: EsmConfig, mesh):
    """STABLE (params, tokens) -> logits callable for mesh execution.

    Token rows carry a ("data", None) sharding constraint so chunked
    masked-marginal batches split over the data axis while the (already
    tensor-parallel-sharded) params drive XLA's model-axis partitioning —
    the production counterpart of tests/test_parallel.py's TP path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = NamedSharding(mesh, P("data", None))

    def apply_fn(params, tokens):
        from proteingym_tpu.ops.flash_attention import force_xla_attention

        tokens = jax.lax.with_sharding_constraint(tokens, data_sharding)
        # heads are model-axis sharded; Pallas custom calls cannot be
        # partitioned, so trace the partitionable XLA attention instead
        with force_xla_attention():
            return apply(params, config, tokens)

    return apply_fn
