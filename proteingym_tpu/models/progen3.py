"""ProGen3: MoE causal protein LM with expert parallelism, weight-compatible
with the reference's vendored modeling code.

Architecture parity (ref: proteingym/baselines/progen3/progen3/modeling.py,
progen3/model/attention.py, progen3/model/moe.py, progen3/config.py):

  - embeddings: token embedding + SEQUENCE-ID embedding (MSA-style packing,
    modeling.py embed_seq_id; plain CLM uses sequence_ids = 0)
  - RMSNorm pre-norm decoder layers (input_layernorm / post_attention_layernorm)
  - attention: GQA (num_key_value_heads), llama rotate-half rotary over the
    FULL head dim with rope_theta=100000, position_ids-indexed tables,
    bias-free q/k/v/o projections (attention.py:118-125)
  - MoE (moe.py SparseMoeBlock, "switch" selection): gate logits -> softmax
    (f32) -> top-k -> renormalize; experts are plain MLPs w2(silu(w1 x)) by
    default (config.gated_mlp=False) or GLU w2(silu(w1 x) * w3 x)
  - untied lm_head (modeling.py:531)
  - scoring (scorer.py/batch_preparer.py): tokens = <bos> 1 SEQ 2 <eos>,
    mean NLL over shifted targets, averaged over both directions (the
    reversed pass reverses the "1"+SEQ+"2" string)

TPU design: the reference requires megablocks CUDA dMoE kernels
(modeling.py:27-32). Here:
  - single chip: dense token-dropless MoE — every expert runs on all
    tokens, outputs combined with the (mostly-zero) top-k routing weights.
    Batched expert matmuls are one (E, T, d) einsum on the MXU.
  - multi chip: EXPERT PARALLELISM via shard_map over an "expert" mesh
    axis — expert weights are sharded E/n per device, each device computes
    its local experts' weighted outputs on the full token set, and a psum
    over the expert axis combines them (the collective rides ICI). See
    parallel/mesh.py + __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Tokenizer (ref progen3/tokenizer.json vocabulary)
# ---------------------------------------------------------------------------

PROGEN3_SPECIALS = ["<pad>", "<bos>", "<eos>", "<bos_glm>", "<eos_span>", "<mask>"]
PROGEN3_TOKENS = PROGEN3_SPECIALS + ["1", "2"] + list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
PAD, BOS, EOS = 0, 1, 2
TERM_N, TERM_C = 6, 7  # "1" and "2"


class ProGen3Tokenizer:
    def __init__(self):
        self.tok_to_idx = {t: i for i, t in enumerate(PROGEN3_TOKENS)}

    def encode_clm(self, seq: str, reverse: bool = False) -> np.ndarray:
        """<bos> 1 SEQ 2 <eos> (ref batch_preparer.py:100-114); the reversed
        pass reverses the terminal-wrapped string, not the token list."""
        s = "1" + seq + "2"
        if reverse:
            s = s[::-1]
        ids = [BOS] + [self.tok_to_idx[c] for c in s if c in self.tok_to_idx] + [EOS]
        return np.asarray(ids, dtype=np.int32)


TOKENIZER = ProGen3Tokenizer()


@dataclasses.dataclass(frozen=True)
class ProGen3Config:
    name: str = "progen3-112m"
    num_layers: int = 12
    hidden_dim: int = 768
    num_heads: int = 12
    num_kv_heads: Optional[int] = None  # None -> num_heads (no GQA)
    ffn_dim: int = 2048  # per-expert intermediate size
    num_experts: int = 8
    top_k: int = 2
    gated_mlp: bool = False
    vocab_size: int = 34
    max_num_seqs: int = 512
    rope_theta: float = 100_000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_dim // self.num_heads

    @property
    def kv_heads(self):
        return self.num_kv_heads or self.num_heads


PRESETS = {
    "progen3-112m": ProGen3Config("progen3-112m", 12, 768, 12, None, 2048),
    "progen3-339m": ProGen3Config("progen3-339m", 16, 1024, 16, None, 2816),
    "progen3-1b": ProGen3Config("progen3-1b", 24, 1536, 16, None, 4096),
    "progen3-3b": ProGen3Config("progen3-3b", 28, 2304, 24, None, 5760),
}


def init_params(rng: jax.Array, c: ProGen3Config) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 8 + 8 * c.num_layers))

    def mat(n_in, n_out, scale=0.02):
        return jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * scale

    hd = c.head_dim
    params: Dict[str, Any] = {
        "embed_tokens": mat(c.vocab_size, c.hidden_dim),
        "embed_seq_id": mat(c.max_num_seqs, c.hidden_dim),
        "final_norm": jnp.ones(c.hidden_dim, jnp.float32),
        "lm_head": mat(c.hidden_dim, c.vocab_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        layer = {
            "input_norm": jnp.ones(c.hidden_dim, jnp.float32),
            "post_attn_norm": jnp.ones(c.hidden_dim, jnp.float32),
            "q": mat(c.hidden_dim, c.num_heads * hd),
            "k": mat(c.hidden_dim, c.kv_heads * hd),
            "v": mat(c.hidden_dim, c.kv_heads * hd),
            "o": mat(c.num_heads * hd, c.hidden_dim),
            "router": mat(c.hidden_dim, c.num_experts),
            # experts stacked on a leading E axis (shardable over the mesh)
            "w1": jax.random.normal(
                next(keys), (c.num_experts, c.hidden_dim, c.ffn_dim), jnp.float32
            ) * 0.02,
            "w2": jax.random.normal(
                next(keys), (c.num_experts, c.ffn_dim, c.hidden_dim), jnp.float32
            ) * 0.02,
        }
        if c.gated_mlp:
            layer["w3"] = jax.random.normal(
                next(keys), (c.num_experts, c.hidden_dim, c.ffn_dim), jnp.float32
            ) * 0.02
        params["layers"].append(layer)
    return params


def _rms_norm(x, g, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, -1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * g).astype(x.dtype)


def _rope(x, positions, theta):
    """llama rotate-half rotary over the full head dim.
    x: (B, T, H, hd); positions: (B, T)."""
    hd = x.shape[-1]
    inv_freq = theta ** -(jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)[:, :, None, :]
    cos, sin = jnp.cos(emb).astype(x.dtype), jnp.sin(emb).astype(x.dtype)
    half = hd // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin


def router_weights(x32, router, num_experts: int, top_k: int):
    """(.., D) -> (.., E) sparse renormalized top-k routing weights
    (ref moe.py:90-104: softmax in f32, then top-k, then renormalize)."""
    logits = x32 @ router
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    dense = jnp.sum(
        jax.nn.one_hot(top_idx, num_experts, dtype=probs.dtype)
        * top_vals[..., None],
        axis=-2,
    )
    return dense


def moe_ffn(x, layer, c: ProGen3Config, axis_name=None):
    """Token-dropless dense MoE. x: (B, T, D).

    When ``axis_name`` is set (inside shard_map), the expert tensors passed
    in are the LOCAL shard and the outputs are psum'd over the axis; the
    router is replicated so the dense routing weights are consistent.
    """
    weights = router_weights(
        x.astype(jnp.float32), layer["router"], c.num_experts, c.top_k
    )  # (B, T, E) dense, mostly zero
    w1, w2 = layer["w1"], layer["w2"]
    e_local = w1.shape[0]
    if axis_name is not None:
        shard = jax.lax.axis_index(axis_name)
        weights_local = jax.lax.dynamic_slice_in_dim(
            weights, shard * e_local, e_local, axis=-1
        )
    else:
        weights_local = weights
    xe = x.astype(jnp.float32)
    h = jax.nn.silu(jnp.einsum("btd,edf->ebtf", xe, w1))
    if c.gated_mlp:
        h = h * jnp.einsum("btd,edf->ebtf", xe, layer["w3"])
    out = jnp.einsum("ebtf,efd->ebtd", h, w2)
    combined = jnp.einsum("ebtd,bte->btd", out, weights_local)
    if axis_name is not None:
        combined = jax.lax.psum(combined, axis_name)
    return combined.astype(x.dtype)


def apply(
    params,
    c: ProGen3Config,
    tokens: jnp.ndarray,
    position_ids: Optional[jnp.ndarray] = None,
    sequence_ids: Optional[jnp.ndarray] = None,
    expert_axis: Optional[str] = None,
) -> jnp.ndarray:
    """(B, T) -> (B, T, V) f32 logits. Pass ``expert_axis`` inside a
    shard_map whose mesh shards the layers' expert tensors on that axis."""
    b, t = tokens.shape
    nh, kvh, hd = c.num_heads, c.kv_heads, c.head_dim
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(t), (b, t))
    if sequence_ids is None:
        sequence_ids = jnp.zeros((b, t), jnp.int32)

    x = (
        params["embed_tokens"].astype(c.dtype)[tokens]
        + params["embed_seq_id"].astype(c.dtype)[sequence_ids]
    )

    for layer in params["layers"]:
        y = _rms_norm(x, layer["input_norm"], c.rms_eps)
        y32 = y.astype(jnp.float32)
        q = (y32 @ layer["q"]).reshape(b, t, nh, hd).astype(c.dtype)
        k = (y32 @ layer["k"]).reshape(b, t, kvh, hd).astype(c.dtype)
        v = (y32 @ layer["v"]).reshape(b, t, kvh, hd).astype(c.dtype)
        q = _rope(q, position_ids, c.rope_theta)
        k = _rope(k, position_ids, c.rope_theta)
        if kvh != nh:  # GQA: repeat kv heads (ref attention.py:15-25)
            rep = nh // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        # shared dispatcher (grouped Pallas kernel on TPU, XLA reference
        # elsewhere); operands stay f32 for reference parity
        from proteingym_tpu.ops.flash_attention import mha

        tr = lambda z: z.transpose(0, 2, 1, 3)
        ctx = tr(mha(
            tr(q.astype(jnp.float32)), tr(k.astype(jnp.float32)),
            tr(v.astype(jnp.float32)), causal=True,
        ))
        attn = (ctx.reshape(b, t, nh * hd) @ layer["o"]).astype(c.dtype)
        x = x + attn
        y = _rms_norm(x, layer["post_attn_norm"], c.rms_eps)
        x = x + moe_ffn(y, layer, c, axis_name=expert_axis)

    x = _rms_norm(x, params["final_norm"], c.rms_eps)
    return x.astype(jnp.float32) @ params["lm_head"]


# ---------------------------------------------------------------------------
# Scoring (ref scorer.py:67-80 + batch_preparer.py:100-114)
# ---------------------------------------------------------------------------

def score_sequences(
    params, c: ProGen3Config, sequences, batch_size: int = 16,
) -> np.ndarray:
    """Mirrored mean log-likelihood per sequence."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def batch_ll(tokens):
        logits = apply(params, c, tokens)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = tokens[:, 1:]
        ll = jnp.take_along_axis(logp[:, :-1], tgt[..., None], -1)[..., 0]
        mask = (tgt != PAD).astype(jnp.float32)
        return jnp.sum(ll * mask, -1) / jnp.maximum(jnp.sum(mask, -1), 1)

    out = np.zeros(len(sequences))
    for rev in (False, True):
        rows = [TOKENIZER.encode_clm(s, reverse=rev) for s in sequences]
        for s in range(0, len(rows), batch_size):
            blk = rows[s : s + batch_size]
            t = max(len(r) for r in blk)
            toks = np.full((len(blk), t), PAD, np.int32)
            for i, r in enumerate(blk):
                toks[i, : len(r)] = r
            out[s : s + len(blk)] += np.asarray(batch_ll(jnp.asarray(toks)))
    return out / 2.0


# ---------------------------------------------------------------------------
# Checkpoint conversion (reference torch state dict -> pytree)
# ---------------------------------------------------------------------------

def config_from_hf_json(path, name: str = "progen3") -> ProGen3Config:
    """Build a ProGen3Config from an HF checkpoint's config.json (the field
    names follow the vendored configuration class, ref
    progen3/progen3/config.py:28-75 — hidden_size, num_hidden_layers,
    num_attention_heads, num_key_value_heads, intermediate_size,
    num_experts, num_experts_per_tok, gated_mlp, rope_theta,
    max_num_sequences, rms_norm_eps). Covers the published sizes that have
    no hand-written preset here (219m, 762m, ...)."""
    import json

    meta = json.loads(open(path).read())
    hidden = int(meta["hidden_size"])
    inter = meta.get("intermediate_size")
    gated = bool(meta.get("gated_mlp", False))
    if inter is None:
        inter = 3 * hidden if gated else 4 * hidden
    return ProGen3Config(
        name=meta.get("_name_or_path", name) or name,
        num_layers=int(meta["num_hidden_layers"]),
        hidden_dim=hidden,
        num_heads=int(meta["num_attention_heads"]),
        num_kv_heads=(int(meta["num_key_value_heads"])
                      if meta.get("num_key_value_heads") is not None
                      else None),
        ffn_dim=int(inter),
        num_experts=int(meta.get("num_experts", 8)),
        top_k=int(meta.get("num_experts_per_tok", 2)),
        gated_mlp=gated,
        vocab_size=int(meta.get("vocab_size") or 34),
        max_num_seqs=int(meta.get("max_num_sequences", 512)),
        rope_theta=float(meta.get("rope_theta", 100_000.0)),
        rms_eps=float(meta.get("rms_norm_eps", 1e-5)),
    )


def convert_torch_state_dict(state_dict, c: ProGen3Config) -> Dict[str, Any]:
    """Reference module names (modeling.py/attention.py/moe.py) -> pytree.

    Handles both the flat layout (model.layers.N.self_attn...) and the
    fused_attention_norm layout (model.layers.N.norm_attn_norm.self_attn...).
    Linear weights transpose into matmul layout; stacked expert tensors are
    built from the per-expert w1/w2(/w3) Linears.
    """

    def get(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    pfx = "model." if any(k.startswith("model.") for k in state_dict) else ""
    params: Dict[str, Any] = {
        "embed_tokens": jnp.asarray(get(f"{pfx}embed_tokens.weight")),
        "embed_seq_id": jnp.asarray(get(f"{pfx}embed_seq_id.weight")),
        "final_norm": jnp.asarray(get(f"{pfx}norm.weight")),
        "lm_head": jnp.asarray(get("lm_head.weight").T),
        "layers": [],
    }
    for i in range(c.num_layers):
        lp = f"{pfx}layers.{i}"
        fused = f"{lp}.norm_attn_norm.self_attn.q_proj.weight" in state_dict
        attn = f"{lp}.norm_attn_norm.self_attn" if fused else f"{lp}.self_attn"
        norm = f"{lp}.norm_attn_norm" if fused else lp
        moe = f"{lp}.block_sparse_moe"
        layer = {
            "input_norm": jnp.asarray(get(f"{norm}.input_layernorm.weight")),
            "post_attn_norm": jnp.asarray(
                get(f"{norm}.post_attention_layernorm.weight")
            ),
            "q": jnp.asarray(get(f"{attn}.q_proj.weight").T),
            "k": jnp.asarray(get(f"{attn}.k_proj.weight").T),
            "v": jnp.asarray(get(f"{attn}.v_proj.weight").T),
            "o": jnp.asarray(get(f"{attn}.o_proj.weight").T),
            "router": jnp.asarray(get(f"{moe}.gate.weight").T)
            if f"{moe}.gate.weight" in state_dict
            else jnp.zeros((c.hidden_dim, c.num_experts), jnp.float32),
            "w1": jnp.asarray(np.stack([
                get(f"{moe}.experts.{e}.w1.weight").T
                for e in range(c.num_experts)
            ])),
            "w2": jnp.asarray(np.stack([
                get(f"{moe}.experts.{e}.w2.weight").T
                for e in range(c.num_experts)
            ])),
        }
        if c.gated_mlp:
            layer["w3"] = jnp.asarray(np.stack([
                get(f"{moe}.experts.{e}.w3.weight").T
                for e in range(c.num_experts)
            ]))
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# AR-harness adapters (kept for the generic scorer plumbing)
# ---------------------------------------------------------------------------

def restricted_logits_fn(params, c: ProGen3Config):
    """AA-token logits adapter for the generic AR harness: maps harness
    tokens (0..25 = A..Z) into the ProGen3 vocabulary (offset 8)."""

    def fn(tokens):
        full = apply(params, c, tokens + 8)
        return full[..., 8:34]

    return fn


def _restricted_apply(params, c: ProGen3Config, tokens):
    full = apply(params, c, tokens + 8)
    return full[..., 8:34]


def restricted_apply_fn(c: ProGen3Config):
    """STABLE (params, tokens) -> restricted logits (see ar_scoring)."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn

    return stable_params_fn(_restricted_apply, c)


# ---------------------------------------------------------------------------
# Expert-parallel forward via shard_map
# ---------------------------------------------------------------------------

def expert_sharded_apply(params, c: ProGen3Config, mesh, tokens):
    """Run the forward with experts sharded over the mesh's "expert" axis.

    Expert tensors (w1/w2/w3) are sharded E/n per device; all other
    parameters and the tokens are replicated. The per-layer psum over the
    expert axis is the only cross-device collective.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def param_specs(tree):
        def walk(node, under_expert=False):
            if isinstance(node, dict):
                return {
                    k: walk(v, k in ("w1", "w2", "w3"))
                    for k, v in node.items()
                }
            if isinstance(node, list):
                return [walk(v, under_expert) for v in node]
            return P("expert") if under_expert else P()

        return walk(tree)

    specs = param_specs(params)

    def fwd(p, toks):
        return apply(p, c, toks, expert_axis="expert")

    try:
        mapped = shard_map(
            fwd, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # older jax uses check_rep
        mapped = shard_map(
            fwd, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
            check_rep=False,
        )
    return mapped(params, tokens)
