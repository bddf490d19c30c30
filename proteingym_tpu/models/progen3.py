"""ProGen3: Mixtral-style MoE causal protein LM with expert parallelism.

Architecture parity with the reference
(ref: proteingym/baselines/progen3/progen3/modeling.py:167-287,
progen3/model/moe.py:33-134, progen3/config.py):

  - RMSNorm pre-norm decoder layers; rotary attention
  - SparseMoeBlock: router = linear gate (no bias) -> softmax -> top-k
    (k = num_experts_per_tok, Mixtral-style renormalized top-k weights);
    experts are gated (GLU) MLPs: down(silu(gate(x)) * up(x))
  - AR scoring over amino-acid tokens (ProGen2-style terminals)

TPU design: the reference requires megablocks CUDA dMoE kernels
(modeling.py:27-32). Here:
  - single chip: dense token-dropless MoE — every expert runs on all
    tokens, outputs are combined with the (mostly-zero) top-k routing
    weights. Batched expert matmuls are one (E, T, d) einsum on the MXU.
  - multi chip: EXPERT PARALLELISM via shard_map over an "expert" mesh
    axis — expert weights are sharded E/n per device, each device computes
    its local experts' weighted outputs on the full token set, and a psum
    over the expert axis combines them (the collective rides ICI). See
    parallel/mesh.py:expert_sharding + __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.models.ar_zoo import (
    PROGEN2_AA_FIRST, PROGEN2_AA_LAST, PROGEN2_TOKENS, _apply_rope,
    _causal_attend, _rope_tables,
)


@dataclasses.dataclass(frozen=True)
class ProGen3Config:
    name: str = "progen3-112m"
    num_layers: int = 12
    hidden_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 2048  # per-expert
    num_experts: int = 8
    top_k: int = 2
    vocab_size: int = 32
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_dim // self.num_heads


PRESETS = {
    "progen3-112m": ProGen3Config("progen3-112m", 12, 768, 12, 2048),
    "progen3-339m": ProGen3Config("progen3-339m", 16, 1024, 16, 2816),
    "progen3-1b": ProGen3Config("progen3-1b", 24, 1536, 16, 4096),
    "progen3-3b": ProGen3Config("progen3-3b", 28, 2304, 24, 5760),
}


def init_params(rng: jax.Array, c: ProGen3Config) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 + 6 * c.num_layers))

    def mat(n_in, n_out, scale=0.02):
        return jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * scale

    params: Dict[str, Any] = {
        "embed": mat(c.vocab_size, c.hidden_dim),
        "final_norm": jnp.ones(c.hidden_dim, jnp.float32),
        "lm_head": mat(c.hidden_dim, c.vocab_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "input_norm": jnp.ones(c.hidden_dim, jnp.float32),
                "post_attn_norm": jnp.ones(c.hidden_dim, jnp.float32),
                "qkv": mat(c.hidden_dim, 3 * c.hidden_dim),
                "attn_out": mat(c.hidden_dim, c.hidden_dim),
                "router": mat(c.hidden_dim, c.num_experts),
                # experts stacked on a leading E axis (shardable)
                "w_gate": jax.random.normal(
                    next(keys), (c.num_experts, c.hidden_dim, c.ffn_dim),
                    jnp.float32,
                ) * 0.02,
                "w_up": jax.random.normal(
                    next(keys), (c.num_experts, c.hidden_dim, c.ffn_dim),
                    jnp.float32,
                ) * 0.02,
                "w_down": jax.random.normal(
                    next(keys), (c.num_experts, c.ffn_dim, c.hidden_dim),
                    jnp.float32,
                ) * 0.02,
            }
        )
    return params


def _rms_norm(x, g, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, -1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * g).astype(x.dtype)


def router_weights(x32, router, num_experts: int, top_k: int):
    """(.., D) -> (.., E) sparse renormalized top-k routing weights
    (ref moe.py:90-104)."""
    logits = x32 @ router
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    # scatter the renormalized weights back into dense (.., E)
    dense = jnp.sum(
        jax.nn.one_hot(top_idx, num_experts, dtype=probs.dtype)
        * top_vals[..., None],
        axis=-2,
    )
    return dense


def moe_ffn(x, layer, c: ProGen3Config, expert_slice=None, axis_name=None):
    """Token-dropless dense MoE. x: (B, T, D).

    When ``axis_name`` is set (inside shard_map), the expert tensors passed
    in are the LOCAL shard and the outputs are psum'd over the axis; the
    router is replicated so the dense routing weights are consistent.
    """
    b, t, d = x.shape
    weights = router_weights(
        x.astype(jnp.float32), layer["router"], c.num_experts, c.top_k
    )  # (B, T, E) dense, mostly zero
    w_gate, w_up, w_down = layer["w_gate"], layer["w_up"], layer["w_down"]
    e_local = w_gate.shape[0]
    if axis_name is not None:
        shard = jax.lax.axis_index(axis_name)
        weights_local = jax.lax.dynamic_slice_in_dim(
            weights, shard * e_local, e_local, axis=-1
        )
    else:
        weights_local = weights
    xe = x.astype(jnp.float32)
    gate = jnp.einsum("btd,edf->ebtf", xe, w_gate)
    up = jnp.einsum("btd,edf->ebtf", xe, w_up)
    h = jax.nn.silu(gate) * up
    out = jnp.einsum("ebtf,efd->ebtd", h, w_down)
    combined = jnp.einsum("ebtd,bte->btd", out, weights_local)
    if axis_name is not None:
        combined = jax.lax.psum(combined, axis_name)
    return combined.astype(x.dtype)


def apply(
    params,
    c: ProGen3Config,
    tokens: jnp.ndarray,
    expert_axis: Optional[str] = None,
) -> jnp.ndarray:
    """(B, T) -> (B, T, V) f32 logits. Pass ``expert_axis`` inside a
    shard_map whose mesh shards the layers' expert tensors on that axis."""
    b, t = tokens.shape
    h_, hd = c.num_heads, c.head_dim
    x = params["embed"].astype(c.dtype)[tokens]
    cos, sin = _rope_tables(t, hd, interleaved=False)

    for layer in params["layers"]:
        y = _rms_norm(x, layer["input_norm"], c.rms_eps)
        qkv = (y.astype(jnp.float32) @ layer["qkv"]).astype(c.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _apply_rope(q.reshape(b, t, h_, hd), cos, sin, False)
        k = _apply_rope(k.reshape(b, t, h_, hd), cos, sin, False)
        v = v.reshape(b, t, h_, hd)
        ctx = _causal_attend(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), x.dtype,
        )
        attn = (
            ctx.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_dim)
            .astype(jnp.float32) @ layer["attn_out"]
        ).astype(c.dtype)
        x = x + attn
        y = _rms_norm(x, layer["post_attn_norm"], c.rms_eps)
        x = x + moe_ffn(y, layer, c, axis_name=expert_axis)

    x = _rms_norm(x, params["final_norm"], c.rms_eps)
    return x.astype(jnp.float32) @ params["lm_head"]


def restricted_logits_fn(params, c: ProGen3Config):
    """AA-range-restricted logits (ProGen2 scoring contract,
    ref progen3/compute_fitness.py shares the harness)."""

    def fn(tokens):
        full = apply(params, c, tokens + PROGEN2_AA_FIRST)
        return full[..., PROGEN2_AA_FIRST : PROGEN2_AA_LAST + 1]

    return fn


def _restricted_apply(params, c: ProGen3Config, tokens):
    full = apply(params, c, tokens + PROGEN2_AA_FIRST)
    return full[..., PROGEN2_AA_FIRST : PROGEN2_AA_LAST + 1]


def restricted_apply_fn(c: ProGen3Config):
    """STABLE (params, tokens) -> restricted logits (see ar_scoring)."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn

    return stable_params_fn(_restricted_apply, c)


# ---------------------------------------------------------------------------
# Expert-parallel forward via shard_map
# ---------------------------------------------------------------------------

def expert_sharded_apply(params, c: ProGen3Config, mesh, tokens):
    """Run the forward with experts sharded over the mesh's "expert" axis.

    Expert tensors (w_gate/w_up/w_down) are sharded E/n per device; all
    other parameters and the tokens are replicated. The per-layer psum over
    the expert axis is the only cross-device collective.
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
                    k: walk(v, k in ("w_gate", "w_up", "w_down"))
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
