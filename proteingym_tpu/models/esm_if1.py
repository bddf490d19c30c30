"""ESM-IF1-class inverse folding: GVP-GNN encoder + AR transformer decoder.

Covers the reference's ESM-IF1 baseline
(ref: proteingym/baselines/esm/compute_fitness_esm_if1.py:19-108, vendored
esm/inverse_folding/: gvp_modules.py, gvp_transformer_encoder.py,
transformer_decoder.py, features.py): score = autoregressive
log-likelihood of the sequence conditioned on backbone coordinates.

TPU rebuild: the GVP encoder is the rotation-equivariant message-passing
stack from ops/gvp.py over a k-NN Ca graph (dense gathers, static K); the
decoder is a standard pre-LN transformer with causal self-attention and
cross-attention into the encoder's scalar features. Sequence rows share
one encoder pass per structure and the decoder is teacher-forced + batched
over mutants (the reference decodes per sequence).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.ops.gnn import knn_graph
from proteingym_tpu.ops.gvp import (
    backbone_edge_features, backbone_node_features, gvp_apply, gvp_init,
)

IF_ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"
BOS, EOS, PAD = 21, 22, 23  # appended specials
VOCAB = 24


def tokenize(seq: str) -> np.ndarray:
    idx = {a: i for i, a in enumerate(IF_ALPHABET)}
    return np.asarray(
        [BOS] + [idx.get(c, idx["X"]) for c in seq] + [EOS], np.int32
    )


@dataclasses.dataclass(frozen=True)
class EsmIf1Config:
    name: str = "esm_if1_gvp"
    # encoder
    node_s: int = 128
    node_v: int = 16
    num_gvp_layers: int = 3
    k_neighbors: int = 16
    num_rbf: int = 16
    # decoder
    dec_layers: int = 4
    dec_dim: int = 256
    dec_heads: int = 8


def init_params(rng: jax.Array, c: EsmIf1Config) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 6 + 2 * c.num_gvp_layers
                                 + 10 * c.dec_layers))

    def dense(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out), jnp.float32)
            * np.sqrt(1.0 / n_in),
            "b": jnp.zeros(n_out, jnp.float32),
        }

    def ln(d):
        return {"g": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)}

    edge_s = c.num_rbf + 3
    params: Dict[str, Any] = {
        "embed_node": gvp_init(next(keys), 6, 3, c.node_s, c.node_v),
        "gvp_layers": [],
        "enc_out": dense(c.node_s, c.dec_dim),
        "tok_embed": jax.random.normal(
            next(keys), (VOCAB, c.dec_dim), jnp.float32
        ) * 0.02,
        "head": dense(c.dec_dim, VOCAB),
        "final_ln": ln(c.dec_dim),
        "dec_layers": [],
    }
    for _ in range(c.num_gvp_layers):
        params["gvp_layers"].append(
            {
                # message GVP over [node_i ; node_j ; edge]
                "msg": gvp_init(
                    next(keys), 2 * c.node_s + edge_s, 2 * c.node_v + 1,
                    c.node_s, c.node_v,
                ),
                "upd": gvp_init(
                    next(keys), 2 * c.node_s, 2 * c.node_v, c.node_s, c.node_v
                ),
                "ln_s": ln(c.node_s),
            }
        )
    for _ in range(c.dec_layers):
        params["dec_layers"].append(
            {
                "ln1": ln(c.dec_dim),
                "self": {k: dense(c.dec_dim, c.dec_dim) for k in "qkvo"},
                "ln2": ln(c.dec_dim),
                "cross": {k: dense(c.dec_dim, c.dec_dim) for k in "qkvo"},
                "ln3": ln(c.dec_dim),
                "fc1": dense(c.dec_dim, 4 * c.dec_dim),
                "fc2": dense(4 * c.dec_dim, c.dec_dim),
            }
        )
    return params


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _dense(x, p):
    return x @ p["w"] + p["b"]


def encode_structure(params, c: EsmIf1Config, coords: np.ndarray
                     ) -> jnp.ndarray:
    """(L, 4, 3) backbone -> (L, dec_dim) rotation-invariant memory."""
    node_s, node_v = backbone_node_features(coords)
    e_idx = np.asarray(knn_graph(jnp.asarray(coords[:, 1]), c.k_neighbors))
    edge_s, edge_v = backbone_edge_features(coords, e_idx, c.num_rbf)

    s, v = gvp_apply(
        params["embed_node"], jnp.asarray(node_s), jnp.asarray(node_v)
    )
    edge_s = jnp.asarray(edge_s)
    edge_v = jnp.asarray(edge_v)
    e_idx_j = jnp.asarray(e_idx)

    for layer in params["gvp_layers"]:
        s_i = jnp.broadcast_to(s[:, None], (s.shape[0], e_idx.shape[1],
                                            s.shape[-1]))
        s_j = s[e_idx_j]
        v_i = jnp.broadcast_to(
            v[:, None], (v.shape[0], e_idx.shape[1]) + v.shape[1:]
        )
        v_j = v[e_idx_j]
        m_s, m_v = gvp_apply(
            layer["msg"],
            jnp.concatenate([s_i, s_j, edge_s], -1),
            jnp.concatenate([v_i, v_j, edge_v], -2),
        )
        agg_s = m_s.mean(1)
        agg_v = m_v.mean(1)
        u_s, u_v = gvp_apply(
            layer["upd"],
            jnp.concatenate([s, agg_s], -1),
            jnp.concatenate([v, agg_v], -2),
        )
        s = _ln(s + u_s, layer["ln_s"])
        v = v + u_v
    return _dense(s, params["enc_out"])  # (L, dec_dim)


def _mha(x_q, x_kv, p, heads, causal):
    tq, d = x_q.shape[-2], x_q.shape[-1]
    tk = x_kv.shape[-2]
    hd = d // heads

    def split(z, t):
        return z.reshape(z.shape[:-2] + (t, heads, hd)).swapaxes(-3, -2)

    q = split(_dense(x_q, p["q"]), tq)
    k = split(_dense(x_kv, p["k"]), tk)
    v = split(_dense(x_kv, p["v"]), tk)
    scores = jnp.einsum("...hqd,...hkd->...hqk", q, k) / np.sqrt(hd)
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool))
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, -1)
    ctx = jnp.einsum("...hqk,...hkd->...hqd", probs, v)
    ctx = ctx.swapaxes(-3, -2).reshape(x_q.shape[:-1] + (d,))
    return _dense(ctx, p["o"])


def decode(params, c: EsmIf1Config, memory: jnp.ndarray, tokens: jnp.ndarray
           ) -> jnp.ndarray:
    """memory: (L, D); tokens: (B, T) -> (B, T, V) log-probs."""
    x = params["tok_embed"][tokens]
    mem = jnp.broadcast_to(memory[None], (x.shape[0],) + memory.shape)
    for layer in params["dec_layers"]:
        x = x + _mha(_ln(x, layer["ln1"]), _ln(x, layer["ln1"]),
                     layer["self"], c.dec_heads, causal=True)
        x = x + _mha(_ln(x, layer["ln2"]), mem, layer["cross"],
                     c.dec_heads, causal=False)
        y = _ln(x, layer["ln3"])
        x = x + _dense(jax.nn.gelu(_dense(y, layer["fc1"])), layer["fc2"])
    x = _ln(x, params["final_ln"])
    return jax.nn.log_softmax(_dense(x, params["head"]), -1)


def score_sequences(
    params,
    c: EsmIf1Config,
    coords: np.ndarray,
    sequences: Sequence[str],
    batch_size: int = 16,
) -> np.ndarray:
    """AR log-lik of each sequence given the backbone
    (ref compute_fitness_esm_if1.py score_sequence role)."""
    memory = encode_structure(params, c, coords)
    rows = [tokenize(s) for s in sequences]
    T = max(len(r) for r in rows)

    @jax.jit
    def block(tok):
        logps = decode(params, c, memory, tok)
        targets = tok[:, 1:]
        ll = jnp.take_along_axis(logps[:, :-1], targets[..., None], -1)[..., 0]
        mask = (targets != PAD).astype(jnp.float32)
        return jnp.sum(ll * mask, 1)

    out = np.zeros(len(rows))
    for s in range(0, len(rows), batch_size):
        blk = rows[s : s + batch_size]
        tok = np.full((len(blk), T), PAD, np.int32)
        for bi, r in enumerate(blk):
            tok[bi, : len(r)] = r
        out[s : s + len(blk)] = np.asarray(block(jnp.asarray(tok)))
    return out
