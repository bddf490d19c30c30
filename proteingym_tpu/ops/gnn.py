"""Graph ops for structure models: k-NN graphs, segment message passing,
and an E(n)-equivariant GNN (EGNN) layer.

Replaces the reference's torch_geometric / torch-scatter CUDA kernels
(ref: protssn/src/module/egnn/egnn_pytorch.py, SURVEY.md §2.3) with dense
neighbor-gather message passing: on TPU a (L, K, D) gather + reduce lowers
to efficient XLA ops, and fixed K keeps shapes static for jit.

EGNN layer semantics (ref egnn_pytorch.py:148-330):
  m_ij   = phi_e([h_i, h_j, ||x_i - x_j||^2, e_ij])
  x_i'   = x_i + sum_j (x_i - x_j)/(||.||+1) * phi_x(m_ij)   [optional]
  h_i'   = h_i + phi_h([h_i, sum_j m_ij])
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def knn_graph(coords: jnp.ndarray, k: int) -> jnp.ndarray:
    """(L, 3) -> (L, K) neighbor indices by Euclidean distance (self excluded)."""
    L = coords.shape[0]
    d2 = jnp.sum((coords[:, None] - coords[None]) ** 2, -1)
    d2 = d2 + jnp.eye(L) * 1e9  # exclude self
    _, idx = jax.lax.top_k(-d2, min(k, L - 1))
    return idx


def segment_mean(messages: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    return messages.mean(axis=axis)


def segment_sum(messages: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    return messages.sum(axis=axis)


# ---------------------------------------------------------------------------
# EGNN
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EgnnConfig:
    node_dim: int
    hidden_dim: int = 64
    num_layers: int = 4
    k_neighbors: int = 16
    update_coords: bool = False
    out_dim: Optional[int] = None  # readout head size (e.g. 20 AAs)


def _mlp_params(key, dims):
    keys = jax.random.split(key, len(dims) - 1)
    return [
        {
            "w": jax.random.normal(k, (a, b), jnp.float32) * np.sqrt(2.0 / a),
            "b": jnp.zeros(b, jnp.float32),
        }
        for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:]))
    ]


def _mlp(x, layers, final_act=False):
    for i, p in enumerate(layers):
        x = x @ p["w"] + p["b"]
        if i + 1 < len(layers) or final_act:
            x = jax.nn.silu(x)
    return x


def egnn_init(rng: jax.Array, c: EgnnConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 * c.num_layers + 1))
    params: Dict[str, Any] = {"layers": []}
    d, h = c.node_dim, c.hidden_dim
    for _ in range(c.num_layers):
        layer = {
            "edge_mlp": _mlp_params(next(keys), [2 * d + 1, h, h]),
            "node_mlp": _mlp_params(next(keys), [d + h, h, d]),
        }
        if c.update_coords:
            layer["coors_mlp"] = _mlp_params(next(keys), [h, h, 1])
        else:
            next(keys)
        params["layers"].append(layer)
    if c.out_dim is not None:
        params["head"] = _mlp_params(next(keys), [d, h, c.out_dim])
    return params


def egnn_apply(
    params,
    c: EgnnConfig,
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    neighbors: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feats (L, D), coords (L, 3) -> (feats', coords')."""
    if neighbors is None:
        neighbors = knn_graph(coords, c.k_neighbors)
    h = feats
    x = coords
    for layer in params["layers"]:
        rel = x[:, None] - x[neighbors]  # (L, K, 3)
        d2 = jnp.sum(rel**2, -1, keepdims=True)
        h_j = h[neighbors]
        h_i = jnp.broadcast_to(h[:, None], h_j.shape)
        m = _mlp(jnp.concatenate([h_i, h_j, d2], -1), layer["edge_mlp"],
                 final_act=True)
        if c.update_coords:
            w = _mlp(m, layer["coors_mlp"])
            x = x + jnp.sum(rel / (jnp.sqrt(d2) + 1.0) * w, axis=-2)
        agg = segment_sum(m)
        h = h + _mlp(jnp.concatenate([h, agg], -1), layer["node_mlp"])
    return h, x


def egnn_readout(params, c: EgnnConfig, feats: jnp.ndarray) -> jnp.ndarray:
    return _mlp(feats, params["head"])
