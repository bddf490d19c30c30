"""ProSST structure-token quantizer: graph build + GVP encoder + k-means.

Weight-compatible JAX port of the reference's vendored structure pipeline
(ref: proteingym/baselines/prosst/prosst/structure/quantizer.py:43-270,
encoder/gvp.py:29-81 AutoGraphEncoder, encoder/layer.py GVP/GVPConvLayer):

  1. ``graph_features``: residue graph from backbone coordinates — edges
     where CA-CA distance < 10 A (quantizer.py:132-137), node vectors =
     [forward, backward CA orientations; sidechain bisector]
     (:59-73), edge scalars = [16 RBF(dist), 16 sinusoidal seq-offset]
     (:41-56, 76-88), edge vectors = unit CA->CA.
  2. ``subgraph_indices``: the per-anchor local subgraph — up to 50
     nearest residues under 10 A, truncated to 40 when more than 30
     (quantizer.py:172-198, including that quirk), node-sorted.
  3. ``encoder_apply``: AutoGraphEncoder.get_embedding — LayerNorm+GVP
     input projections, 4 GVPConvLayers (aggr=mean, 3-GVP message,
     2-GVP feedforward, activations=(relu, sigmoid), NO vector gating),
     LayerNorm+GVP scalar head.
  4. ``predict_tokens``: scatter_mean node embeddings per subgraph,
     L2-normalize, nearest k-means centroid (quantizer.py:333-360
     predict_sturcture) -> one structure token per residue.

TPU design: all per-anchor subgraphs are concatenated into ONE disjoint
union graph (node batch vector) and encoded in a single jitted forward —
the reference's DataLoader batching collapsed into one segment-sum
program. The trained AutoGraphEncoder weights and joblib K-means
centroids are external artifacts; ``convert_torch_state_dict`` ingests
the former, ``predict_tokens`` accepts any (K, ns) centroid matrix.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Graph featurization (quantizer.generate_graph)
# ---------------------------------------------------------------------------

def _unit(x, eps_mode="torch"):
    """torch _normalize semantics: nan_to_num(x / ||x||) — a zero vector
    maps to zeros (0/0 -> nan -> 0), not to x/eps."""
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = x / n
    return np.nan_to_num(out)


def _rbf(d: np.ndarray, d_min=0.0, d_max=20.0, d_count=16) -> np.ndarray:
    mu = np.linspace(d_min, d_max, d_count)
    sigma = (d_max - d_min) / d_count
    return np.exp(-(((d[..., None] - mu) / sigma) ** 2))


def _positional_embeddings(offsets: np.ndarray, num=16) -> np.ndarray:
    freq = np.exp(
        np.arange(0, num, 2, dtype=np.float32) * -(np.log(10000.0) / num)
    )
    angles = offsets[:, None] * freq
    return np.concatenate([np.cos(angles), np.sin(angles)], -1)


@dataclasses.dataclass
class ProsstGraph:
    node_s: np.ndarray     # (L, 20) zeros — label one-hots live downstream
    node_v: np.ndarray     # (L, 3, 3)
    edge_index: np.ndarray  # (2, E) [src, dst]
    edge_s: np.ndarray     # (E, 32)
    edge_v: np.ndarray     # (E, 1, 3)
    distances: np.ndarray  # (L, L)


def graph_features(coords: np.ndarray, max_distance: float = 10.0
                   ) -> ProsstGraph:
    """coords: (L, 4, 3) N/CA/C/O backbone -> residue graph
    (ref quantizer.py:92-168)."""
    coords = np.asarray(coords, np.float64)
    ca = coords[:, 1]
    L = ca.shape[0]

    d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    src, dst = np.where(d < max_distance)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edge_index = np.stack([src, dst])

    fwd = np.zeros((L, 3))
    bwd = np.zeros((L, 3))
    fwd[:-1] = _unit(ca[1:] - ca[:-1])
    bwd[1:] = _unit(ca[:-1] - ca[1:])
    n_at, origin, c_at = coords[:, 0], coords[:, 1], coords[:, 2]
    c_u, n_u = _unit(c_at - origin), _unit(n_at - origin)
    bisector = _unit(c_u + n_u)
    perp = _unit(np.cross(c_u, n_u))
    side = -bisector * math.sqrt(1 / 3) - perp * math.sqrt(2 / 3)
    node_v = np.stack([fwd, bwd, side], axis=1)

    pos_emb = _positional_embeddings((src - dst).astype(np.float32))
    e_vec = ca[src] - ca[dst]
    rbf = _rbf(np.linalg.norm(e_vec, axis=-1))
    edge_s = np.concatenate([rbf, pos_emb], -1)
    edge_v = _unit(e_vec)[:, None, :]

    return ProsstGraph(
        node_s=np.zeros((L, 20), np.float32),
        node_v=np.nan_to_num(node_v).astype(np.float32),
        edge_index=edge_index.astype(np.int64),
        edge_s=np.nan_to_num(edge_s).astype(np.float32),
        edge_v=np.nan_to_num(edge_v).astype(np.float32),
        distances=d,
    )


def subgraph_indices(distances: np.ndarray, anchor: int,
                     max_distance: float = 10.0) -> np.ndarray:
    """quick_get_anchor_graph node selection (ref quantizer.py:183-198):
    the 50 nearest residues, masked to < 10 A, truncated to the 40
    nearest when more than 30 survive, then index-sorted."""
    order = np.argsort(distances[anchor])[:50]
    mask = distances[anchor][order] < max_distance
    nearest = order[mask]
    if len(nearest) > 30:
        nearest = nearest[:40]
    return np.sort(nearest)


def build_subgraph(graph: ProsstGraph, anchor: int,
                   max_distance: float = 10.0):
    """Extract the anchor's local subgraph with re-indexed edges; edge
    features are looked up from the parent graph by (src, dst) pair
    (ref quantizer.py:195-219)."""
    nodes = subgraph_indices(graph.distances, anchor, max_distance)
    sub_d = graph.distances[np.ix_(nodes, nodes)]
    s_src, s_dst = np.where(sub_d < max_distance)
    keep = s_src != s_dst
    s_src, s_dst = s_src[keep], s_dst[keep]
    # map subgraph edges to parent edge feature rows
    parent_pair = {(int(a), int(b)): i
                   for i, (a, b) in enumerate(graph.edge_index.T)}
    feat_rows = np.asarray(
        [parent_pair[(int(nodes[a]), int(nodes[b]))]
         for a, b in zip(s_src, s_dst)],
        dtype=np.int64,
    )
    return {
        "nodes": nodes,
        "edge_index": np.stack([s_src, s_dst]).astype(np.int64),
        "edge_feat_rows": feat_rows,
    }


# ---------------------------------------------------------------------------
# AutoGraphEncoder (encoder/gvp.py) in JAX
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AutoGraphEncoderConfig:
    """Published quantizer dims (ref quantizer.py:523-531): node hidden
    (256, 32), edge hidden (64, 2), 6 layers."""

    node_in: Tuple[int, int] = (20, 3)
    node_h: Tuple[int, int] = (256, 32)
    edge_in: Tuple[int, int] = (32, 1)
    edge_h: Tuple[int, int] = (64, 2)
    num_layers: int = 6


def _gvp_apply(p, s, v, *, vo, scalar_act, vector_act):
    """Vendored GVP forward, vector_gate=False (ref layer.py:99-143):
    with a vector_act, output vectors scale by act(||v||)."""
    def lin(x, q):
        y = x @ q["w"]
        return y + q["b"] if "b" in q else y

    if v is not None and p.get("wh") is not None:
        vt = jnp.swapaxes(v, -1, -2)
        vh = lin(vt, p["wh"])
        vn = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(vh), axis=-2), 1e-8))
        s = lin(jnp.concatenate([s, vn], -1), p["ws"])
        out_v = None
        if vo:
            out_v = jnp.swapaxes(lin(vh, p["wv"]), -1, -2)
            if vector_act is not None:
                nrm = jnp.sqrt(jnp.maximum(
                    jnp.sum(jnp.square(out_v), axis=-1, keepdims=True),
                    1e-8))
                out_v = out_v * vector_act(nrm)
    else:
        s = lin(s, p["ws"])
        out_v = jnp.zeros(s.shape[:-1] + (vo, 3), s.dtype) if vo else None
    if scalar_act is not None:
        s = scalar_act(s)
    return s, out_v


def _layer_norm(p, s, v):
    """Vendored tuple LayerNorm (ref layer.py:189-211): affine scalar LN,
    vectors divided by RMS norm over channels."""
    mu = s.mean(-1, keepdims=True)
    var = s.var(-1, keepdims=True)
    s = (s - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]
    if v is None:
        return s, None
    vn = jnp.sum(jnp.square(v), axis=-1, keepdims=True)
    vn = jnp.maximum(vn, 1e-8)
    v = v / jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True))
    return s, v


_RELU = jax.nn.relu
_SIGMOID = jax.nn.sigmoid


def _conv_layer(layer, s, v, edge_s, edge_v, src, dst, num_nodes):
    """GVPConvLayer forward, aggr=mean, eval mode (ref layer.py:213-373).

    Message concat order is (j, edge, i) (ref layer.py:271-276); message
    GVPs run (relu, sigmoid) except the last (None, None); the 2-GVP
    feedforward uses hidden dims (4 ns, 2 nv)."""
    vo = v.shape[-2]
    ms = jnp.concatenate([s[src], edge_s, s[dst]], -1)
    mv = jnp.concatenate([v[src], edge_v, v[dst]], -2)
    n = len(layer["msg"])
    for i, p in enumerate(layer["msg"]):
        last = i == n - 1
        ms, mv = _gvp_apply(
            p, ms, mv, vo=vo,
            scalar_act=None if last else _RELU,
            vector_act=None if last else _SIGMOID,
        )
    w = jnp.ones(ms.shape[0], ms.dtype)
    den = jnp.maximum(
        jax.ops.segment_sum(w, dst, num_segments=num_nodes), 1.0
    )
    agg_s = jax.ops.segment_sum(ms, dst, num_segments=num_nodes) \
        / den[:, None]
    agg_v = jax.ops.segment_sum(mv, dst, num_segments=num_nodes) \
        / den[:, None, None]
    s, v = _layer_norm(layer["norm0"], s + agg_s, v + agg_v)
    fs, fv = s, v
    nf = len(layer["ff"])
    for i, p in enumerate(layer["ff"]):
        last = i == nf - 1
        fs, fv = _gvp_apply(
            p, fs, fv, vo=vo if last else 2 * vo,
            scalar_act=None if last else _RELU,
            vector_act=None if last else _SIGMOID,
        )
    return _layer_norm(layer["norm1"], s + fs, v + fv)


def encoder_apply(params, c: AutoGraphEncoderConfig, node_s, node_v,
                  edge_s, edge_v, src, dst) -> jnp.ndarray:
    """AutoGraphEncoder.get_embedding (ref encoder/gvp.py:74-81):
    (num_nodes, ns) scalar node embeddings."""
    num_nodes = node_s.shape[0]
    s, v = _layer_norm(params["wv_ln"], node_s, node_v)
    s, v = _gvp_apply(params["wv"], s, v, vo=c.node_h[1],
                      scalar_act=None, vector_act=None)
    es, ev = _layer_norm(params["we_ln"], edge_s, edge_v)
    es, ev = _gvp_apply(params["we"], es, ev, vo=c.edge_h[1],
                        scalar_act=None, vector_act=None)
    for layer in params["layers"]:
        s, v = _conv_layer(layer, s, v, es, ev, src, dst, num_nodes)
    s, v = _layer_norm(params["out_ln"], s, v)
    # W_out = GVP(node_h, (ns, 0)) with DEFAULT activations -> scalar relu
    # (ref encoder/gvp.py:48-50, layer.py:90 default (relu, sigmoid))
    s, _ = _gvp_apply(params["out"], s, v, vo=0,
                      scalar_act=_RELU, vector_act=None)
    return s


def init_params(rng: jax.Array, c: AutoGraphEncoderConfig) -> Dict:
    """Random params in the converted layout (testing / from-scratch)."""
    keys = iter(jax.random.split(rng, 200))

    def lin(a, b, bias=True):
        p = {"w": jax.random.normal(next(keys), (a, b), jnp.float32)
             / np.sqrt(a)}
        if bias:
            p["b"] = jnp.zeros(b, jnp.float32)
        return p

    def gvp(si, vi, so, vo):
        h = max(vi, vo) if vi else 0
        p = {}
        if vi:
            p["wh"] = lin(vi, h, bias=False)
            p["ws"] = lin(si + h, so)
            if vo:
                p["wv"] = lin(h, vo, bias=False)
        else:
            p["wh"] = None
            p["ws"] = lin(si, so)
        return p

    def ln(d):
        return {"g": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)}

    ns, nv = c.node_h
    es_d, ev_d = c.edge_h

    def conv_layer():
        msg_dims = [
            ((2 * ns + es_d, 2 * nv + ev_d), (ns, nv)),
            ((ns, nv), (ns, nv)),
            ((ns, nv), (ns, nv)),
        ]
        ff_dims = [((ns, nv), (4 * ns, 2 * nv)),
                   ((4 * ns, 2 * nv), (ns, nv))]
        return {
            "msg": [gvp(a[0], a[1], b[0], b[1]) for a, b in msg_dims],
            "ff": [gvp(a[0], a[1], b[0], b[1]) for a, b in ff_dims],
            "norm0": ln(ns),
            "norm1": ln(ns),
        }

    return {
        "wv_ln": ln(c.node_in[0]),
        "wv": gvp(c.node_in[0], c.node_in[1], ns, nv),
        "we_ln": ln(c.edge_in[0]),
        "we": gvp(c.edge_in[0], c.edge_in[1], es_d, ev_d),
        "layers": [conv_layer() for _ in range(c.num_layers)],
        "out_ln": ln(ns),
        "out": gvp(ns, nv, ns, 0),
    }


def config_from_state_dict(sd) -> AutoGraphEncoderConfig:
    """Infer encoder dims from a vendored AutoGraphEncoder state_dict
    (torch Linear weights are (out, in))."""
    def shape(k):
        v = sd[k]
        return tuple(v.shape)

    node_si = shape("W_v.0.scalar_norm.weight")[0]
    node_vi = shape("W_v.1.wh.weight")[1]
    ns = shape("W_v.1.ws.weight")[0]
    nv = shape("W_v.1.wv.weight")[0]
    edge_si = shape("W_e.0.scalar_norm.weight")[0]
    edge_vi = shape("W_e.1.wh.weight")[1]
    es = shape("W_e.1.ws.weight")[0]
    ev = shape("W_e.1.wv.weight")[0]
    n_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("layers.")
    )
    return AutoGraphEncoderConfig(
        node_in=(node_si, node_vi), node_h=(ns, nv),
        edge_in=(edge_si, edge_vi), edge_h=(es, ev),
        num_layers=n_layers,
    )


def convert_torch_state_dict(sd, c: AutoGraphEncoderConfig) -> Dict:
    """Vendored AutoGraphEncoder state_dict -> params pytree
    (ref encoder/gvp.py:29-57 module layout)."""

    def arr(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    def lin(prefix, bias=True):
        p = {"w": arr(f"{prefix}.weight").T}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = arr(f"{prefix}.bias")
        return p

    def gvp(prefix, has_v_in=True, has_v_out=True):
        p = {"ws": lin(f"{prefix}.ws")}
        if has_v_in and f"{prefix}.wh.weight" in sd:
            p["wh"] = lin(f"{prefix}.wh", bias=False)
            if has_v_out and f"{prefix}.wv.weight" in sd:
                p["wv"] = lin(f"{prefix}.wv", bias=False)
        else:
            p["wh"] = None
        return p

    def ln(prefix):
        return {"g": arr(f"{prefix}.weight"), "b": arr(f"{prefix}.bias")}

    layers = []
    for i in range(c.num_layers):
        p = f"layers.{i}"
        layers.append({
            "msg": [gvp(f"{p}.conv.message_func.{j}") for j in range(3)],
            "ff": [gvp(f"{p}.ff_func.{j}") for j in range(2)],
            "norm0": ln(f"{p}.norm.0.scalar_norm"),
            "norm1": ln(f"{p}.norm.1.scalar_norm"),
        })
    return {
        "wv_ln": ln("W_v.0.scalar_norm"),
        "wv": gvp("W_v.1"),
        "we_ln": ln("W_e.0.scalar_norm"),
        "we": gvp("W_e.1"),
        "layers": layers,
        "out_ln": ln("W_out.0.scalar_norm"),
        "out": gvp("W_out.1", has_v_out=False),
    }


# ---------------------------------------------------------------------------
# Token prediction (predict_sturcture)
# ---------------------------------------------------------------------------

def predict_tokens(
    params,
    c: AutoGraphEncoderConfig,
    graph: ProsstGraph,
    centroids: np.ndarray,
    subgraph_interval: int = 1,
) -> np.ndarray:
    """One structure token per anchor residue (ref quantizer.py:333-360):
    encode every anchor's subgraph, mean-pool node embeddings, L2
    normalize, assign the nearest k-means centroid.

    All subgraphs run as ONE disjoint union graph in a single jitted
    program (segment-sum aggregation), instead of the reference's
    DataLoader loop."""
    L = graph.node_s.shape[0]
    anchors = list(range(0, L, subgraph_interval))
    node_s_l, node_v_l, edge_s_l, edge_v_l = [], [], [], []
    src_l, dst_l, batch_l = [], [], []
    offset = 0
    for b, anchor in enumerate(anchors):
        sub = build_subgraph(graph, anchor)
        nodes = sub["nodes"]
        node_s_l.append(graph.node_s[nodes])
        node_v_l.append(graph.node_v[nodes])
        edge_s_l.append(graph.edge_s[sub["edge_feat_rows"]])
        edge_v_l.append(graph.edge_v[sub["edge_feat_rows"]])
        src_l.append(sub["edge_index"][0] + offset)
        dst_l.append(sub["edge_index"][1] + offset)
        batch_l.append(np.full(len(nodes), b, np.int32))
        offset += len(nodes)

    node_s = jnp.asarray(np.concatenate(node_s_l))
    node_v = jnp.asarray(np.concatenate(node_v_l))
    edge_s = jnp.asarray(np.concatenate(edge_s_l))
    edge_v = jnp.asarray(np.concatenate(edge_v_l))
    src = jnp.asarray(np.concatenate(src_l))
    dst = jnp.asarray(np.concatenate(dst_l))
    batch = jnp.asarray(np.concatenate(batch_l))

    emb = encoder_apply(params, c, node_s, node_v, edge_s, edge_v, src, dst)
    counts = jax.ops.segment_sum(
        jnp.ones(emb.shape[0]), batch, num_segments=len(anchors))
    pooled = jax.ops.segment_sum(emb, batch, num_segments=len(anchors)) \
        / jnp.maximum(counts, 1.0)[:, None]
    norm = pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    cents = jnp.asarray(centroids, jnp.float32)
    d2 = (jnp.sum(norm ** 2, -1, keepdims=True)
          - 2.0 * norm @ cents.T + jnp.sum(cents ** 2, -1))
    return np.asarray(jnp.argmin(d2, axis=-1))


def structure_tokens_from_coords(
    coords: np.ndarray,
    params,
    c: AutoGraphEncoderConfig,
    centroids: np.ndarray,
    max_distance: float = 10.0,
) -> np.ndarray:
    """coords (L, 4, 3) -> (L,) structure token ids — the full vendored
    pipeline (graph -> subgraphs -> GVP encoder -> k-means)."""
    graph = graph_features(coords, max_distance=max_distance)
    return predict_tokens(params, c, graph, centroids)
