"""Weight-compatible ESM-IF1 (GVP-Transformer) inverse folding in JAX.

Reimplements the reference's vendored architecture exactly so published
``esm_if1_gvp4_t16_142M_UR50`` checkpoints convert losslessly:

- feature pipeline: dihedrals / orientations / sidechains, kNN graph with
  coord-mask-aware distance sorting, RBF + positional edge features
  (ref: esm/esm/inverse_folding/features.py:77-352)
- GVP graph embedding + GVPConvLayer stack with vector gating
  (ref: esm/esm/inverse_folding/gvp_modules.py:113-475, gvp_encoder.py:18-56)
- transformer encoder over the summed geometric embeddings
  (ref: esm/esm/inverse_folding/gvp_transformer_encoder.py:23-184)
- autoregressive transformer decoder with cross-attention
  (ref: esm/esm/inverse_folding/transformer_decoder.py:24-228)
- scoring contract: mean per-token log-likelihood of the mutated sequence
  given the backbone (ref: esm/compute_fitness_esm_if1.py:19-39)

TPU-first deviations: the graph is kept dense/static-shape (L*k edges with
a validity mask + segment mean instead of pytorch-geometric's dynamic edge
lists), layers run under ``lax.scan`` over stacked parameters, and scoring
runs the structure encoder ONCE and teacher-forces the decoder over large
mutant batches (the reference decodes batch-size 1 per sequence).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# invariant_gvp alphabet (ref esm/esm/data.py:165-171): prepend specials,
# the 25+2 standard tokens, append specials.
PROTEIN_TOKS = list("LAGVSERTIDPKQNFYMHWCXBUZO") + [".", "-"]
IF1_TOKENS = (
    ["<null_0>", "<pad>", "<eos>", "<unk>"]
    + PROTEIN_TOKS
    + ["<null_1>"]  # pad to a multiple of 8 (ref esm/data.py:109-111)
    + ["<mask>", "<cath>", "<af2>"]
)
IF1_IDX = {t: i for i, t in enumerate(IF1_TOKENS)}
PAD_IDX = 1
EOS_IDX = 2
UNK_IDX = 3
MASK_IDX = IF1_IDX["<mask>"]
CATH_IDX = IF1_IDX["<cath>"]
VOCAB = len(IF1_TOKENS)  # 34


def tokenize(seq: str) -> np.ndarray:
    """[<cath>] + residues (prepend_bos=True, append_eos=False)."""
    return np.asarray(
        [CATH_IDX] + [IF1_IDX.get(c, UNK_IDX) for c in seq], np.int32
    )


@dataclasses.dataclass(frozen=True)
class GVPTransformerConfig:
    name: str = "esm_if1"
    encoder_embed_dim: int = 512
    decoder_embed_dim: int = 512
    encoder_layers: int = 8
    decoder_layers: int = 8
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_embed_dim: int = 2048
    decoder_ffn_embed_dim: int = 2048
    gvp_top_k_neighbors: int = 30
    gvp_node_hidden_dim_scalar: int = 1024
    gvp_node_hidden_dim_vector: int = 256
    gvp_edge_hidden_dim_scalar: int = 32
    gvp_edge_hidden_dim_vector: int = 1
    gvp_num_encoder_layers: int = 4


def _preset(**kw) -> "GVPTransformerConfig":
    return GVPTransformerConfig(**kw)


PRESETS = {
    # the published esm_if1_gvp4_t16_142M_UR50 layout
    "esm_if1": _preset(name="esm_if1"),
    # small config for tests/smoke runs
    "esm_if1_tiny": _preset(
        name="esm_if1_tiny", encoder_embed_dim=64, decoder_embed_dim=64,
        encoder_layers=2, decoder_layers=2, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_embed_dim=128,
        decoder_ffn_embed_dim=128, gvp_top_k_neighbors=8,
        gvp_node_hidden_dim_scalar=32, gvp_node_hidden_dim_vector=8,
        gvp_edge_hidden_dim_scalar=16, gvp_num_encoder_layers=2,
    ),
}


# ---------------------------------------------------------------------------
# numerics shared with the reference (util.py:146-217, gvp_modules.py:79-111)

def _nan_to_num(x, val=0.0):
    return jnp.where(jnp.isfinite(x), x, val)


def _norm(x, axis=-1, keepdims=False, eps=1e-8):
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims) + eps)


def _normalize(x, axis=-1):
    return _nan_to_num(x / _norm(x, axis=axis, keepdims=True))


def _norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    out = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims) + eps
    return jnp.sqrt(out) if sqrt else out


def rbf(values, v_min, v_max, n_bins=16):
    centers = jnp.linspace(v_min, v_max, n_bins)
    std = (v_max - v_min) / n_bins
    z = (values[..., None] - centers) / std
    return jnp.exp(-z * z)


def rotate(v, R):
    """out = v @ R on the trailing 3-dims (ref util.py:146-159)."""
    return jnp.einsum("...ci,...ij->...cj", v, R)


def get_rotation_frames(coords):
    v1 = coords[:, :, 2] - coords[:, :, 1]
    v2 = coords[:, :, 0] - coords[:, :, 1]
    e1 = _normalize(v1)
    u2 = v2 - e1 * jnp.sum(e1 * v2, -1, keepdims=True)
    e2 = _normalize(u2)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-2)


# ---------------------------------------------------------------------------
# input featurization (features.py:77-185)

def _dihedrals(coords, eps=1e-7):
    """(B, L, 3, 3) -> (B, L, 6) cos/sin of phi/psi/omega."""
    B, L = coords.shape[0], coords.shape[1]
    X = coords[:, :, :3].reshape(B, 3 * L, 3)
    dX = X[:, 1:] - X[:, :-1]
    U = _normalize(dX)
    u_2, u_1, u_0 = U[:, :-2], U[:, 1:-1], U[:, 2:]
    n_2 = _normalize(jnp.cross(u_2, u_1))
    n_1 = _normalize(jnp.cross(u_1, u_0))
    cosD = jnp.clip(jnp.sum(n_2 * n_1, -1), -1 + eps, 1 - eps)
    D = jnp.sign(jnp.sum(u_2 * n_1, -1)) * jnp.arccos(cosD)
    D = jnp.pad(D, ((0, 0), (1, 2)))
    D = D.reshape(B, L, 3)
    return jnp.concatenate([jnp.cos(D), jnp.sin(D)], -1)


def _orientations(X_ca):
    forward = _normalize(X_ca[:, 1:] - X_ca[:, :-1])
    backward = _normalize(X_ca[:, :-1] - X_ca[:, 1:])
    forward = jnp.pad(forward, ((0, 0), (0, 1), (0, 0)))
    backward = jnp.pad(backward, ((0, 0), (1, 0), (0, 0)))
    return jnp.concatenate(
        [forward[:, :, None], backward[:, :, None]], axis=-2
    )


def _sidechains(coords):
    n, origin, c = coords[:, :, 0], coords[:, :, 1], coords[:, :, 2]
    c, n = _normalize(c - origin), _normalize(n - origin)
    bisector = _normalize(c + n)
    perp = _normalize(jnp.cross(c, n))
    return -bisector * np.sqrt(1 / 3) - perp * np.sqrt(2 / 3)


def get_node_features(coords, coord_mask, with_coord_mask=True):
    scalars = _dihedrals(coords)
    if with_coord_mask:
        scalars = jnp.concatenate(
            [scalars, coord_mask.astype(scalars.dtype)[..., None]], -1
        )
    X_ca = coords[:, :, 1]
    vectors = jnp.concatenate(
        [_orientations(X_ca), _sidechains(coords)[:, :, None]], axis=-2
    )
    return scalars, vectors


def _dist(X_ca, coord_mask, padding_mask, top_k):
    """kNN with the reference's missing-coord sort preference
    (features.py:156-185)."""
    B, L = X_ca.shape[0], X_ca.shape[1]
    cm2 = coord_mask[:, :, None] & coord_mask[:, None, :]
    residue_mask = ~padding_mask
    rm2 = residue_mask[:, :, None] & residue_mask[:, None, :]
    dX = X_ca[:, :, None] - X_ca[:, None, :]
    D = cm2 * _norm(dX, axis=-1)
    seqpos = jnp.arange(L)
    Dseq = jnp.abs(seqpos[:, None] - seqpos[None, :]).astype(D.dtype)
    D_adjust = (
        _nan_to_num(D)
        + (~cm2) * (1e8 + Dseq * 1e6)
        + (~rm2) * 1e10
    )
    k = min(top_k, L)
    neg, E_idx = jax.lax.top_k(-D_adjust, k)
    D_neighbors = -neg
    return D_neighbors, E_idx, (D_neighbors < 5e7), (D_neighbors < 5e9)


def _edge_positional_embeddings(d, num_embeddings=16):
    frequency = jnp.exp(
        jnp.arange(0, num_embeddings, 2, dtype=jnp.float32)
        * -(np.log(10000.0) / num_embeddings)
    )
    angles = d[..., None] * frequency
    return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], -1)


def get_edge_features(coords, coord_mask, padding_mask, top_k):
    """Returns (edge_s, edge_v), (src, dst), edge_valid — dense (B, L*k, ...)
    (features.py:300-352; -1 edges become a validity mask)."""
    X_ca = coords[:, :, 1]
    E_dist, E_idx, E_coord_mask, E_residue_mask = _dist(
        X_ca, coord_mask, padding_mask, top_k
    )
    B, L, k = E_idx.shape
    src = jnp.broadcast_to(jnp.arange(L)[None, :, None], (B, L, k))
    src = src.reshape(B, L * k)
    dst = E_idx.reshape(B, L * k)
    E_dist = E_dist.reshape(B, L * k)
    E_cm = E_coord_mask.reshape(B, L * k)
    E_rm = E_residue_mask.reshape(B, L * k)

    pos_emb = _edge_positional_embeddings((src - dst).astype(jnp.float32))
    D_rbf = rbf(E_dist, 0.0, 20.0)

    X_src = jnp.take_along_axis(X_ca, src[..., None], axis=1)
    X_dst = jnp.take_along_axis(X_ca, dst[..., None], axis=1)
    cm_src = jnp.take_along_axis(coord_mask, src, axis=1)
    cm_dst = jnp.take_along_axis(coord_mask, dst, axis=1)
    E_vectors = X_src - X_dst
    e_cm = E_cm[..., None].astype(E_vectors.dtype)
    E_vector_mean = jnp.sum(E_vectors * e_cm, axis=1, keepdims=True) / (
        jnp.sum(e_cm, axis=1, keepdims=True)
    )
    E_vectors = E_vectors * e_cm + E_vector_mean * (1.0 - e_cm)

    edge_s = jnp.concatenate([D_rbf, pos_emb], -1)
    edge_v = _nan_to_num(_normalize(E_vectors))[:, :, None, :]
    edge_s = _nan_to_num(edge_s)
    edge_s = jnp.concatenate(
        [
            edge_s,
            (~cm_src).astype(edge_s.dtype)[..., None],
            (~cm_dst).astype(edge_s.dtype)[..., None],
        ],
        -1,
    )
    # remove_edges_without_coords=True: edges without coords AND edges
    # touching padding are invalid (features.py:349-351)
    edge_valid = E_rm & E_cm
    return (edge_s, edge_v), (src, dst), edge_valid


# ---------------------------------------------------------------------------
# GVP primitives (gvp_modules.py:113-265)

def _gvp_init(rng, si, vi, so, vo, vector_gate, h_dim=None):
    h = h_dim or max(vi, vo)
    ks = jax.random.split(rng, 4)

    def lin(key, n_in, n_out, bias):
        p = {"w": jax.random.normal(key, (n_in, n_out)) * np.sqrt(1.0 / n_in)}
        if bias:
            p["b"] = jnp.zeros(n_out)
        return p

    p: Dict[str, Any] = {}
    if vi:
        p["wh"] = lin(ks[0], vi, h, False)
        p["ws"] = lin(ks[1], h + si, so, True)
        if vo:
            p["wv"] = lin(ks[2], h, vo, False)
            if vector_gate:
                p["wg"] = lin(ks[3], so, vo, True)
    else:
        p["ws"] = lin(ks[1], si, so, True)
    return p


def _lin(x, p):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def gvp_apply(p, s, v, *, vo, scalar_act, vector_act, vector_gate,
              eps=1e-8):
    """One GVP. v: (..., vi, 3) or None. Returns (s', v'|None)."""
    if v is not None:
        vt = jnp.swapaxes(v, -1, -2)            # (..., 3, vi)
        vh = _lin(vt, p["wh"])                  # (..., 3, h)
        vn = _norm_no_nan(vh, axis=-2, eps=eps)  # (..., h)
        s = _lin(jnp.concatenate([s, vn], -1), p["ws"])
        if scalar_act:
            s = jax.nn.relu(s)
        if vo:
            out_v = jnp.swapaxes(_lin(vh, p["wv"]), -1, -2)  # (..., vo, 3)
            if vector_gate:
                g = _lin(s, p["wg"])[..., None]
            else:
                g = _norm_no_nan(out_v, axis=-1, keepdims=True, eps=eps)
            if vector_act:
                out_v = out_v * jax.nn.sigmoid(g)
            return s, out_v
        return s, None
    s = _lin(s, p["ws"])
    if scalar_act:
        s = jax.nn.relu(s)
    if vo:
        return s, jnp.zeros(s.shape[:-1] + (vo, 3), s.dtype)
    return s, None


def _gvp_layer_norm(p, s, v, eps):
    """Tuple LayerNorm (gvp_modules.py:236-265); scalar LN eps is torch's
    default 1e-5, the GVP eps only shapes the vector norm."""
    mu = s.mean(-1, keepdims=True)
    var = s.var(-1, keepdims=True)
    s = (s - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]
    if v is None:
        return s, None
    vn = _norm_no_nan(v, axis=-1, keepdims=True, sqrt=False, eps=eps)
    nonzero = (vn > 2 * eps).astype(v.dtype)
    vn = jnp.sum(vn * nonzero, axis=-2, keepdims=True) / (
        eps + jnp.sum(nonzero, axis=-2, keepdims=True)
    )
    vn = jnp.sqrt(vn + eps)
    return s, nonzero * (v / vn)


# message func / feedforward specs: (vector_gate, scalar_act, vector_act)
def _msg_specs(n_layers):
    specs = [dict(scalar_act=True, vector_act=True, vector_gate=True)]
    for _ in range(n_layers - 2):
        specs.append(dict(scalar_act=True, vector_act=True, vector_gate=True))
    specs.append(dict(scalar_act=False, vector_act=False, vector_gate=False))
    return specs


def _seg_mean(msgs, dst, valid, num_segments):
    """scatter-mean of per-edge messages at dst (torch_geometric aggr="mean"
    over the surviving edge list)."""
    w = valid.astype(msgs.dtype)
    shaped = w.reshape(w.shape + (1,) * (msgs.ndim - w.ndim))
    total = jax.ops.segment_sum(msgs * shaped, dst, num_segments=num_segments)
    count = jax.ops.segment_sum(w, dst, num_segments=num_segments)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (msgs.ndim - w.ndim))


def gvp_conv_layer_apply(layer, s, v, edge_s, edge_v, src, dst, edge_valid,
                         eps=1e-4):
    """GVPConvLayer (gvp_modules.py:331-475): message GVPs -> mean agg ->
    residual+LN -> GVP feedforward -> residual+LN. Single flattened graph."""
    L = s.shape[0]
    vo = v.shape[-2]
    s_src, v_src = s[src], v[src]
    s_dst, v_dst = s[dst], v[dst]
    ms = jnp.concatenate([s_src, edge_s, s_dst], -1)
    mv = jnp.concatenate([v_src, edge_v, v_dst], -2)
    for p, spec in zip(layer["msg"], _msg_specs(len(layer["msg"]))):
        ms, mv = gvp_apply(p, ms, mv, vo=vo, **spec)
    dh_s = _seg_mean(ms, dst, edge_valid, L)
    dh_v = _seg_mean(mv, dst, edge_valid, L)
    s, v = _gvp_layer_norm(layer["norm0"], s + dh_s, v + dh_v, eps)

    fs, fv = s, v
    n_ff = len(layer["ff"])
    hid_vo = 2 * vo
    for i, p in enumerate(layer["ff"]):
        last = i == n_ff - 1
        fs, fv = gvp_apply(
            p, fs, fv, vo=vo if last else hid_vo,
            scalar_act=not last, vector_act=not last, vector_gate=not last,
        )
    s, v = _gvp_layer_norm(layer["norm1"], s + fs, v + fv, eps)
    return s, v


# ---------------------------------------------------------------------------
# parameter init

def init_params(rng: jax.Array, c: GVPTransformerConfig) -> Dict[str, Any]:
    ns, nv = c.gvp_node_hidden_dim_scalar, c.gvp_node_hidden_dim_vector
    es, ev = c.gvp_edge_hidden_dim_scalar, c.gvp_edge_hidden_dim_vector
    D, Dd = c.encoder_embed_dim, c.decoder_embed_dim
    keys = iter(jax.random.split(rng, 64 + 8 * (
        c.gvp_num_encoder_layers + c.encoder_layers + c.decoder_layers)))

    def dense(n_in, n_out, bias=True):
        p = {"w": jax.random.normal(next(keys), (n_in, n_out))
             * np.sqrt(1.0 / n_in)}
        if bias:
            p["b"] = jnp.zeros(n_out)
        return p

    def ln(d):
        return {"g": jnp.ones(d), "b": jnp.zeros(d)}

    def attn(q_dim, kv_dim, d):
        return {
            "q": dense(q_dim, d), "k": dense(kv_dim, d),
            "v": dense(kv_dim, d), "o": dense(d, d),
        }

    def gvp(si, vi, so, vo, vector_gate):
        return _gvp_init(next(keys), si, vi, so, vo, vector_gate)

    def conv_layer():
        return {
            "msg": [
                gvp(2 * ns + es, 2 * nv + ev, ns, nv, True),
                gvp(ns, nv, ns, nv, True),
                gvp(ns, nv, ns, nv, False),
            ],
            "norm0": ln(ns),
            "norm1": ln(ns),
            "ff": [
                gvp(ns, nv, 4 * ns, 2 * nv, True),
                gvp(4 * ns, 2 * nv, ns, nv, False),
            ],
        }

    params: Dict[str, Any] = {
        "enc_embed_tokens": jax.random.normal(next(keys), (VOCAB, D))
        * D ** -0.5,
        "dec_embed_tokens": jax.random.normal(next(keys), (VOCAB, Dd))
        * Dd ** -0.5,
        "embed_gvp_input_features": dense(15, D),
        "embed_confidence": dense(16, D),
        "embed_dihedrals": {"lin": dense(6, D), "norm": ln(D)},
        "embed_gvp_output": dense(ns + 3 * nv, D),
        "graph": {
            "embed_node": {"gvp": gvp(7, 3, ns, nv, False), "norm": ln(ns)},
            "embed_edge": {"gvp": gvp(34, 1, es, ev, False), "norm": ln(es)},
            "embed_confidence": dense(16, ns),
        },
        "gvp_layers": [conv_layer() for _ in range(c.gvp_num_encoder_layers)],
        "enc_layers": [
            {
                "attn_ln": ln(D),
                "attn": attn(D, D, D),
                "final_ln": ln(D),
                "fc1": dense(D, c.encoder_ffn_embed_dim),
                "fc2": dense(c.encoder_ffn_embed_dim, D),
            }
            for _ in range(c.encoder_layers)
        ],
        "enc_norm": ln(D),
        "dec_layers": [
            {
                "self_ln": ln(Dd),
                "self": attn(Dd, Dd, Dd),
                "cross_ln": ln(Dd),
                "cross": attn(Dd, D, Dd),
                "final_ln": ln(Dd),
                "fc1": dense(Dd, c.decoder_ffn_embed_dim),
                "fc2": dense(c.decoder_ffn_embed_dim, Dd),
            }
            for _ in range(c.decoder_layers)
        ],
        "dec_norm": ln(Dd),
        "out_proj": dense(Dd, VOCAB, bias=False),
    }
    return params


# ---------------------------------------------------------------------------
# transformer pieces

def _ln_apply(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _mha(p, x_q, x_kv, heads, key_mask=None, causal=False):
    """fairseq MultiheadAttention (q scaled by head_dim**-0.5)."""
    B, Tq, Dq = x_q.shape
    Tk = x_kv.shape[1]
    D = p["q"]["w"].shape[1]
    hd = D // heads
    q = _lin(x_q, p["q"]) * hd ** -0.5
    k = _lin(x_kv, p["k"])
    v = _lin(x_kv, p["v"])

    def split(z, t):
        return z.reshape(B, t, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q, Tq), split(k, Tk), split(v, Tk)
    if Tq == Tk:
        # self-attention: shared dispatcher (grouped Pallas kernel on
        # TPU). q arrives pre-scaled, so sm_scale=1. fairseq's NaN->0
        # for fully-masked rows differs from the kernel's finite-fill
        # uniform average only at PADDING query rows, whose outputs are
        # positionwise and never consumed.
        from proteingym_tpu.ops.flash_attention import mha

        km = None if key_mask is None else ~key_mask
        ctx = mha(q, k, v, key_mask=km, causal=causal, sm_scale=1.0)
    else:
        # encoder-decoder cross attention (Tq != Tk): XLA path
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if causal:
            cm = jnp.tril(jnp.ones((Tq, Tk), bool))
            scores = jnp.where(cm, scores, -jnp.inf)
        if key_mask is not None:  # True = padded
            scores = jnp.where(key_mask[:, None, None, :], -jnp.inf, scores)
        probs = jax.nn.softmax(scores, -1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return _lin(ctx, p["o"])


def _sinusoidal_positions(tokens, dim, padding_idx=PAD_IDX):
    """fairseq SinusoidalPositionalEmbedding (esm/modules.py:274-309)."""
    B, T = tokens.shape
    mask = tokens != padding_idx
    positions = jnp.where(
        mask, jnp.arange(T)[None, :] + padding_idx + 1, padding_idx
    )
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = positions[..., None].astype(jnp.float32) * freqs
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 1)))
    return jnp.where(mask[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# encoder / decoder

def gvp_encoder_apply(params, c, coords, coord_mask, padding_mask,
                      confidence):
    """GVPEncoder (gvp_encoder.py:18-56) on a flattened batch graph."""
    g = params["graph"]
    node_s, node_v = get_node_features(coords, coord_mask,
                                       with_coord_mask=True)
    (edge_s, edge_v), (src, dst), edge_valid = get_edge_features(
        coords, coord_mask, padding_mask, c.gvp_top_k_neighbors
    )
    s, v = gvp_apply(
        g["embed_node"]["gvp"], node_s, node_v,
        vo=c.gvp_node_hidden_dim_vector,
        scalar_act=False, vector_act=False, vector_gate=False,
    )
    s, v = _gvp_layer_norm(g["embed_node"]["norm"], s, v, 1e-4)
    es_, ev_ = gvp_apply(
        g["embed_edge"]["gvp"], edge_s, edge_v,
        vo=c.gvp_edge_hidden_dim_vector,
        scalar_act=False, vector_act=False, vector_gate=False,
    )
    es_, ev_ = _gvp_layer_norm(g["embed_edge"]["norm"], es_, ev_, 1e-4)
    s = s + _lin(rbf(confidence, 0.0, 1.0), g["embed_confidence"])

    # flatten batch -> single graph with offset indices
    B, L = s.shape[0], s.shape[1]
    offset = (jnp.arange(B) * L)[:, None]
    fsrc = (src + offset).reshape(-1)
    fdst = (dst + offset).reshape(-1)
    fvalid = edge_valid.reshape(-1)
    fs = s.reshape(B * L, -1)
    fv = v.reshape(B * L, v.shape[-2], 3)
    fes = es_.reshape(-1, es_.shape[-1])
    fev = ev_.reshape(-1, ev_.shape[-2], 3)

    for layer in params["gvp_layers"]:
        fs, fv = gvp_conv_layer_apply(
            layer, fs, fv, fes, fev, fsrc, fdst, fvalid
        )
    return fs.reshape(B, L, -1), fv.reshape(B, L, -1, 3)


def encoder_apply(params, c, coords, padding_mask, confidence):
    """GVPTransformerEncoder (gvp_transformer_encoder.py:73-184)."""
    coord_mask = jnp.all(jnp.all(jnp.isfinite(coords), -1), -1)
    coords = _nan_to_num(coords)
    mask_tokens = jnp.where(padding_mask, PAD_IDX, MASK_IDX).astype(jnp.int32)
    D = c.encoder_embed_dim

    comp_tokens = params["enc_embed_tokens"][mask_tokens] * np.sqrt(D)

    dih = _dihedrals(coords)
    dd = _lin(dih, params["embed_dihedrals"]["lin"])
    # Normalize module (features.py:188-206): unbiased variance, eps both
    # inside the sqrt's argument-free and added to sigma
    mu = dd.mean(-1, keepdims=True)
    n = dd.shape[-1]
    var = dd.var(-1, keepdims=True) * n / (n - 1)
    sigma = jnp.sqrt(var + 1e-6)
    pn = params["embed_dihedrals"]["norm"]
    comp_dih = pn["g"] * (dd - mu) / (sigma + 1e-6) + pn["b"]

    gvp_s, gvp_v = gvp_encoder_apply(
        params, c, coords, coord_mask, padding_mask, confidence
    )
    R = get_rotation_frames(coords)
    Rt = jnp.swapaxes(R, -2, -1)
    gvp_feats = jnp.concatenate(
        [gvp_s, rotate(gvp_v, Rt).reshape(gvp_v.shape[:2] + (-1,))], -1
    )
    comp_gvp = _lin(gvp_feats, params["embed_gvp_output"])

    comp_conf = _lin(rbf(confidence, 0.0, 1.0), params["embed_confidence"])

    in_s, in_v = get_node_features(coords, coord_mask, with_coord_mask=False)
    in_feats = jnp.concatenate(
        [in_s, rotate(in_v, Rt).reshape(in_v.shape[:2] + (-1,))], -1
    )
    comp_in = _lin(in_feats, params["embed_gvp_input_features"])

    x = comp_tokens + comp_dih + comp_gvp + comp_conf + comp_in
    x = x + _sinusoidal_positions(mask_tokens, D)
    x = x * (1 - padding_mask[..., None].astype(x.dtype))

    for layer in params["enc_layers"]:
        h = _ln_apply(x, layer["attn_ln"])
        x = x + _mha(layer["attn"], h, h, c.encoder_attention_heads,
                     key_mask=padding_mask)
        h = _ln_apply(x, layer["final_ln"])
        h = _lin(jax.nn.relu(_lin(h, layer["fc1"])), layer["fc2"])
        x = x + h
    return _ln_apply(x, params["enc_norm"])


def decoder_apply(params, c, prev_tokens, enc_out, enc_padding_mask):
    """TransformerDecoder (transformer_decoder.py:92-228) -> (B, T, V)."""
    Dd = c.decoder_embed_dim
    x = params["dec_embed_tokens"][prev_tokens] * np.sqrt(Dd)
    x = x + _sinusoidal_positions(prev_tokens, Dd)
    self_mask = prev_tokens == PAD_IDX
    for layer in params["dec_layers"]:
        h = _ln_apply(x, layer["self_ln"])
        x = x + _mha(layer["self"], h, h, c.decoder_attention_heads,
                     key_mask=self_mask, causal=True)
        h = _ln_apply(x, layer["cross_ln"])
        x = x + _mha(layer["cross"], h, enc_out, c.decoder_attention_heads,
                     key_mask=enc_padding_mask)
        h = _ln_apply(x, layer["final_ln"])
        x = x + _lin(jax.nn.relu(_lin(h, layer["fc1"])), layer["fc2"])
    x = _ln_apply(x, params["dec_norm"])
    return _lin(x, params["out_proj"])


def forward(params, c, coords, padding_mask, confidence, prev_tokens):
    """Full model -> (B, T, V) logits (reference returns (B, V, T))."""
    enc = encoder_apply(params, c, coords, padding_mask, confidence)
    return decoder_apply(params, c, prev_tokens, enc, padding_mask)


# ---------------------------------------------------------------------------
# batching + scoring (CoordBatchConverter semantics, util.py:220-267)

def prepare_structure(coords: np.ndarray,
                      confidence: Optional[np.ndarray] = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(L, 3, 3) -> inf-flanked coords (L+2, 3, 3), confidence, padding,
    with CoordBatchConverter's exact semantics (util.py:249-266):
    flank slots carry inf coords, confidence 0, and are NOT padding."""
    L = len(coords)
    out = np.full((L + 2, 3, 3), np.inf, np.float32)
    out[1:-1] = coords
    conf = np.full(L + 2, -1.0, np.float32)
    conf[1:-1] = 1.0 if confidence is None else confidence
    padding = np.isnan(out[:, 0, 0])
    coord_mask = np.isfinite(out.sum((-1, -2)))
    conf = conf * coord_mask + (-1.0) * padding
    return out, conf, padding


@functools.lru_cache(maxsize=4)
def _jit_score_step(c: GVPTransformerConfig):
    @jax.jit
    def encode(params, coords, padding_mask, confidence):
        return encoder_apply(params, c, coords, padding_mask, confidence)

    @jax.jit
    def decode_ll(params, enc, enc_pad, tokens):
        prev, tgt = tokens[:, :-1], tokens[:, 1:]
        logits = decoder_apply(params, c, prev, enc, enc_pad)
        logp = jax.nn.log_softmax(logits, -1)
        ll = jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32),
                                 -1)[..., 0]
        mask = (tgt != PAD_IDX).astype(ll.dtype)
        return jnp.sum(ll * mask, -1) / jnp.sum(mask, -1)

    return encode, decode_ll


def score_sequences(
    params,
    c: GVPTransformerConfig,
    coords: np.ndarray,
    sequences: Sequence[str],
    batch_size: int = 32,
    confidence: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Mean per-token AR log-lik of each sequence given the backbone —
    the reference's ``ll_fullseq`` (compute_fitness_esm_if1.py:33-39).
    One encoder pass per structure; mutants batched through the decoder."""
    coords = np.asarray(coords, np.float32)
    if coords.shape[1] == 4:  # N, CA, C, O -> N, CA, C
        coords = coords[:, :3]
    pc, conf, padding = prepare_structure(coords, confidence)
    encode, decode_ll = _jit_score_step(c)
    enc = encode(
        params, jnp.asarray(pc)[None], jnp.asarray(padding)[None],
        jnp.asarray(conf)[None],
    )
    rows = [tokenize(s) for s in sequences]
    T = max(len(r) for r in rows)
    out = np.zeros(len(rows))
    enc_pad = jnp.asarray(padding)[None]
    for s0 in range(0, len(rows), batch_size):
        blk = rows[s0 : s0 + batch_size]
        tok = np.full((batch_size, T), PAD_IDX, np.int32)
        for bi, r in enumerate(blk):
            tok[bi, : len(r)] = r
        enc_b = jnp.broadcast_to(enc, (batch_size,) + enc.shape[1:])
        pad_b = jnp.broadcast_to(enc_pad, (batch_size, enc_pad.shape[1]))
        ll = np.asarray(decode_ll(params, enc_b, pad_b, jnp.asarray(tok)))
        out[s0 : s0 + len(blk)] = ll[: len(blk)]
    return out


# ---------------------------------------------------------------------------
# converter

def _t(w):
    return jnp.asarray(np.asarray(w).T)


def _a(w):
    return jnp.asarray(np.asarray(w))


def _conv_lin(sd, prefix):
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _a(sd[f"{prefix}.bias"])
    return p


def _conv_ln(sd, prefix):
    return {"g": _a(sd[f"{prefix}.weight"]), "b": _a(sd[f"{prefix}.bias"])}


def _conv_gvp(sd, prefix):
    p = {}
    for name in ("wh", "ws", "wv", "wg"):
        if f"{prefix}.{name}.weight" in sd:
            p[name] = _conv_lin(sd, f"{prefix}.{name}")
    return p


def _conv_attn(sd, prefix):
    return {
        "q": _conv_lin(sd, f"{prefix}.q_proj"),
        "k": _conv_lin(sd, f"{prefix}.k_proj"),
        "v": _conv_lin(sd, f"{prefix}.v_proj"),
        "o": _conv_lin(sd, f"{prefix}.out_proj"),
    }


def convert_torch_state_dict(sd, c: GVPTransformerConfig) -> Dict[str, Any]:
    """Map the published GVPTransformerModel state_dict to our pytree."""
    sd = {k: v for k, v in sd.items() if not k.endswith("_float_tensor")}
    ge = "encoder.gvp_encoder.embed_graph"
    params: Dict[str, Any] = {
        "enc_embed_tokens": _a(sd["encoder.embed_tokens.weight"]),
        "dec_embed_tokens": _a(sd["decoder.embed_tokens.weight"]),
        "embed_gvp_input_features": _conv_lin(
            sd, "encoder.embed_gvp_input_features"),
        "embed_confidence": _conv_lin(sd, "encoder.embed_confidence"),
        "embed_dihedrals": {
            "lin": _conv_lin(sd, "encoder.embed_dihedrals.node_embedding"),
            "norm": {
                "g": _a(sd["encoder.embed_dihedrals.norm_nodes.gain"]),
                "b": _a(sd["encoder.embed_dihedrals.norm_nodes.bias"]),
            },
        },
        "embed_gvp_output": _conv_lin(sd, "encoder.embed_gvp_output"),
        "graph": {
            "embed_node": {
                "gvp": _conv_gvp(sd, f"{ge}.embed_node.0"),
                "norm": _conv_ln(sd, f"{ge}.embed_node.1.scalar_norm"),
            },
            "embed_edge": {
                "gvp": _conv_gvp(sd, f"{ge}.embed_edge.0"),
                "norm": _conv_ln(sd, f"{ge}.embed_edge.1.scalar_norm"),
            },
            "embed_confidence": _conv_lin(sd, f"{ge}.embed_confidence"),
        },
        "gvp_layers": [],
        "enc_layers": [],
        "enc_norm": _conv_ln(sd, "encoder.layer_norm"),
        "dec_layers": [],
        "dec_norm": _conv_ln(sd, "decoder.layer_norm"),
        "out_proj": {"w": _t(sd["decoder.output_projection.weight"])},
    }
    for i in range(c.gvp_num_encoder_layers):
        b = f"encoder.gvp_encoder.encoder_layers.{i}"
        params["gvp_layers"].append(
            {
                "msg": [
                    _conv_gvp(sd, f"{b}.conv.message_func.{j}")
                    for j in range(3)
                ],
                "norm0": _conv_ln(sd, f"{b}.norm.0.scalar_norm"),
                "norm1": _conv_ln(sd, f"{b}.norm.1.scalar_norm"),
                "ff": [
                    _conv_gvp(sd, f"{b}.ff_func.{j}") for j in range(2)
                ],
            }
        )
    for i in range(c.encoder_layers):
        b = f"encoder.layers.{i}"
        params["enc_layers"].append(
            {
                "attn_ln": _conv_ln(sd, f"{b}.self_attn_layer_norm"),
                "attn": _conv_attn(sd, f"{b}.self_attn"),
                "final_ln": _conv_ln(sd, f"{b}.final_layer_norm"),
                "fc1": _conv_lin(sd, f"{b}.fc1"),
                "fc2": _conv_lin(sd, f"{b}.fc2"),
            }
        )
    for i in range(c.decoder_layers):
        b = f"decoder.layers.{i}"
        params["dec_layers"].append(
            {
                "self_ln": _conv_ln(sd, f"{b}.self_attn_layer_norm"),
                "self": _conv_attn(sd, f"{b}.self_attn"),
                "cross_ln": _conv_ln(sd, f"{b}.encoder_attn_layer_norm"),
                "cross": _conv_attn(sd, f"{b}.encoder_attn"),
                "final_ln": _conv_ln(sd, f"{b}.final_layer_norm"),
                "fc1": _conv_lin(sd, f"{b}.fc1"),
                "fc2": _conv_lin(sd, f"{b}.fc2"),
            }
        )
    return params


# ---------------------------------------------------------------------------
# multichain complexes (ref esm/esm/inverse_folding/multichain_util.py)

def concatenate_complex_coords(
    coords: Dict[str, np.ndarray], target_chain_id: str,
    padding_length: int = 10,
) -> np.ndarray:
    """Target chain first, then every other chain separated by
    ``padding_length`` all-nan residues (multichain_util.py:54-78); the nan
    spacers become padding in the encoder's batch preparation."""
    pad = np.full((padding_length, 3, 3), np.nan, np.float32)
    parts = [np.asarray(coords[target_chain_id], np.float32)[:, :3]]
    for chain_id in coords:
        if chain_id == target_chain_id:
            continue
        parts.append(pad)
        parts.append(np.asarray(coords[chain_id], np.float32)[:, :3])
    return np.concatenate(parts, axis=0)


def score_sequences_in_complex(
    params,
    c: GVPTransformerConfig,
    coords: Dict[str, np.ndarray],
    target_chain_id: str,
    sequences: Sequence[str],
    batch_size: int = 32,
    padding_length: int = 10,
) -> np.ndarray:
    """ll_fullseq of target-chain sequences conditioned on the WHOLE
    complex backbone (multichain_util.py:105-135): the decoder teacher-
    forces only the target chain while the encoder sees every chain."""
    all_coords = concatenate_complex_coords(
        coords, target_chain_id, padding_length
    )
    return score_sequences(
        params, c, all_coords, sequences, batch_size=batch_size
    )
