"""ProteinMPNN: inverse-folding GNN scored by mean NLL over decoding orders.

Architecture parity with the reference
(ref: proteingym/baselines/protein_mpnn/protein_mpnn_utils.py):

  - featurization (:921-1020): k-NN graph on Ca distances; 25 backbone
    atom-pair RBFs (N/Ca/C/O + virtual Cb, 16 bins on [2, 22] A) + relative
    position one-hot (clip +-32, 66 classes incl. cross-chain) -> linear
    (no bias) -> LayerNorm; node features start at zero
  - encoder (:618-668, 3 layers, hidden 128): message = MLP(h_i, h_j, e_ij),
    mean over K/30, residual+LN, FFN, then an edge update MLP
  - decoder (:672-716, 3 layers): random decoding order; position i sees
    sequence embeddings of already-decoded neighbors and encoder-only
    features of future neighbors (:1080-1098)
  - score (:_scores) = masked mean NLL of the sequence; fitness = average
    over random decoding orders (ref compute_fitness.py:187-230)

TPU design: the encoder is sequence-independent, so it runs ONCE per
structure; the decoder is vmapped over (mutant sequence x decoding order)
pairs — the reference recomputes the full graph encoder for every mutant.
Alphabet: 'ACDEFGHIKLMNPQRSTVWYX' (21, alphabetical, ref :20).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MPNN_ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"


@dataclasses.dataclass(frozen=True)
class MpnnConfig:
    name: str = "v_48_020"
    hidden_dim: int = 128
    edge_features: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    k_neighbors: int = 48
    num_rbf: int = 16
    num_positional_embeddings: int = 16
    max_relative_feature: int = 32
    vocab: int = 21
    scale: float = 30.0  # message-sum divisor (ref :627 scale=30)


def tokenize_sequence(seq: str) -> np.ndarray:
    idx = {a: i for i, a in enumerate(MPNN_ALPHABET)}
    return np.asarray([idx.get(c, idx["X"]) for c in seq], dtype=np.int32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, c: MpnnConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(
        rng, 6 + 8 * c.num_encoder_layers + 5 * c.num_decoder_layers
    ))

    def dense(n_in, n_out, bias=True):
        lim = np.sqrt(6.0 / (n_in + n_out))
        p = {"w": jax.random.uniform(next(keys), (n_in, n_out), jnp.float32,
                                     -lim, lim)}
        if bias:
            p["b"] = jnp.zeros(n_out, jnp.float32)
        return p

    def ln(d):
        return {"g": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)}

    h = c.hidden_dim
    edge_in = c.num_positional_embeddings + c.num_rbf * 25
    params: Dict[str, Any] = {
        "pos_linear": dense(2 * c.max_relative_feature + 2,
                            c.num_positional_embeddings),
        "edge_embedding": dense(edge_in, c.edge_features, bias=False),
        "norm_edges": ln(c.edge_features),
        "W_e": dense(c.edge_features, h),
        "W_s": jax.random.normal(next(keys), (c.vocab, h), jnp.float32) * 0.02,
        "W_out": dense(h, c.vocab),
        "encoder": [],
        "decoder": [],
    }
    for _ in range(c.num_encoder_layers):
        params["encoder"].append(
            {
                "W1": dense(3 * h, h), "W2": dense(h, h), "W3": dense(h, h),
                "W11": dense(3 * h, h), "W12": dense(h, h), "W13": dense(h, h),
                "norm1": ln(h), "norm2": ln(h), "norm3": ln(h),
                "ffn_in": dense(h, 4 * h), "ffn_out": dense(4 * h, h),
            }
        )
    for _ in range(c.num_decoder_layers):
        params["decoder"].append(
            {
                "W1": dense(4 * h, h), "W2": dense(h, h), "W3": dense(h, h),
                "norm1": ln(h), "norm2": ln(h),
                "ffn_in": dense(h, 4 * h), "ffn_out": dense(4 * h, h),
            }
        )
    return params


def _dense(x, p):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Featurization (single chain)
# ---------------------------------------------------------------------------

def virtual_cb(coords: jnp.ndarray) -> jnp.ndarray:
    """Idealized Cb from backbone N/Ca/C (ref :967-971)."""
    n, ca, cc = coords[:, 0], coords[:, 1], coords[:, 2]
    b = ca - n
    c = cc - ca
    a = jnp.cross(b, c)
    return -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + ca


def _rbf(d, num_rbf):
    mu = jnp.linspace(2.0, 22.0, num_rbf)
    sigma = (22.0 - 2.0) / num_rbf
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))


def featurize(
    params, c: MpnnConfig, coords: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """coords: (L, 4, 3) N/Ca/C/O -> (E (L,K,edge), E_idx (L,K))."""
    L = coords.shape[0]
    k = min(c.k_neighbors, L)
    ca = coords[:, 1]
    d2 = jnp.sum((ca[:, None] - ca[None]) ** 2, -1)
    d = jnp.sqrt(d2 + 1e-6)
    neg_d, e_idx = jax.lax.top_k(-d, k)
    d_neighbors = -neg_d

    atoms = {
        "N": coords[:, 0], "Ca": ca, "C": coords[:, 2], "O": coords[:, 3],
        "Cb": virtual_cb(coords),
    }
    # atom-pair order matches ref :979-1004
    pairs = [
        ("Ca", "Ca"), ("N", "N"), ("C", "C"), ("O", "O"), ("Cb", "Cb"),
        ("Ca", "N"), ("Ca", "C"), ("Ca", "O"), ("Ca", "Cb"), ("N", "C"),
        ("N", "O"), ("N", "Cb"), ("Cb", "C"), ("Cb", "O"), ("O", "C"),
        ("N", "Ca"), ("C", "Ca"), ("O", "Ca"), ("Cb", "Ca"), ("C", "N"),
        ("O", "N"), ("Cb", "N"), ("C", "Cb"), ("O", "Cb"), ("C", "O"),
    ]
    rbfs = [_rbf(d_neighbors, c.num_rbf)]
    for a, b in pairs[1:]:
        dab = jnp.sqrt(
            jnp.sum((atoms[a][:, None] - atoms[b][None]) ** 2, -1) + 1e-6
        )
        rbfs.append(_rbf(jnp.take_along_axis(dab, e_idx, 1), c.num_rbf))
    rbf_all = jnp.concatenate(rbfs, axis=-1)

    offset = jnp.arange(L)[:, None] - jnp.arange(L)[None]
    offset = jnp.take_along_axis(offset, e_idx, 1)
    m = c.max_relative_feature
    d_clip = jnp.clip(offset + m, 0, 2 * m)  # same-chain path (mask=1)
    onehot = jax.nn.one_hot(d_clip, 2 * m + 2)
    e_pos = _dense(onehot, params["pos_linear"])

    e = jnp.concatenate([e_pos, rbf_all], axis=-1)
    e = _ln(_dense(e, params["edge_embedding"]), params["norm_edges"])
    return e, e_idx


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def _gather_nodes(h, e_idx):
    """h: (L, D), e_idx: (L, K) -> (L, K, D)."""
    return h[e_idx]


def encode(params, c: MpnnConfig, coords: jnp.ndarray):
    """Sequence-independent graph encoding. Returns (h_V, h_E, E_idx)."""
    e, e_idx = featurize(params, c, coords)
    L = e.shape[0]
    h_v = jnp.zeros((L, c.hidden_dim))
    h_e = _dense(e, params["W_e"])

    for layer in params["encoder"]:
        # slot order matches the reference's cat_neighbors_nodes layout
        # [h_V_i, h_E, h_V_j] (ref protein_mpnn_utils: h_EV = cat([h_E,
        # gather(h_V)]), then cat([h_V_expand, h_EV])) — converted
        # checkpoints multiply these slots with trained weights, so a
        # permutation scores garbage with no shape error
        h_ev = jnp.concatenate(
            [
                jnp.broadcast_to(h_v[:, None], h_e.shape[:2] + (c.hidden_dim,)),
                h_e,
                _gather_nodes(h_v, e_idx),
            ],
            -1,
        )
        msg = _dense(_gelu(_dense(_gelu(_dense(h_ev, layer["W1"])),
                                  layer["W2"])), layer["W3"])
        dh = jnp.sum(msg, -2) / c.scale
        h_v = _ln(h_v + dh, layer["norm1"])
        dh = _dense(_gelu(_dense(h_v, layer["ffn_in"])), layer["ffn_out"])
        h_v = _ln(h_v + dh, layer["norm2"])

        # edge update uses the SAME [h_V_i, h_E, h_V_j] slot order as the
        # node update (ref EncLayer.forward:663-666 via cat_neighbors_nodes)
        h_ev = jnp.concatenate(
            [
                jnp.broadcast_to(h_v[:, None], h_e.shape[:2] + (c.hidden_dim,)),
                h_e,
                _gather_nodes(h_v, e_idx),
            ],
            -1,
        )
        msg = _dense(_gelu(_dense(_gelu(_dense(h_ev, layer["W11"])),
                                  layer["W12"])), layer["W13"])
        h_e = _ln(h_e + msg, layer["norm3"])
    return h_v, h_e, e_idx


def decode(
    params,
    c: MpnnConfig,
    enc: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    seq_tokens: jnp.ndarray,
    decoding_order: jnp.ndarray,
) -> jnp.ndarray:
    """Teacher-forced conditional log-probs (L, vocab) for one sequence and
    one decoding order (a permutation of range(L))."""
    h_v, h_e, e_idx = enc
    L = h_v.shape[0]
    h_s = params["W_s"][seq_tokens]

    # rank[i] = step at which i is decoded; i attends to j iff rank[j] < rank[i]
    rank = jnp.zeros(L, jnp.int32).at[decoding_order].set(
        jnp.arange(L, dtype=jnp.int32)
    )
    attend = (rank[e_idx] < rank[:, None])[..., None]  # (L, K, 1)

    # reference layouts: h_ES = [h_E, h_S_j]; h_EX_enc = [h_E, 0];
    # h_EXV_enc = [h_E, 0, h_V_j]; per-layer input = [h_V_i, h_E, h_S_j,
    # h_V_j] (ref cat_neighbors_nodes puts neighbors-first, gathered last)
    h_es = jnp.concatenate([h_e, _gather_nodes(h_s, e_idx)], -1)
    h_ex_enc = jnp.concatenate([h_e, jnp.zeros_like(_gather_nodes(h_s, e_idx))], -1)
    h_exv_enc = jnp.concatenate([h_ex_enc, _gather_nodes(h_v, e_idx)], -1)
    h_exv_enc_fw = (1.0 - attend) * h_exv_enc

    for layer in params["decoder"]:
        h_esv = jnp.concatenate([h_es, _gather_nodes(h_v, e_idx)], -1)
        h_esv = attend * h_esv + h_exv_enc_fw
        h_in = jnp.concatenate(
            [jnp.broadcast_to(h_v[:, None], h_esv.shape[:2] + (c.hidden_dim,)),
             h_esv],
            -1,
        )
        msg = _dense(_gelu(_dense(_gelu(_dense(h_in, layer["W1"])),
                                  layer["W2"])), layer["W3"])
        dh = jnp.sum(msg, -2) / c.scale
        h_v = _ln(h_v + dh, layer["norm1"])
        dh = _dense(_gelu(_dense(h_v, layer["ffn_in"])), layer["ffn_out"])
        h_v = _ln(h_v + dh, layer["norm2"])

    logits = _dense(h_v, params["W_out"])
    return jax.nn.log_softmax(logits, axis=-1)


def score_sequences(
    params,
    c: MpnnConfig,
    coords: np.ndarray,
    sequences: Sequence[str],
    n_orders: int = 10,
    seed: int = 37,
    batch_size: int = 64,
) -> np.ndarray:
    """Mean NLL score per sequence, averaged over random decoding orders
    (ref compute_fitness.py:207-230; higher = better under directionality -1,
    here we return -NLL so higher = more likely)."""
    enc = encode(params, c, jnp.asarray(coords, jnp.float32))
    L = coords.shape[0]
    rng = np.random.default_rng(seed)
    # reference decoding order: argsort of |randn| (chain fully decodable)
    orders = np.stack(
        [np.argsort(np.abs(rng.standard_normal(L))) for _ in range(n_orders)]
    ).astype(np.int32)

    toks = np.stack([tokenize_sequence(s) for s in sequences])

    @jax.jit
    def nll_batch(tok_batch):
        def one_seq(tok):
            def one_order(order):
                logps = decode(params, c, enc, tok, order)
                return -jnp.mean(
                    jnp.take_along_axis(logps, tok[:, None], -1)[:, 0]
                )

            return jnp.mean(jax.vmap(one_order)(jnp.asarray(orders)))

        return jax.vmap(one_seq)(tok_batch)

    out = np.zeros(len(sequences))
    for s in range(0, len(sequences), batch_size):
        blk = toks[s : s + batch_size]
        out[s : s + len(blk)] = np.asarray(nll_batch(jnp.asarray(blk)))
    return -out


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict, c: MpnnConfig) -> Dict[str, Any]:
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

    params = {
        "pos_linear": dense("features.embeddings.linear"),
        "edge_embedding": dense("features.edge_embedding", bias=False),
        "norm_edges": ln("features.norm_edges"),
        "W_e": dense("W_e"),
        "W_s": jnp.asarray(get("W_s.weight")),
        "W_out": dense("W_out"),
        "encoder": [],
        "decoder": [],
    }
    for i in range(c.num_encoder_layers):
        lp = f"encoder_layers.{i}"
        params["encoder"].append(
            {
                "W1": dense(f"{lp}.W1"), "W2": dense(f"{lp}.W2"),
                "W3": dense(f"{lp}.W3"), "W11": dense(f"{lp}.W11"),
                "W12": dense(f"{lp}.W12"), "W13": dense(f"{lp}.W13"),
                "norm1": ln(f"{lp}.norm1"), "norm2": ln(f"{lp}.norm2"),
                "norm3": ln(f"{lp}.norm3"),
                "ffn_in": dense(f"{lp}.dense.W_in"),
                "ffn_out": dense(f"{lp}.dense.W_out"),
            }
        )
    for i in range(c.num_decoder_layers):
        lp = f"decoder_layers.{i}"
        params["decoder"].append(
            {
                "W1": dense(f"{lp}.W1"), "W2": dense(f"{lp}.W2"),
                "W3": dense(f"{lp}.W3"),
                "norm1": ln(f"{lp}.norm1"), "norm2": ln(f"{lp}.norm2"),
                "ffn_in": dense(f"{lp}.dense.W_in"),
                "ffn_out": dense(f"{lp}.dense.W_out"),
            }
        )
    return params
