"""Weight-compatible ESM3 with the structure-token path (evoscale family).

Rebuilds the vendored ESM3 SDK pieces needed for structure-conditioned
fitness scoring (ref: proteingym/baselines/evoscale/):

- multi-track input encoder: sequence / structure-token / plddt-RBF /
  ss8 / sasa / function / residue-annotation embeddings
  (esm/models/esm3.py:69-155)
- trunk: 48 ESM-C-style blocks (pre-LN qkv, q/k LN, rotary, swiglu,
  residue scaling sqrt(48/36)) with GEOMETRIC ATTENTION in block 0
  (esm/layers/blocks.py:56-162, geom_attention.py:9-150,
  transformer_stack.py:27-96)
- backbone frames via Gram-Schmidt with the "black hole" average-frame
  fallback (esm/utils/structure/affine3d.py:308-374, 326-374)
- structure VQ-VAE encoder: kNN local neighborhoods, relative-position
  embeddings, geometric-only blocks, EMA codebook nearest-code lookup
  (esm/models/vqvae.py:145-325, layers/codebook.py, utils/misc.py:85-124)
- output heads (RegressionHead stacks, esm/layers/regression_head.py)
- scoring contract: per-position masked marginals with the structure
  track fixed, score = logp[mt] - logp[wt]
  (evoscale/compute_fitness.py:296-470)

TPU-first: masked positions are scored in large batches through one
compile-once jitted step (the reference masks one position per forward);
frames/structure tokens are computed once per assay; the local-neighborhood
VQ encoder runs as a single (L, K) batched pass instead of a python loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.models import esmc

# token constants (ref esm/utils/constants/esm3.py:7-40)
SEQ_BOS, SEQ_PAD, SEQ_EOS = 0, 1, 2
SEQ_CHAINBREAK, SEQ_MASK = 31, 32
VQVAE_CODEBOOK_SIZE = 4096
STRUCT_MASK = VQVAE_CODEBOOK_SIZE
STRUCT_EOS = VQVAE_CODEBOOK_SIZE + 1
STRUCT_BOS = VQVAE_CODEBOOK_SIZE + 2
STRUCT_PAD = VQVAE_CODEBOOK_SIZE + 3
STRUCT_CHAINBREAK = VQVAE_CODEBOOK_SIZE + 4
SS8_PAD = 0
SASA_PAD = 0
INTERPRO_PAD = 0
RESIDUE_PAD = 0


@dataclasses.dataclass(frozen=True)
class Esm3Config:
    name: str = "esm3_open_small"
    d_model: int = 1536
    n_heads: int = 24
    v_heads: int = 256
    n_layers: int = 48
    n_layers_geom: int = 1
    seq_vocab: int = 64
    struct_vocab: int = VQVAE_CODEBOOK_SIZE + 5

    @property
    def residue_scaling(self) -> float:
        return float(np.sqrt(self.n_layers / 36))

    @property
    def ffn_hidden(self) -> int:
        return esmc._swiglu_hidden(8 / 3, self.d_model)


@dataclasses.dataclass(frozen=True)
class StructureEncoderConfig:
    name: str = "esm3_structure_encoder"
    d_model: int = 1024
    n_heads: int = 1
    v_heads: int = 128
    n_layers: int = 2
    d_out: int = 128
    n_codes: int = VQVAE_CODEBOOK_SIZE
    knn: int = 16
    relpos_bins: int = 32

    @property
    def ffn_hidden(self) -> int:
        return esmc._swiglu_hidden(4.0, self.d_model)


PRESETS = {"esm3_open_small": Esm3Config()}
STRUCTURE_ENCODER_PRESETS = {
    "esm3_structure_encoder": StructureEncoderConfig(),
    "esm3_structure_encoder_tiny": StructureEncoderConfig(
        name="esm3_structure_encoder_tiny", d_model=32, v_heads=4,
        n_layers=2, d_out=16, n_codes=64, knn=6,
    ),
}
TINY = Esm3Config(
    name="esm3_tiny", d_model=48, n_heads=4, v_heads=8, n_layers=2,
)


# ---------------------------------------------------------------------------
# frames (affine3d.py)

def _graham_schmidt(x_axis, xy_plane, eps=1e-12):
    """R with columns [x_hat, e1, e2] (ref affine3d.py:308-323)."""
    denom = jnp.sqrt(jnp.sum(x_axis**2, -1, keepdims=True) + eps)
    x = x_axis / denom
    e1 = xy_plane - x * jnp.sum(x * xy_plane, -1, keepdims=True)
    e1 = e1 / jnp.sqrt(jnp.sum(e1**2, -1, keepdims=True) + eps)
    e2 = jnp.cross(x, e1)
    return jnp.stack([x, e1, e2], axis=-1)


def _backbone_frames(bb):
    """from_graham_schmidt(C, CA, N): x_axis = CA - C, plane = N - CA,
    trans = CA (ref affine3d.py:288-299, 335-337)."""
    n, ca, c = bb[..., 0, :], bb[..., 1, :], bb[..., 2, :]
    return _graham_schmidt(ca - c, n - ca, eps=1e-10), ca


def build_affine_from_coordinates(coords):
    """(B, L, 3, 3) N/CA/C -> (R (B,L,3,3), t (B,L,3), affine_mask (B,L))
    with the black-hole average-frame fallback (ref affine3d.py:326-374)."""
    finite = jnp.isfinite(coords) & (coords < 1e6)
    coord_mask = jnp.all(jnp.all(finite, -1), -1)
    coords = jnp.where(coord_mask[..., None, None], coords, 0.0)

    cm = coord_mask[..., None, None].astype(coords.dtype)
    avg = jnp.sum(coords * cm, axis=1) / (
        jnp.sum(coord_mask, -1)[..., None, None] + 1e-8
    )  # (B, 3, 3)
    R_avg, t_avg = _backbone_frames(avg)
    any_coords = jnp.any(coord_mask, -1)
    eye = jnp.broadcast_to(jnp.eye(3), R_avg.shape)
    R_bh = jnp.where(any_coords[..., None, None], R_avg, eye)
    B, L = coords.shape[0], coords.shape[1]
    R_bh = jnp.broadcast_to(R_bh[:, None], (B, L, 3, 3))
    t_bh = jnp.broadcast_to(t_avg[:, None], (B, L, 3))

    R, t = _backbone_frames(coords)
    m = coord_mask[..., None, None]
    return (
        jnp.where(m, R, R_bh),
        jnp.where(coord_mask[..., None], t, t_bh),
        coord_mask,
    )


# ---------------------------------------------------------------------------
# geometric attention (geom_attention.py:9-150)

def _rbf(values, v_min, v_max, n_bins=16):
    centers = jnp.linspace(v_min, v_max, n_bins)
    std = (v_max - v_min) / n_bins
    z = (values[..., None] - centers) / std
    return jnp.exp(-(z**2))


def geom_attn_init(rng, d_model, v_heads, bias=False, num_vector_messages=1):
    k1, k2 = jax.random.split(rng)
    dim_proj = 4 * v_heads * 3 + v_heads * 3 * num_vector_messages
    ch_out = v_heads * 3 * num_vector_messages
    p = {
        "s_norm": {"g": jnp.ones(d_model)},
        "proj": {"w": jax.random.normal(k1, (d_model, dim_proj)) * 0.02},
        "out": {"w": jax.random.normal(k2, (ch_out, d_model)) * 0.02},
        "dist_scale": jnp.zeros(v_heads),
        "rot_scale": jnp.zeros(v_heads),
    }
    if bias:
        p["s_norm"]["b"] = jnp.zeros(d_model)
        p["proj"]["b"] = jnp.zeros(dim_proj)
        p["out"]["b"] = jnp.zeros(d_model)
    return p


def _lin(x, p):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def geom_attn_apply(p, x, R, t, affine_mask, v_heads,
                    mask_and_zero_frameless=True, num_vector_messages=1):
    """x: (B, T, D); R: (B, T, 3, 3); t: (B, T, 3); affine_mask: (B, T)."""
    ns = esmc._ln(x, p["s_norm"])
    proj = _lin(ns, p["proj"])
    n_rot = v_heads * 2 * 3 + v_heads * 3 * num_vector_messages
    vec_rot, vec_dist = proj[..., :n_rot], proj[..., n_rot:]

    def heads(z):
        return z.reshape(z.shape[:-1] + (-1, 3))

    rot_applied = jnp.einsum("btij,bthj->bthi", R, heads(vec_rot))
    q_rot = rot_applied[..., :v_heads, :]
    k_rot = rot_applied[..., v_heads : 2 * v_heads, :]
    value = rot_applied[..., 2 * v_heads :, :]  # (B,T,v*m,3)

    dist_applied = jnp.einsum(
        "btij,bthj->bthi", R, heads(vec_dist)
    ) + t[:, :, None, :]
    q_dist = dist_applied[..., :v_heads, :]
    k_dist = dist_applied[..., v_heads:, :]

    # (B, H, Tq, Tk)
    dterm = jnp.linalg.norm(
        q_dist[:, :, None] - k_dist[:, None, :], axis=-1
    ).transpose(0, 3, 1, 2) / np.sqrt(3)
    rterm = jnp.einsum("bqhd,bkhd->bhqk", q_rot, k_rot) / np.sqrt(3)
    attn = (
        rterm * jax.nn.softplus(p["rot_scale"])[None, :, None, None]
        - dterm * jax.nn.softplus(p["dist_scale"])[None, :, None, None]
    )
    big = jnp.finfo(jnp.float32).min
    bias_mat = jnp.where(affine_mask[:, None, None, :], 1.0, big)
    attn = attn + bias_mat
    w = jax.nn.softmax(attn, -1)

    B, T = x.shape[0], x.shape[1]
    v = value.reshape(B, T, v_heads, num_vector_messages * 3).transpose(
        0, 2, 1, 3
    )  # (B, H, T, m*3)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(
        B, T, v_heads * num_vector_messages, 3
    )
    out = jnp.einsum("btji,bthj->bthi", R, out)  # R^T apply (invert)
    out = out.reshape(B, T, -1)
    if mask_and_zero_frameless:
        out = jnp.where(affine_mask[..., None], out, 0.0)
    return _lin(out, p["out"])


# ---------------------------------------------------------------------------
# trunk blocks (shared shape with esmc; geom block 0)

def _block_init(rng, d_model, n_heads, ffn_hidden, bias=False):
    ks = jax.random.split(rng, 4)

    def lin(k, n_in, n_out):
        p = {"w": jax.random.normal(k, (n_in, n_out)) * 0.02}
        if bias:
            p["b"] = jnp.zeros(n_out)
        return p

    def ln(d, with_bias=True):
        p = {"g": jnp.ones(d)}
        if with_bias:
            p["b"] = jnp.zeros(d)
        return p

    return {
        "attn_ln": ln(d_model),
        "qkv": lin(ks[0], d_model, 3 * d_model),
        "q_ln": ln(d_model, with_bias=bias),
        "k_ln": ln(d_model, with_bias=bias),
        "out": lin(ks[1], d_model, d_model),
        "ffn_ln": ln(d_model),
        "ffn_in": lin(ks[2], d_model, 2 * ffn_hidden),
        "ffn_out": lin(ks[3], ffn_hidden, d_model),
    }


def _plain_attn(layer, x, n_heads, key_mask=None):
    from proteingym_tpu.ops.rotary import apply_rotary

    B, T, D = x.shape
    hd = D // n_heads
    y = esmc._ln(x, layer["attn_ln"])
    qkv = _lin(y, layer["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = esmc._ln(q, layer["q_ln"])
    k = esmc._ln(k, layer["k_ln"])
    q = q.reshape(B, T, n_heads, hd)
    k = k.reshape(B, T, n_heads, hd)
    v = v.reshape(B, T, n_heads, hd)
    q, k = apply_rotary(q, k)
    # shared dispatcher (grouped Pallas kernel on TPU, XLA elsewhere)
    from proteingym_tpu.ops.flash_attention import mha

    tr = lambda z: z.transpose(0, 2, 1, 3)
    ctx = tr(mha(tr(q), tr(k), tr(v), key_mask=key_mask))
    return _lin(ctx.reshape(B, T, D), layer["out"])


def _ffn(layer, x):
    y = esmc._ln(x, layer["ffn_ln"])
    h = _lin(y, layer["ffn_in"])
    h1, h2 = jnp.split(h, 2, axis=-1)
    return _lin(jax.nn.silu(h1) * h2, layer["ffn_out"])


def _block_apply(layer, x, n_heads, v_heads, scaling, R=None, t=None,
                 affine_mask=None, use_plain=True, key_mask=None,
                 mask_and_zero_frameless=True):
    if use_plain:
        x = x + _plain_attn(layer, x, n_heads, key_mask) / scaling
    if "geom" in layer:
        x = x + geom_attn_apply(
            layer["geom"], x, R, t, affine_mask, v_heads,
            mask_and_zero_frameless=mask_and_zero_frameless,
        ) / scaling
    x = x + _ffn(layer, x) / scaling
    return x


# ---------------------------------------------------------------------------
# ESM3 model

def init_params(rng: jax.Array, c: Esm3Config) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 32 + c.n_layers))

    def mat(n_in, n_out):
        return jax.random.normal(next(keys), (n_in, n_out)) * 0.02

    def lin(n_in, n_out):
        return {"w": mat(n_in, n_out), "b": jnp.zeros(n_out)}

    def reg_head(d, out):
        return {
            "dense": lin(d, d),
            "ln": {"g": jnp.ones(d), "b": jnp.zeros(d)},
            "out": lin(d, out),
        }

    d = c.d_model
    params: Dict[str, Any] = {
        "encoder": {
            "sequence_embed": mat(c.seq_vocab, d),
            "plddt_proj": lin(16, d),
            "per_res_plddt_proj": lin(16, d),
            "structure_embed": mat(c.struct_vocab, d),
            "ss8_embed": mat(8 + 3, d),
            "sasa_embed": mat(16 + 3, d),
            "function_embed": [mat(260, d // 8) for _ in range(8)],
            "residue_embed": mat(1478, d),
        },
        "layers": [
            _block_init(next(keys), d, c.n_heads, c.ffn_hidden)
            for _ in range(c.n_layers)
        ],
        "final_ln": {"g": jnp.ones(d)},
        "heads": {
            "sequence": reg_head(d, 64),
            "structure": reg_head(d, 4096),
            "ss8": reg_head(d, 8 + 3),
            "sasa": reg_head(d, 16 + 3),
            "function": reg_head(d, 260 * 8),
            "residue": reg_head(d, 1478),
        },
    }
    for i in range(c.n_layers_geom):
        params["layers"][i]["geom"] = geom_attn_init(
            next(keys), d, c.v_heads, bias=False
        )
    return params


def _reg_head_apply(p, x):
    h = _lin(x, p["dense"])
    h = jax.nn.gelu(h, approximate=False)
    h = esmc._ln(h, p["ln"])
    return _lin(h, p["out"])


def encode_inputs(params, c: Esm3Config, sequence_tokens, structure_tokens,
                  average_plddt, per_res_plddt, ss8_tokens, sasa_tokens,
                  function_tokens=None, residue_tokens=None):
    """EncodeInputs.forward (esm3.py:100-155)."""
    e = params["encoder"]
    x = e["sequence_embed"][sequence_tokens]
    x = x + _lin(_rbf(average_plddt, 0.0, 1.0), e["plddt_proj"])
    x = x + _lin(_rbf(per_res_plddt, 0.0, 1.0), e["per_res_plddt_proj"])
    x = x + e["structure_embed"][structure_tokens]
    x = x + e["ss8_embed"][ss8_tokens]
    x = x + e["sasa_embed"][sasa_tokens]
    if function_tokens is not None:
        x = x + jnp.concatenate(
            [e["function_embed"][k][function_tokens[..., k]]
             for k in range(8)], -1,
        )
    if residue_tokens is not None:  # EmbeddingBag sum, padding_idx=0
        emb = e["residue_embed"][residue_tokens]  # (B, L, N, D)
        keep = (residue_tokens != RESIDUE_PAD)[..., None]
        x = x + jnp.sum(jnp.where(keep, emb, 0.0), axis=-2)
    return x


def forward(params, c: Esm3Config, sequence_tokens, structure_tokens=None,
            coords=None, ss8_tokens=None, sasa_tokens=None,
            average_plddt=None, per_res_plddt=None):
    """ESM3.forward with the reference's default-filling + structure-token
    special remapping (esm3.py:307-382). Returns sequence logits (B, T, 64)
    plus the pre-head embedding."""
    B, T = sequence_tokens.shape
    if ss8_tokens is None:
        ss8_tokens = jnp.full((B, T), SS8_PAD, jnp.int32)
    if sasa_tokens is None:
        sasa_tokens = jnp.full((B, T), SASA_PAD, jnp.int32)
    if average_plddt is None:
        average_plddt = jnp.ones((B, T), jnp.float32)
    if per_res_plddt is None:
        per_res_plddt = jnp.zeros((B, T), jnp.float32)
    if coords is None:
        coords = jnp.full((B, T, 3, 3), jnp.nan, jnp.float32)
    coords = coords[..., :3, :]
    R, t, affine_mask = build_affine_from_coordinates(coords)

    if structure_tokens is None:
        structure_tokens = jnp.full((B, T), STRUCT_MASK, jnp.int32)
    structure_tokens = jnp.where(
        structure_tokens == -1, STRUCT_MASK, structure_tokens
    )
    for seq_tok, struct_tok in (
        (SEQ_BOS, STRUCT_BOS), (SEQ_PAD, STRUCT_PAD),
        (SEQ_EOS, STRUCT_EOS), (SEQ_CHAINBREAK, STRUCT_CHAINBREAK),
    ):
        structure_tokens = jnp.where(
            sequence_tokens == seq_tok, struct_tok, structure_tokens
        )

    x = encode_inputs(
        params, c, sequence_tokens, structure_tokens, average_plddt,
        per_res_plddt, ss8_tokens, sasa_tokens,
    )
    scaling = c.residue_scaling
    for layer in params["layers"]:
        x = _block_apply(
            layer, x, c.n_heads, c.v_heads, scaling, R=R, t=t,
            affine_mask=affine_mask, mask_and_zero_frameless=True,
        )
    embed = x
    x = esmc._ln(x, params["final_ln"])
    return _reg_head_apply(params["heads"]["sequence"], x), embed


# ---------------------------------------------------------------------------
# structure VQ-VAE encoder

def structure_encoder_init(rng, c: StructureEncoderConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 4 + c.n_layers))
    params = {
        "relpos": jax.random.normal(
            next(keys), (2 * c.relpos_bins + 2, c.d_model)
        ) * 0.02,
        "layers": [],
        "pre_vq": {
            "w": jax.random.normal(next(keys), (c.d_model, c.d_out)) * 0.02,
            "b": jnp.zeros(c.d_out),
        },
        "codebook": jax.random.normal(next(keys), (c.n_codes, c.d_out)),
    }
    for i in range(c.n_layers):
        layer = _block_init(next(keys), c.d_model, c.n_heads, c.ffn_hidden,
                            bias=True)
        layer["geom"] = geom_attn_init(
            jax.random.fold_in(rng, 1000 + i), c.d_model, c.v_heads,
            bias=True,
        )
        # geometric-only blocks: drop the unused plain-attention weights
        for k in ("attn_ln", "qkv", "q_ln", "k_ln", "out"):
            del layer[k]
        params["layers"].append(layer)
    return params


def _knn_edges(ca, coord_mask, knn):
    """knn_graph (utils/misc.py:85-124): structure distance, with
    100*seqdist + 1e6 fallback for coordless pairs; self sorts first."""
    L = ca.shape[0]
    k = min(knn, L)
    ca = jnp.nan_to_num(ca)
    pair_invalid = ~(coord_mask[None, :] & coord_mask[:, None])
    d = jnp.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    seq = jnp.arange(L)
    seq_d = jnp.abs(seq[:, None] - seq[None, :]).astype(d.dtype)
    adj = jnp.where(pair_invalid, seq_d * 1e2 + 1e6, d)
    order = jnp.argsort(adj, axis=-1)
    return order[:, :k]


def structure_tokens_from_coords(
    params, c: StructureEncoderConfig, coords: np.ndarray,
    residue_index: Optional[np.ndarray] = None,
) -> np.ndarray:
    """StructureTokenEncoder.encode (vqvae.py:294-325) for one chain:
    (L, 3, 3) N/CA/C -> (L,) codebook indices."""
    coords = jnp.asarray(coords, jnp.float32)[None, :, :3, :]
    R, t, affine_mask = build_affine_from_coordinates(coords)
    R, t, affine_mask = R[0], t[0], affine_mask[0]
    L = coords.shape[1]
    if residue_index is None:
        residue_index = np.arange(L) + 1
    residue_index = jnp.asarray(residue_index)

    edges = _knn_edges(coords[0, :, 1], affine_mask, c.knn)  # (L, K)
    K = edges.shape[1]
    res_idx = residue_index[edges]                           # (L, K)
    diff = jnp.clip(
        res_idx - res_idx[:, :1], -c.relpos_bins, c.relpos_bins
    ) + c.relpos_bins + 1
    z = params["relpos"][diff]                                # (L, K, D)

    Rn = R[edges]                                             # (L, K, 3, 3)
    tn = t[edges]
    mn = affine_mask[edges]
    for layer in params["layers"]:
        z = _block_apply(
            layer, z, c.n_heads, c.v_heads, 1.0, R=Rn, t=tn,
            affine_mask=mn, use_plain=False,
            mask_and_zero_frameless=False,
        )
    q = z[:, 0, :]                                            # query node
    q = jnp.where(affine_mask[:, None], q, 0.0)
    q = _lin(q, params["pre_vq"])
    cb = params["codebook"]
    d2 = (
        jnp.sum(q**2, -1, keepdims=True)
        - 2 * q @ cb.T
        + jnp.sum(cb**2, -1)[None, :]
    )
    return np.asarray(jnp.argmin(d2, -1), np.int32)


# ---------------------------------------------------------------------------
# scoring (masked marginals, structure track fixed)

def tokenize_sequence(seq: str) -> np.ndarray:
    return esmc.ALPHABET.tokenize(seq)


def prepare_tracks(struct_params, sc: StructureEncoderConfig, seq: str,
                   coords: Optional[np.ndarray]):
    """[BOS] seq [EOS] tokens + flanked structure tokens/coords
    (encoding.tokenize_structure adds BOS/EOS + inf coord flanks)."""
    tokens = tokenize_sequence(seq)
    T = len(tokens)
    if coords is None:
        return tokens, None, None
    struct = structure_tokens_from_coords(struct_params, sc, coords)
    struct_tokens = np.full(T, STRUCT_PAD, np.int32)
    struct_tokens[0] = STRUCT_BOS
    struct_tokens[-1] = STRUCT_EOS
    struct_tokens[1 : 1 + len(struct)] = struct
    pc = np.full((T, 3, 3), np.inf, np.float32)
    pc[1 : 1 + len(coords)] = coords[:, :3]
    return tokens, struct_tokens, pc


@functools.lru_cache(maxsize=2)
def _jit_masked_step(c: Esm3Config):
    @jax.jit
    def step(params, tokens, struct_tokens, coords, per_res_plddt):
        logits, _ = forward(
            params, c, tokens, structure_tokens=struct_tokens,
            coords=coords, per_res_plddt=per_res_plddt,
        )
        return jax.nn.log_softmax(logits, -1)

    return step


def masked_logprob_table(
    params, c: Esm3Config, tokens: np.ndarray,
    struct_tokens: Optional[np.ndarray], coords: Optional[np.ndarray],
    positions: Sequence[int], batch: int = 8,
) -> np.ndarray:
    """log-softmax rows at each masked position (token grid coords)."""
    step = _jit_masked_step(c)
    T = len(tokens)
    if coords is not None:
        per_res = jnp.asarray(
            np.isfinite(coords).all(-1).any(-1).astype(np.float32)
        )[None]
        coords_j = jnp.asarray(coords)[None]
        struct_j = jnp.asarray(struct_tokens)[None]
    else:
        per_res = jnp.zeros((1, T), jnp.float32)
        coords_j = None
        struct_j = None
    out = np.zeros((len(positions), 64), np.float32)
    pos = list(positions)
    for s in range(0, len(pos), batch):
        blk = pos[s : s + batch]
        nb = len(blk)
        tok = np.tile(tokens[None], (batch, 1))
        for bi, p in enumerate(blk):
            tok[bi, p] = SEQ_MASK
        kw = dict(
            struct_tokens=None if struct_j is None else
            jnp.broadcast_to(struct_j, (batch, T)),
            coords=None if coords_j is None else
            jnp.broadcast_to(coords_j, (batch, T, 3, 3)),
            per_res_plddt=jnp.broadcast_to(per_res, (batch, T)),
        )
        logp = np.asarray(step(params, jnp.asarray(tok), kw["struct_tokens"],
                               kw["coords"], kw["per_res_plddt"]))
        for bi, p in enumerate(blk):
            out[s + bi] = logp[bi, p]
    return out


def score_assay_esm3(
    params, c: Esm3Config, struct_params, sc: StructureEncoderConfig,
    sequence: str, mutants: Sequence[str],
    coords: Optional[np.ndarray] = None, batch: int = 8,
) -> np.ndarray:
    """Masked-marginal mutant scores, structure-conditioned when coords are
    given (ref evoscale/compute_fitness.py:296-470)."""
    tokens, struct_tokens, pc = prepare_tracks(
        struct_params, sc, sequence, coords
    )
    positions = sorted(
        {int(tok[1:-1]) - 1 for m in mutants if m and m.lower() != "wt"
         for tok in m.replace(";", ":").split(":")}
    )
    table = masked_logprob_table(
        params, c, tokens, struct_tokens, pc,
        [p + 1 for p in positions], batch=batch,  # +1 for BOS
    )
    row_of = {p: i for i, p in enumerate(positions)}
    aa_tok = {a: int(tokenize_sequence(a)[1]) for a in
              "ACDEFGHIKLMNPQRSTVWY"}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if not m or m.lower() == "wt":
            continue
        for tok in m.replace(";", ":").split(":"):
            wt, p, mt = tok[0], int(tok[1:-1]) - 1, tok[-1]
            if sequence[p] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            row = table[row_of[p]]
            out[i] += row[aa_tok[mt]] - row[aa_tok[wt]]
    return out


# ---------------------------------------------------------------------------
# converters

def _np32(v):
    return np.asarray(
        v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
    )


def _c_lin(sd, prefix):
    p = {"w": jnp.asarray(_np32(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np32(sd[f"{prefix}.bias"]))
    return p


def _c_ln(sd, prefix, bias=True):
    p = {"g": jnp.asarray(_np32(sd[f"{prefix}.weight"]))}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np32(sd[f"{prefix}.bias"]))
    return p


def _c_geom(sd, prefix):
    p = {
        "s_norm": _c_ln(sd, f"{prefix}.s_norm"),
        "proj": _c_lin(sd, f"{prefix}.proj"),
        "out": _c_lin(sd, f"{prefix}.out_proj"),
        "dist_scale": jnp.asarray(_np32(sd[f"{prefix}.distance_scale_per_head"])),
        "rot_scale": jnp.asarray(_np32(sd[f"{prefix}.rotation_scale_per_head"])),
    }
    return p


def _c_block(sd, prefix, plain=True):
    layer = {}
    if plain:
        layer.update(
            {
                "attn_ln": _c_ln(sd, f"{prefix}.attn.layernorm_qkv.0"),
                "qkv": _c_lin(sd, f"{prefix}.attn.layernorm_qkv.1"),
                "q_ln": _c_ln(sd, f"{prefix}.attn.q_ln"),
                "k_ln": _c_ln(sd, f"{prefix}.attn.k_ln"),
                "out": _c_lin(sd, f"{prefix}.attn.out_proj"),
            }
        )
    layer["ffn_ln"] = _c_ln(sd, f"{prefix}.ffn.0")
    layer["ffn_in"] = _c_lin(sd, f"{prefix}.ffn.1")
    layer["ffn_out"] = _c_lin(sd, f"{prefix}.ffn.3")
    if f"{prefix}.geom_attn.proj.weight" in sd:
        layer["geom"] = _c_geom(sd, f"{prefix}.geom_attn")
    return layer


def _c_reg_head(sd, prefix):
    return {
        "dense": _c_lin(sd, f"{prefix}.0"),
        "ln": _c_ln(sd, f"{prefix}.2"),
        "out": _c_lin(sd, f"{prefix}.3"),
    }


def convert_torch_state_dict(sd, c: Esm3Config) -> Dict[str, Any]:
    """Published ESM3 (esm3-open) state_dict -> our pytree."""
    enc = "encoder"
    params: Dict[str, Any] = {
        "encoder": {
            "sequence_embed": jnp.asarray(
                _np32(sd[f"{enc}.sequence_embed.weight"])),
            "plddt_proj": _c_lin(sd, f"{enc}.plddt_projection"),
            "per_res_plddt_proj": _c_lin(
                sd, f"{enc}.structure_per_res_plddt_projection"),
            "structure_embed": jnp.asarray(
                _np32(sd[f"{enc}.structure_tokens_embed.weight"])),
            "ss8_embed": jnp.asarray(_np32(sd[f"{enc}.ss8_embed.weight"])),
            "sasa_embed": jnp.asarray(_np32(sd[f"{enc}.sasa_embed.weight"])),
            "function_embed": [
                jnp.asarray(_np32(sd[f"{enc}.function_embed.{k}.weight"]))
                for k in range(8)
            ],
            "residue_embed": jnp.asarray(
                _np32(sd[f"{enc}.residue_embed.weight"])),
        },
        "layers": [
            _c_block(sd, f"transformer.blocks.{i}")
            for i in range(c.n_layers)
        ],
        "final_ln": _c_ln(sd, "transformer.norm", bias=False),
        "heads": {
            "sequence": _c_reg_head(sd, "output_heads.sequence_head"),
            "structure": _c_reg_head(sd, "output_heads.structure_head"),
            "ss8": _c_reg_head(sd, "output_heads.ss8_head"),
            "sasa": _c_reg_head(sd, "output_heads.sasa_head"),
            "function": _c_reg_head(sd, "output_heads.function_head"),
            "residue": _c_reg_head(sd, "output_heads.residue_head"),
        },
    }
    return params


def convert_structure_encoder_state_dict(
    sd, c: StructureEncoderConfig
) -> Dict[str, Any]:
    return {
        "relpos": jnp.asarray(
            _np32(sd["relative_positional_embedding.embedding.weight"])),
        "layers": [
            _c_block(sd, f"transformer.blocks.{i}", plain=False)
            for i in range(c.n_layers)
        ],
        "pre_vq": _c_lin(sd, "pre_vq_proj"),
        "codebook": jnp.asarray(_np32(sd["codebook.embeddings"])),
    }
