"""Weight-compatible MULAN: ESM2 trunk with a structure-angle adapter.

The reference (ref: proteingym/baselines/mulan/mulan/model.py:13-48,
model_utils.py:59-190, compute_fitness.py:27-127) is a HuggingFace
EsmForMaskedLM whose embedding layer ADDS a structure embedding before
ESM's token-dropout rescaling:

  struct_embeddings = Encoder_1layer(Linear(7 angles -> d))   # no rotary,
                                                              # no positions
  embeddings = word_embeddings(tokens) + struct_embeddings
  ... standard ESM2 token dropout / rotary trunk / lm head ...

Angle features per residue: [phi, psi, chi1..chi5] in radians, NaNs filled
with deg2rad(182), ragged chi slots and the CLS/EOS flanks filled with 4.0
(tokenizer.py:27-58, dataset.py:132-152). Scoring masks the mutated token
AND overwrites its angle row with -4.0, then
score = sum log p(mt)/p(wt) at the token position
(compute_fitness.py:27-77, mask_mutated_positions at :117-127).

TPU design: mutants are scored in batches (the reference loops one mutant
per forward); the struct adapter runs inside the same jit as the trunk.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.models import esm2

NAN_FILL = float(np.deg2rad(182.0))
PAD_VALUE = 4.0
MASKED_ANGLE = -4.0
STRUCT_DIM = 7


@dataclasses.dataclass(frozen=True)
class MulanConfig:
    name: str = "mulan_small"
    esm: esm2.EsmConfig = dataclasses.field(
        default_factory=lambda: esm2.PRESETS["esm2_t12_35M"]
    )
    struct_layers: int = 1
    struct_dim: int = STRUCT_DIM


def init_params(rng: jax.Array, c: MulanConfig) -> Dict[str, Any]:
    k1, k2, *ks = jax.random.split(rng, 2 + 4 * c.struct_layers)
    d = c.esm.embed_dim

    def dense(key, n_in, n_out):
        return {
            "kernel": jax.random.normal(key, (n_in, n_out)) * 0.02,
            "bias": jnp.zeros(n_out),
        }

    def ln(dim):
        return {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}

    params = {
        "esm": esm2.init_params(k1, c.esm),
        "struct": {
            "mlp": dense(k2, c.struct_dim, d),
            "layers": [
                {
                    "attn_ln": ln(d),
                    "q": dense(ks[4 * i], d, d),
                    "k": dense(ks[4 * i + 1], d, d),
                    "v": dense(ks[4 * i + 2], d, d),
                    "out": dense(ks[4 * i + 3], d, d),
                    "ffn_ln": ln(d),
                    "fc1": dense(jax.random.fold_in(k2, i), d, 4 * d),
                    "fc2": dense(jax.random.fold_in(k2, 100 + i), 4 * d, d),
                }
                for i in range(c.struct_layers)
            ],
        },
    }
    return params


def _lnorm(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dn(x, p):
    return x @ p["kernel"] + p["bias"]


def struct_embeddings(params, c: MulanConfig, feats, attn_mask):
    """StructEmbeddings (model_utils.py:59-97): Linear then a 1-layer HF-ESM
    encoder with position_embedding_type='absolute' and NO position table —
    i.e. plain position-free pre-LN attention + gelu FFN."""
    d = c.esm.embed_dim
    h = c.esm.num_heads
    hd = d // h
    x = _dn(feats, params["mlp"])
    from proteingym_tpu.ops.flash_attention import mha

    for layer in params["layers"]:
        y = _lnorm(x, layer["attn_ln"])
        q = _dn(y, layer["q"])
        k = _dn(y, layer["k"])
        v = _dn(y, layer["v"])
        B, T = y.shape[0], y.shape[1]

        def split(z):
            return z.reshape(B, T, h, hd).transpose(0, 2, 1, 3)

        # shared dispatcher (grouped Pallas kernel on TPU); the adapter's
        # attn_mask is a per-batch key mask, exactly mha's contract
        ctx = mha(split(q), split(k), split(v), key_mask=attn_mask)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, d)
        x = x + _dn(ctx, layer["out"])
        y = _lnorm(x, layer["ffn_ln"])
        y = jax.nn.gelu(_dn(y, layer["fc1"]), approximate=False)
        x = x + _dn(y, layer["fc2"])
    if "final_ln" in params:
        x = _lnorm(x, params["final_ln"])
    return x


def apply(params, c: MulanConfig, tokens, struct_feats):
    """(B, T) tokens + (B, T, 7) angle features -> (B, T, V) logits."""
    attn_mask = tokens != esm2.ALPHABET.padding_idx
    cond = struct_embeddings(params["struct"], c, struct_feats, attn_mask)
    return esm2.apply(params["esm"], c.esm, tokens, extra_embedding=cond)


def build_struct_features(angles: np.ndarray) -> np.ndarray:
    """(L, <=7) angle matrix (radians; NaN already 182deg-filled) ->
    (L+2, 7) grid with 4.0 at flanks and ragged slots (dataset.py:132-147).
    """
    L = angles.shape[0]
    out = np.full((L + 2, STRUCT_DIM), PAD_VALUE, np.float32)
    k = min(angles.shape[1], STRUCT_DIM)
    out[1 : 1 + L, :k] = np.where(
        np.isnan(angles[:, :k]), NAN_FILL, angles[:, :k]
    )
    return out


def backbone_angle_features(coords: np.ndarray) -> np.ndarray:
    """phi/psi from the backbone (chi1-5 need side-chain atoms our PDB
    parser doesn't keep; they stay at the reference's NaN fill). The
    reference computes all 7 via biopython internal coords."""
    n, ca, cc = coords[:, 0], coords[:, 1], coords[:, 2]

    def dihedral(p0, p1, p2, p3):
        b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
        b1 = b1 / np.maximum(np.linalg.norm(b1, axis=-1, keepdims=True),
                             1e-9)
        v = b0 - (b0 * b1).sum(-1, keepdims=True) * b1
        w = b2 - (b2 * b1).sum(-1, keepdims=True) * b1
        x = (v * w).sum(-1)
        y = (np.cross(b1, v) * w).sum(-1)
        return np.arctan2(y, x)

    L = len(coords)
    ang = np.full((L, STRUCT_DIM), np.nan, np.float64)
    if L >= 2:
        ang[1:, 0] = dihedral(cc[:-1], n[1:], ca[1:], cc[1:])      # phi
        ang[:-1, 1] = dihedral(n[:-1], ca[:-1], cc[:-1], n[1:])    # psi
    return ang


def score_mutants(
    params,
    c: MulanConfig,
    sequence: str,
    angles: np.ndarray,
    mutants: Sequence[str],
    offset_idx: int = 1,
    batch_size: int = 8,
) -> np.ndarray:
    """Batched predict_mut (compute_fitness.py:27-77): mask token + angle
    row at each mutated position; score = sum log p(mt)/p(wt)."""
    import functools

    from proteingym_tpu.models.ar_scoring import stable_params_fn
    from proteingym_tpu.models.esm_scoring import _cached_jit

    A = esm2.ALPHABET
    base_tokens = A.tokenize(sequence)
    base_feats = build_struct_features(angles)
    T = len(base_tokens)

    fwd = _cached_jit(stable_params_fn(_apply_pair, c), "fwd_params")

    out = np.zeros(len(mutants))
    for s in range(0, len(mutants), batch_size):
        blk = mutants[s : s + batch_size]
        toks = np.tile(base_tokens[None], (len(blk), 1))
        feats = np.tile(base_feats[None], (len(blk), 1, 1))
        for bi, m in enumerate(blk):
            for tok in m.split(":"):
                pos = int(tok[1:-1]) - offset_idx + 1  # +1 for CLS
                if sequence[pos - 1] != tok[0]:
                    raise ValueError(f"WT mismatch in {tok}")
                toks[bi, pos] = A.mask_idx
                feats[bi, pos] = MASKED_ANGLE
        logits = fwd(params, (jnp.asarray(toks), jnp.asarray(feats)))
        probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))
        for bi, m in enumerate(blk):
            score = 0.0
            for tok in m.split(":"):
                wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx + 1, \
                    tok[-1]
                p_wt = probs[bi, pos, A.get_idx(wt)]
                p_mt = probs[bi, pos, A.get_idx(mt)]
                score += np.log(p_mt / max(p_wt, 1e-30))
            out[s + bi] = score
    return out


def _apply_pair(params, c: MulanConfig, pair):
    toks, feats = pair
    return apply(params, c, toks, feats)


def convert_torch_state_dict(sd, c: MulanConfig) -> Dict[str, Any]:
    """MULAN checkpoint (StructEsmForMaskedLM state dict) -> our pytree.
    Trunk keys follow HF modeling_esm under 'esm.'; the struct adapter
    lives at esm.embeddings.struct_embeddings.*."""

    def get(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    def dense(p):
        return {"kernel": get(f"{p}.weight").T, "bias": get(f"{p}.bias")}

    def ln(p):
        return {"scale": get(f"{p}.weight"), "bias": get(f"{p}.bias")}

    params = {
        "esm": esm2.convert_hf_esm_state_dict(sd, c.esm, prefix="esm."),
        "struct": {"mlp": dense("esm.embeddings.struct_embeddings.MLP"),
                   "layers": []},
    }
    se = "esm.embeddings.struct_embeddings.encoder"
    for i in range(c.struct_layers):
        p = f"{se}.layer.{i}"
        params["struct"]["layers"].append(
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
    if f"{se}.emb_layer_norm_after.weight" in sd:
        params["struct"]["final_ln"] = ln(f"{se}.emb_layer_norm_after")
    return params
