"""S2F/S3F-class: multi-scale sequence-structure fusion.

The reference (ref: proteingym/baselines/S3F/compute_fitness.py:1-150,
s3f/ — torchdrug GearNet + surface nets) fuses frozen ESM2-650M residue
embeddings with a GearNet structure encoder (S2F), plus a surface encoder
(S3F), and reads out per-position 20-way logits; S3F-MSA adds an MSA
retrieval prior.

Native rebuild:
  - structure encoder: GearNet-class RELATIONAL message passing over a
    residue graph with typed edges (sequential -2/-1/+1/+2 and spatial
    k-NN), one weight matrix per relation, relu + LN residual layers —
    dense (L, R, K, D) gathers instead of torch-scatter CUDA.
  - surface scale: the solvent-exposure proxy (models/rsalor.py RSA) is
    embedded and added as a third feature stream (the surface-net role).
  - fusion: concat [PLM embedding ; structure features ; surface embed]
    -> MLP -> (L, 20) log-softmax; fitness = sum logp[mt] - logp[wt].
  - S3F-MSA: optional blend with the alignment count prior
    (structure_plms.alignment_count_logits).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

AA20 = "ACDEFGHIKLMNPQRSTVWY"
NUM_RELATIONS = 5  # seq -2, -1, +1, +2, spatial knn


@dataclasses.dataclass(frozen=True)
class S3fConfig:
    plm_dim: int = 1280
    hidden_dim: int = 128
    num_layers: int = 3
    k_neighbors: int = 10
    use_surface: bool = True  # S3F; False -> S2F


def init_params(rng: jax.Array, c: S3fConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 4 + 2 * c.num_layers))

    def dense(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out), jnp.float32)
            * np.sqrt(2.0 / n_in),
            "b": jnp.zeros(n_out, jnp.float32),
        }

    params: Dict[str, Any] = {
        "node_in": dense(c.plm_dim, c.hidden_dim),
        "surface": dense(1, c.hidden_dim),
        "layers": [],
        "fuse": dense(c.plm_dim + c.hidden_dim, c.hidden_dim),
        "head": dense(c.hidden_dim, len(AA20)),
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                # one projection per relation type (GearNet's relational conv)
                "rel_w": jax.random.normal(
                    next(keys), (NUM_RELATIONS, c.hidden_dim, c.hidden_dim),
                    jnp.float32,
                ) * np.sqrt(2.0 / c.hidden_dim),
                "self_w": dense(c.hidden_dim, c.hidden_dim),
            }
        )
    return params


def _relational_neighbors(L: int, ca: jnp.ndarray, k: int):
    """(R, L, K) neighbor indices + (R, L, K) validity per relation."""
    from proteingym_tpu.ops.gnn import knn_graph

    idx = np.arange(L)
    rels, valid = [], []
    for off in (-2, -1, 1, 2):
        nb = np.clip(idx + off, 0, L - 1)
        ok = (idx + off >= 0) & (idx + off < L)
        rels.append(np.tile(nb[:, None], (1, k)))
        v = np.zeros((L, k), bool)
        v[:, 0] = ok
        valid.append(v)
    spatial = np.asarray(knn_graph(ca, k))
    spatial_valid = np.ones((L, k), bool)
    if spatial.shape[1] < k:  # tiny proteins: pad, but do NOT double-count
        pad_n = k - spatial.shape[1]
        spatial_valid[:, spatial.shape[1]:] = False
        pad = np.tile(spatial[:, :1], (1, pad_n))
        spatial = np.concatenate([spatial, pad], 1)
    rels.append(spatial)
    valid.append(spatial_valid)
    return jnp.asarray(np.stack(rels)), jnp.asarray(np.stack(valid))


def _ln(x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def logits(
    params,
    c: S3fConfig,
    plm_embeddings: jnp.ndarray,
    ca_coords: jnp.ndarray,
    rsa: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(L, plm_dim) + (L, 3) [+ (L,) RSA] -> (L, 20) log-probs."""
    L = plm_embeddings.shape[0]
    nbrs, valid = _relational_neighbors(L, ca_coords, c.k_neighbors)
    h = plm_embeddings @ params["node_in"]["w"] + params["node_in"]["b"]
    if c.use_surface and rsa is not None:
        h = h + (
            rsa[:, None] @ params["surface"]["w"] + params["surface"]["b"]
        )
    for layer in params["layers"]:
        msgs = []
        for r in range(NUM_RELATIONS):
            h_j = h[nbrs[r]]  # (L, K, D)
            m = jnp.where(valid[r][..., None], h_j, 0.0).sum(1)
            msgs.append(m @ layer["rel_w"][r])
        upd = sum(msgs) + (h @ layer["self_w"]["w"] + layer["self_w"]["b"])
        h = _ln(h + jax.nn.relu(upd))
    fused = jnp.concatenate([plm_embeddings, h], -1)
    z = jax.nn.relu(fused @ params["fuse"]["w"] + params["fuse"]["b"])
    return jax.nn.log_softmax(z @ params["head"]["w"] + params["head"]["b"], -1)


def score_mutants(
    params,
    c: S3fConfig,
    plm_embeddings: np.ndarray,
    coords: np.ndarray,
    sequence: str,
    mutants: Sequence[str],
    msa_sequences: Optional[Sequence[str]] = None,
    msa_alpha: float = 0.3,
    offset_idx: int = 1,
) -> np.ndarray:
    """MM-style readout; S3F-MSA blends the alignment prior."""
    from proteingym_tpu.models.rsalor import rsa_from_structure

    rsa = jnp.asarray(rsa_from_structure(coords)) if c.use_surface else None
    table = np.asarray(
        logits(params, c, jnp.asarray(plm_embeddings, jnp.float32),
               jnp.asarray(coords[:, 1], jnp.float32), rsa)
    )
    if msa_sequences:
        from proteingym_tpu.models.structure_plms import alignment_count_logits

        prior = alignment_count_logits(msa_sequences)
        table = (1 - msa_alpha) * table + msa_alpha * prior
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if not m or m.upper() == "WT":
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out
