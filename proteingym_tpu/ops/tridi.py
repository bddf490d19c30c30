"""3Di-style structure tokens: geometric descriptors + VQ codebook.

Native replacement for the foldseek C++ binary the reference shells out to
(ref: saprot/foldseek_util.py, mulan/mulan/foldseek_utils.py; SURVEY.md
§2.3 "C++ 3Di-descriptor encoder (geometric feature -> 20-state VQ)").

Descriptor follows the foldseek 3Di construction (van Kempen et al.):
for each residue i, the interaction partner j is its nearest neighbor by
virtual-center distance; the descriptor couples the local backbone
geometry of i and j:

  u1 = cos(Ca_{i-1}->Ca_i, Ca_j->Ca_{j+1})     u4 = cos(Ca_{i-1}->Ca_i, Ca_i->Ca_j)
  u2 = cos(Ca_i->Ca_{i+1}, Ca_{j-1}->Ca_j)     u5 = cos(Ca_{j-1}->Ca_j, Ca_i->Ca_j)
  u3 = cos(Ca_{i-1}->Ca_i, Ca_{j-1}->Ca_j)     d  = |Ca_i - Ca_j| (clamped /20)
  plus clamped signed sequence offset features of (j - i)

States come from a 20-centroid VQ codebook over descriptors. Exact
foldseek tokens require foldseek's learned encoder; this module ships a
k-means trainer (``train_codebook``) and accepts external codebooks, so
models can be trained/evaluated end-to-end natively and published
codebooks plugged in for parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

TRIDI_VOCAB = "pynwrqhgdlvtmfsaeikc"  # foldseek's 20 3Di letters


def _unit(v, eps=1e-8):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + eps)


def virtual_center(ca: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Foldseek's virtual interaction center: Cb direction scaled from Ca."""
    return ca + 1.5 * (cb - ca)


def tridi_descriptors(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """coords: (L, 4, 3) N/Ca/C/O backbone -> ((L, 10) descriptors,
    (L,) partner indices)."""
    from proteingym_tpu.models.protein_mpnn import virtual_cb
    import jax.numpy as jnp

    L = coords.shape[0]
    ca = coords[:, 1]
    cb = np.asarray(virtual_cb(jnp.asarray(coords)))
    vc = virtual_center(ca, cb)

    d2 = ((vc[:, None] - vc[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    partner = d2.argmin(1)  # (L,)

    def seg(idx):
        prev_v = _unit(ca[idx] - ca[np.maximum(idx - 1, 0)])
        next_v = _unit(ca[np.minimum(idx + 1, L - 1)] - ca[idx])
        return prev_v, next_v

    prev_i, next_i = seg(np.arange(L))
    prev_j, next_j = seg(partner)
    rel = ca[partner] - ca
    rel_u = _unit(rel)

    u1 = (prev_i * next_j).sum(-1)
    u2 = (next_i * prev_j).sum(-1)
    u3 = (prev_i * prev_j).sum(-1)
    u4 = (prev_i * rel_u).sum(-1)
    u5 = (prev_j * rel_u).sum(-1)
    d = np.clip(np.linalg.norm(rel, axis=-1), 0, 20.0) / 20.0
    offset = partner - np.arange(L)
    f7 = np.clip(offset, -4, 4) / 4.0
    f8 = np.sign(offset)
    f9 = np.clip(np.abs(offset), 0, 16.0) / 16.0
    f10 = (next_i * next_j).sum(-1)
    return np.stack([u1, u2, u3, u4, u5, d, f7, f8, f9, f10], -1), partner


def train_codebook(
    descriptors: np.ndarray, k: int = 20, iters: int = 50, seed: int = 0
) -> np.ndarray:
    """k-means centroids over (N, 10) descriptors."""
    rs = np.random.RandomState(seed)
    x = np.asarray(descriptors, np.float64)
    centroids = x[rs.choice(len(x), k, replace=len(x) < k)]
    for _ in range(iters):
        d = ((x[:, None] - centroids[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            pts = x[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
    return centroids


def default_codebook(k: int = 20) -> np.ndarray:
    """Deterministic fallback codebook (trained on synthetic backbones) so
    tokenization works out of the box; replace with a published codebook
    for foldseek-parity tokens."""
    from proteingym_tpu.data.structures import synthetic_helix_backbone

    descs = []
    for seed in range(4):
        coords = synthetic_helix_backbone(64, seed=seed)
        coords = coords + np.random.RandomState(seed).randn(*coords.shape) * (
            0.3 * seed
        )
        descs.append(tridi_descriptors(coords)[0])
    return train_codebook(np.concatenate(descs), k=k, seed=0)


def structure_tokens(
    coords: np.ndarray, codebook: Optional[np.ndarray] = None
) -> np.ndarray:
    """(L, 4, 3) backbone -> (L,) 3Di state ids in [0, 20)."""
    if codebook is None:
        codebook = default_codebook()
    desc, _ = tridi_descriptors(coords)
    d = ((desc[:, None] - codebook[None]) ** 2).sum(-1)
    return d.argmin(1).astype(np.int32)


def structure_letters(coords: np.ndarray,
                      codebook: Optional[np.ndarray] = None) -> str:
    return "".join(TRIDI_VOCAB[t] for t in structure_tokens(coords, codebook))
