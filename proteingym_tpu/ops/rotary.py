"""Rotary position embeddings (RoPE), ESM2 convention.

ESM2 applies rotary embeddings to Q and K per head with the
"rotate_half" formulation over an interleaved-free layout: the head dim is
split in halves [x1, x2] and rotated as (x1*cos - x2*sin, x2*cos + x1*sin)
(ref behavior: esm/rotary_embedding.py in the vendored ESM package used by
proteingym/baselines/esm/compute_fitness.py:349).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _cos_sin_cache(seq_len: int, dim: int, base: float = 10000.0):
    # host-side numpy so the cache never captures jit tracers; the arrays
    # become compile-time constants inside jit
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # (T, dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (T, dim)
    return np.cos(emb), np.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(q: jnp.ndarray, k: jnp.ndarray, base: float = 10000.0):
    """Apply RoPE to q, k of shape (..., T, H, D) along the T axis."""
    t = q.shape[-3]
    d = q.shape[-1]
    cos_np, sin_np = _cos_sin_cache(t, d, base)
    cos = jnp.asarray(cos_np)[:, None, :]  # (T, 1, D) broadcasting over heads
    sin = jnp.asarray(sin_np)[:, None, :]
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
