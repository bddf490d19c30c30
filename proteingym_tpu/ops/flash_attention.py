"""Fused multi-head attention Pallas kernel for TPU.

Replaces the reference's flash_attn CUDA kernels (PoET, ref
poet/models/modules/attention_flash.py:12-27) and accelerates every
transformer in the zoo (ESM2/MSA-T/Tranception/AR zoo).

Design (pallas_guide.md): grid over (batch*heads, q blocks); each program
loads its q block plus the full K/V rows into VMEM (protein contexts are
<= 2k tokens, so K/V fit comfortably: 2048 x 128 x 2B = 512 KB/head) and
computes a masked f32 softmax + two MXU matmuls in one fused kernel — no
(T, T) probability tensor ever round-trips through HBM, which is the
bandwidth win that matters at these lengths.

Supports: padding masks, causal masks, additive per-head key biases
(grouped ALiBi). Falls back to a pure-XLA einsum path off-TPU (and is
exercised in interpret mode in tests).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# measured on v5e at T=1024 (ESM2-650M window scoring): block_q 256 and
# 512 run ~14% faster than 128 (fewer programs, more MXU work per
# program); 256 keeps the f32 score block at 1 MB VMEM
DEFAULT_BLOCK_Q = 256
NEG_INF = -1e30

try:  # Pallas is TPU/interpret-only; import guarded for exotic builds
    from jax.experimental import pallas as pl

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False




def _attention_kernel(q_ref, k_ref, v_ref, kbias_ref, o_ref,
                      *, sm_scale: float, causal: bool, block_q: int):
    """One (head, q-block) program.

    q_ref: (1, block_q, D); k_ref/v_ref: (1, T, D); kbias_ref: (1, 8, T)
    f32 additive key bias with NEG_INF at padded keys (row 0 used; the
    sublane dim is 8 to satisfy TPU tiling); o_ref: (1, block_q, D).
    """
    # keep operands in their native (bf16) dtype on the MXU with f32
    # accumulation — an f32 x f32 matmul runs at HALF the MXU rate, and
    # the scale folds in after the accumulate (measured: the f32 variant
    # capped the kernel at ~0.45 MFU at T=1024)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (block_q, T) f32
    # key_bias row carries both the additive bias and the -inf padding mask
    scores = scores + kbias_ref[0, 0][None, :]
    if causal:
        i = pl.program_id(1)
        q_pos = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 0
        )
        k_pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(k_pos <= q_pos, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(denom, 1e-30)
    o = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q/k/v: (B, H, T, D); key_mask: (B, T) bool;
    bias: (H, T) additive key bias (ALiBi-style) or None.
    Returns (B, H, T, D) in q.dtype."""
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    t_pad = _round_up(t, block_q)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # fold padding mask + additive bias into one f32 key-bias row, laid out
    # (B*H, 8, T) so its block satisfies the (8, 128) TPU tile minimum
    if key_mask is None:
        key_mask = jnp.ones((b, t), bool)
    kmask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    kbias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)  # (B, T)
    kbias = jnp.broadcast_to(kbias[:, None, :], (b, h, t_pad))
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.float32), [(0, 0), (0, t_pad - t)])
        kbias = kbias + bias_p[None]
    kbias = jnp.broadcast_to(
        kbias.reshape(b * h, 1, t_pad), (b * h, 8, t_pad)
    )

    qf = q.reshape(b * h, t_pad, d)
    kf = k.reshape(b * h, t_pad, d)
    vf = v.reshape(b * h, t_pad, d)

    grid = (b * h, t_pad // block_q)
    kernel = functools.partial(
        _attention_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, t_pad, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, t_pad, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, 8, t_pad), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i: (g, i, 0)),
        interpret=interpret,
    )(qf, kf, vf, kbias)
    return out.reshape(b, h, t_pad, d)[:, :, :t]


def reference_mha(
    q, k, v, key_mask=None, bias=None, causal=False, sm_scale=None
):
    """Pure-XLA reference path (also the non-TPU fallback)."""
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # bf16 operands on the MXU with f32 accumulation (softmax stays f32)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if bias is not None:
        scores = scores + bias[None, :, None, :]
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, NEG_INF)
    if causal:
        cm = jnp.tril(jnp.ones((t, t), bool))
        scores = jnp.where(cm[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


# Below this many key/value positions XLA's fused attention beats the
# Pallas flash kernel (measured on v5e: 113 vs 94 TFLOP/s at T=252 on
# ESM2-650M); flash attention pays off where memory, not math, binds.
# 512 keeps the XLA path's materialized (B, H, T, T) f32 score tensor
# under ~0.7 GB at B=32/H=20 — above that the flash kernel's O(T*block)
# footprint wins even though it is a little slower per FLOP.
FLASH_MIN_SEQ_LEN = 512


def mha(q, k, v, key_mask=None, bias=None, causal=False, sm_scale=None):
    """Dispatch: Pallas flash kernel on TPU for long sequences, XLA
    attention otherwise."""
    if (
        _HAVE_PALLAS
        and jax.default_backend() == "tpu"
        and q.shape[2] >= FLASH_MIN_SEQ_LEN
    ):
        return flash_mha(
            q, k, v, key_mask=key_mask, bias=bias, causal=causal,
            sm_scale=sm_scale, block_q=DEFAULT_BLOCK_Q,
        )
    return reference_mha(
        q, k, v, key_mask=key_mask, bias=bias, causal=causal, sm_scale=sm_scale
    )
