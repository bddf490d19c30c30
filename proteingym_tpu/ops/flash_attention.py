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

import contextlib
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


def _rope_in_kernel(x, cos, sin, perm):
    """rotate_half RoPE on a (G, T, D) VMEM block.

    rotate_half is a signed half-swap along the LANE (minor) dim; slicing
    and concatenating there generates per-element lane shuffles, so it is
    computed instead as a (D, D) signed-permutation matmul on the MXU
    (``perm``), leaving only fusable elementwise multiplies."""
    xf = x.astype(jnp.float32)
    rot = jax.lax.dot_general(
        xf, perm, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (xf * cos[None] + rot * sin[None]).astype(x.dtype)


def _rope_perm(d: int) -> np.ndarray:
    """(D, D) matrix with x @ P == concat([-x2, x1], -1)."""
    half = d // 2
    p = np.zeros((d, d), np.float32)
    for m in range(half):
        p[m + half, m] = -1.0
        p[m, m + half] = 1.0
    return p


def _grouped_attention_kernel(q_ref, k_ref, v_ref, kbias_ref, cos_ref,
                              sin_ref, perm_ref, *rest, sm_scale: float,
                              causal: bool, rope: bool,
                              segmented: bool = False):
    """One program = G whole (batch*head) attention problems.

    q/k/v_ref: (G, T, D); kbias_ref: (G, 8, T) f32 additive key bias with
    NEG_INF at padded keys (row 0 used); cos/sin_ref: (T, D) f32 RoPE
    tables (applied in VMEM when ``rope`` — the in-graph rotary's
    elementwise HBM passes cost ~23% of an ESM2-650M forward at T=256);
    o_ref: (G, T, D).

    Protein contexts are short (T <= ~1k), so per-head matmuls are far too
    small to amortize per-program overhead — grouping G heads per program
    is what makes the kernel pay off; the whole-T f32 scores block lives
    in VMEM and never touches HBM.

    With ``segmented``, ``rest`` is (seg_ref, o_ref) where seg_ref is a
    (G, 8, T) f32 segment-id map (row 0 used, 0 = padding): attention is
    restricted block-diagonally to same-segment (q, k) pairs, which packs
    independent sequences into one row. RoPE stays correct under packing
    with GLOBAL row positions because rotary attention only sees position
    DIFFERENCES (R(a)^T R(b) = R(b-a)) and cross-segment pairs are
    masked.
    """
    if segmented:
        seg_ref, o_ref = rest
    else:
        (o_ref,) = rest
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    if rope:
        cos = cos_ref[...]
        sin = sin_ref[...]
        perm = perm_ref[...]
        q = _rope_in_kernel(q, cos, sin, perm)
        k = _rope_in_kernel(k, cos, sin, perm)
    # batched over G on the MXU, bf16 operands with f32 accumulation
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # (G, T, T) f32
    scores = scores + kbias_ref[:, 0][:, None, :]
    if segmented:
        seg = seg_ref[:, 0]  # (G, T)
        same = seg[:, :, None] == seg[:, None, :]
        # NEG_INF is finite, so a fully-masked row (a padding q position:
        # its keys are all kbias-masked too) still softmaxes to a uniform
        # distribution instead of NaN; those outputs are never consumed
        scores = jnp.where(same, scores, NEG_INF)
    if causal:
        t = scores.shape[-1]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        scores = jnp.where((k_pos <= q_pos)[None], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(denom, 1e-30)
    o = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


# VMEM budget for one program's f32 score block (G * T * T * 4 bytes);
# G adapts down at long T. The scoped-vmem limit is 16 MB and Pallas
# double-buffers the q/k/v/kbias input blocks, so 5 MB of scores keeps
# the total comfortably under it (an 8 MB budget OOMed at T=512, G=8:
# 16.4 MB scoped allocation).
_SCORES_VMEM_BUDGET = 5 << 20
_GROUP_MAX = 16


def grouped_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    rope_base: Optional[float] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grouped-heads fused attention for short contexts. q/k/v:
    (B, H, T, D); scores never touch HBM. With ``rope_base``, q/k arrive
    UNROTATED and RoPE applies inside the kernel (fused, zero extra HBM
    passes). ``segment_ids`` (B, T) int, 0 = padding: block-diagonal
    attention for rows packing several independent sequences.
    Returns (B, H, T, D)."""
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    t_pad = _round_up(t, 128)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

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
    if segment_ids is not None:
        seg = jnp.pad(segment_ids.astype(jnp.float32),
                      [(0, 0), (0, t_pad - t)])  # pad -> segment 0
        seg = jnp.broadcast_to(seg[:, None, :], (b, h, t_pad))
        seg = jnp.broadcast_to(
            seg.reshape(b * h, 1, t_pad), (b * h, 8, t_pad)
        )

    bh = b * h
    g = min(_GROUP_MAX, max(1, _SCORES_VMEM_BUDGET // (t_pad * t_pad * 4)))
    while bh % g:
        g -= 1

    qf = q.reshape(bh, t_pad, d)
    kf = k.reshape(bh, t_pad, d)
    vf = v.reshape(bh, t_pad, d)
    if rope_base is not None:
        from proteingym_tpu.ops.rotary import _cos_sin_cache

        cos_np, sin_np = _cos_sin_cache(t_pad, d, rope_base)
        cos = jnp.asarray(cos_np)
        sin = jnp.asarray(sin_np)
    else:
        cos = jnp.zeros((t_pad, d), jnp.float32)
        sin = jnp.zeros((t_pad, d), jnp.float32)
    perm = jnp.asarray(_rope_perm(d))
    kernel = functools.partial(
        _grouped_attention_kernel, sm_scale=sm_scale, causal=causal,
        rope=rope_base is not None, segmented=segment_ids is not None,
    )
    in_specs = [
        pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, 8, t_pad), lambda i: (i, 0, 0)),
        pl.BlockSpec((t_pad, d), lambda i: (0, 0)),
        pl.BlockSpec((t_pad, d), lambda i: (0, 0)),
        pl.BlockSpec((d, d), lambda i: (0, 0)),
    ]
    operands = [qf, kf, vf, kbias, cos, sin, perm]
    if segment_ids is not None:
        in_specs.append(pl.BlockSpec((g, 8, t_pad), lambda i: (i, 0, 0)))
        operands.append(seg)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        grid=(bh // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, t_pad, d)[:, :, :t]


def reference_mha(
    q, k, v, key_mask=None, bias=None, causal=False, sm_scale=None,
    segment_ids=None,
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
    if segment_ids is not None:
        same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        scores = jnp.where(same, scores, NEG_INF)
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
# Up to this context length the grouped whole-T kernel applies (its f32
# score block fits VMEM even at G=1); beyond, the q-blocked flash kernel
# takes over. XLA's attention materializes the (B, H, T, T) scores in
# HBM, which the grouped kernel avoids at EVERY length — measured 34% of
# ESM2-650M forward wall time at T=256 and ~50% at T=416.
GROUPED_MAX_SEQ_LEN = 1024


# Tensor-parallel meshes shard attention heads across devices; a Pallas
# custom call cannot be partitioned by XLA, so sharded apply fns trace
# under force_xla_attention() and take the partitionable einsum path.
_FORCE_XLA = False


@contextlib.contextmanager
def force_xla_attention():
    global _FORCE_XLA
    old = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = old


def _apply_rope_bhtd(q, k, rope_base):
    """In-graph RoPE for (B, H, T, D) tensors (non-kernel paths), with
    rotate_half as a signed-permutation matmul (fusable; the slice+concat
    form materializes f32 intermediates in HBM)."""
    from proteingym_tpu.ops.rotary import _cos_sin_cache

    t, d = q.shape[2], q.shape[3]
    cos_np, sin_np = _cos_sin_cache(t, d, rope_base)
    cos = jnp.asarray(cos_np)[None, None]
    sin = jnp.asarray(sin_np)[None, None]
    perm = jnp.asarray(_rope_perm(d), q.dtype)

    def rot(x):
        r = jnp.einsum("bhtd,de->bhte", x, perm,
                       preferred_element_type=jnp.float32)
        return (x * cos + r * sin).astype(x.dtype)

    return rot(q), rot(k)


def mha(q, k, v, key_mask=None, bias=None, causal=False, sm_scale=None,
        rope_base=None, segment_ids=None):
    """Dispatch: grouped-heads fused kernel on TPU up to
    GROUPED_MAX_SEQ_LEN, q-blocked flash kernel beyond, XLA elsewhere.

    With ``rope_base``, q/k arrive UNROTATED; the grouped kernel fuses
    RoPE in VMEM and the other paths apply it in-graph. ``segment_ids``
    (B, T) int, 0 = padding: block-diagonal attention for packed rows
    (grouped-kernel and XLA paths; the q-blocked flash kernel does not
    support it, so longer segmented rows fall back to XLA)."""
    if _HAVE_PALLAS and not _FORCE_XLA and jax.default_backend() == "tpu":
        if q.shape[2] <= GROUPED_MAX_SEQ_LEN:
            return grouped_mha(
                q, k, v, key_mask=key_mask, bias=bias, causal=causal,
                sm_scale=sm_scale, rope_base=rope_base,
                segment_ids=segment_ids,
            )
        if segment_ids is None:
            if rope_base is not None:
                q, k = _apply_rope_bhtd(q, k, rope_base)
            return flash_mha(
                q, k, v, key_mask=key_mask, bias=bias, causal=causal,
                sm_scale=sm_scale, block_q=DEFAULT_BLOCK_Q,
            )
    if rope_base is not None:
        q, k = _apply_rope_bhtd(q, k, rope_base)
    return reference_mha(
        q, k, v, key_mask=key_mask, bias=bias, causal=causal,
        sm_scale=sm_scale, segment_ids=segment_ids
    )
