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
import os
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
    from jax.experimental.pallas import tpu as pltpu

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
    # the softmax scale folds into q: one (block_q, D) pass instead of a
    # (block_q, T) pass over the scores block
    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, T) f32
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
    # deferred normalization: divide the (block_q, D) output instead of
    # the (block_q, T) probs (same bf16 rounding point as normalizing e)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(denom, 1e-30)
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


def _grouped_attention_kernel(q_ref, k_ref, v_ref, kbias_ref, *rest,
                              causal: bool, rope: bool,
                              segmented: bool = False,
                              skip_kbias: bool = False,
                              mask_only: bool = False):
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

    ``rest`` holds the CONDITIONAL operands in order: (cos_ref, sin_ref,
    perm_ref) when ``rope`` (streaming zero tables into every program
    costs real HBM/VMEM traffic, so non-RoPE callers omit them), then
    seg_ref when ``segmented`` — a (G or 1, 8, T) f32 segment-id map
    (row 0 used, 0 = padding): attention is restricted block-diagonally
    to same-segment (q, k) pairs, which packs independent sequences into
    one row. RoPE stays correct under packing with GLOBAL row positions
    because rotary attention only sees position DIFFERENCES
    (R(a)^T R(b) = R(b-a)) and cross-segment pairs are masked. The last
    element of ``rest`` is always o_ref.
    """
    rest = list(rest)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    if rope:
        cos_ref, sin_ref, perm_ref = rest[:3]
        del rest[:3]
        cos = cos_ref[...]
        sin = sin_ref[...]
        perm = perm_ref[...]
        q = _rope_in_kernel(q, cos, sin, perm)
        k = _rope_in_kernel(k, cos, sin, perm)
    if segmented:
        seg_ref = rest.pop(0)
    (o_ref,) = rest
    # NOTE: the caller (grouped_mha) has already folded the softmax scale
    # into q — no (G, T, T) scale pass here
    # batched over G on the MXU, bf16 operands with f32 accumulation
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, T, T) f32
    if segmented:
        seg = seg_ref[:, 0]  # (G, T)
        same = seg[:, :, None] == seg[:, None, :]
        # NEG_INF is finite, so a fully-masked q row (padding) still
        # produces finite outputs (zeros); those are never consumed
        scores = jnp.where(same, scores, NEG_INF)
    if skip_kbias:
        pass  # pads are segment 0 (or no mask/bias at all): nothing to fold
    elif mask_only:
        # pure padding mask (kbias rows are {0, NEG_INF}): a select is
        # one pass and keeps masked keys out of the row max (they could
        # otherwise anchor it high enough to underflow the denominator).
        # where-on-scores is the same proven-to-compile pattern as the
        # causal/segment selects below.
        scores = jnp.where(
            kbias_ref[:, 0][:, None, :] < -1.0, NEG_INF, scores
        )
    else:
        # real additive bias (pad mask + ALiBi) MUST join before the row
        # max: grouped-ALiBi biases are nonnegative and grow with key
        # position (tranception.alibi_bias = slope*k), so a deferred add
        # inside exp overflows f32 beyond ~180 tokens. The bias folds in
        # via the `scores - m0 + kbias` chain — the exact elementwise
        # pattern the previous kernel compiled inside exp — rather than a
        # bare add on the dot output, which Mosaic has historically
        # miscompiled ("limits[i] <= dim(i)" check failure). Softmax
        # shift invariance makes the m0 shift a no-op.
        m0 = jnp.max(scores, axis=-1, keepdims=True)
        scores = scores - m0 + kbias_ref[:, 0][:, None, :]
    if causal:
        t = scores.shape[-1]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        scores = jnp.where((k_pos <= q_pos)[None], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # deferred normalization: divide the (G, T, D) output instead of the
    # (G, T, T) probs (same bf16 rounding point as normalizing e).
    # NOTE (r5, measured): computing the denominator on the MXU (dot
    # with an all-ones (T, 8) operand, exp written straight to bf16) is
    # 4% SLOWER end-to-end at T=1024 — the extra dot's operand streaming
    # outweighs the saved VPU row-sum, i.e. Mosaic already overlaps
    # these passes well. Keep the straightforward form.
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(denom, 1e-30)
    o_ref[...] = o.astype(o_ref.dtype)


# VMEM budget for one program's f32 score block (G * T * T * 4 bytes);
# G adapts down at long T. The scoped-vmem limit is 16 MB and Pallas
# double-buffers the q/k/v/kbias input blocks, so 5 MB of scores keeps
# the total comfortably under it (an 8 MB budget OOMed at T=512, G=8:
# 16.4 MB scoped allocation).
_SCORES_VMEM_BUDGET = int(os.environ.get(
    "PGYM_ATTN_SCORES_VMEM", 5 << 20))
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
    group_size: Optional[int] = None,
) -> jnp.ndarray:
    """Grouped-heads fused attention for short contexts. q/k/v:
    (B, H, T, D); scores never touch HBM. With ``rope_base``, q/k arrive
    UNROTATED and RoPE applies inside the kernel (fused, zero extra HBM
    passes). ``segment_ids`` (B, T) int, 0 = padding: block-diagonal
    attention for rows packing several independent sequences; every
    position masked by ``key_mask`` must then be segment 0 (the kernel
    folds the padding mask into the segment select when ``bias`` is
    None). ``group_size`` overrides the VMEM-budget G heuristic (must
    divide B*H). Returns (B, H, T, D)."""
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # fold the softmax scale into q HERE (fuses into the pad/reshape
    # copies XLA already performs): one (B, H, T, D) pass instead of a
    # (G, T, T) pass over the scores block in the kernel. Linearity of
    # RoPE makes this valid in the rotated path too. Folding inside the
    # kernel instead miscompiles (Mosaic "limits[i] <= dim(i)" check
    # failure when combined with the kbias broadcast add). Callers that
    # pre-scale q at the projection epilogue (esm2._attention — there
    # the multiply fuses into the matmul output for FREE) pass
    # sm_scale=1.0, which skips the pass entirely.
    if sm_scale != 1.0:
        q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    t_pad = _round_up(t, 128)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    bh = b * h
    if group_size is not None:
        g = group_size
        if bh % g:
            raise ValueError(f"group_size {g} must divide B*H={bh}")
    else:
        g = min(_GROUP_MAX, max(1, _SCORES_VMEM_BUDGET // (t_pad * t_pad * 4)))
        while bh % g:
            g -= 1

    if key_mask is None:
        key_mask = jnp.ones((b, t), bool)
    kmask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    kbias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)  # (B, T)
    # when every program's G rows live inside ONE batch row (g | h) and
    # there is no per-head bias, the key bias and segment map are
    # PER-BATCH (B, 8, T) operands instead of per-(batch*head)
    # (B*H, 8, T): 20x less HBM build+stream traffic at H=20
    per_batch_aux = bias is None and h % g == 0
    if per_batch_aux:
        kbias = jnp.broadcast_to(kbias[:, None, :], (b, 8, t_pad))
    else:
        kbias = jnp.broadcast_to(kbias[:, None, :], (b, h, t_pad))
        if bias is not None:
            bias_p = jnp.pad(
                bias.astype(jnp.float32), [(0, 0), (0, t_pad - t)]
            )
            kbias = kbias + bias_p[None]
        kbias = jnp.broadcast_to(
            kbias.reshape(b * h, 1, t_pad), (b * h, 8, t_pad)
        )
    if segment_ids is not None:
        seg = jnp.pad(segment_ids.astype(jnp.float32),
                      [(0, 0), (0, t_pad - t)])  # pad -> segment 0
        if per_batch_aux:
            seg = jnp.broadcast_to(seg[:, None, :], (b, 8, t_pad))
        else:
            seg = jnp.broadcast_to(seg[:, None, :], (b, h, t_pad))
            seg = jnp.broadcast_to(
                seg.reshape(b * h, 1, t_pad), (b * h, 8, t_pad)
            )

    qf = q.reshape(bh, t_pad, d)
    kf = k.reshape(bh, t_pad, d)
    vf = v.reshape(bh, t_pad, d)
    kernel = functools.partial(
        _grouped_attention_kernel, causal=causal,
        rope=rope_base is not None, segmented=segment_ids is not None,
        # with segments and no additive bias, the kbias padding mask is
        # redundant: pads are segment 0, so every real q excludes them
        # via the same-segment select (skips a whole (G, T, T) pass)
        skip_kbias=segment_ids is not None and bias is None,
        # no ALiBi: the padding mask folds in as a one-pass select
        # instead of the bias-add chain
        mask_only=segment_ids is None and bias is None,
    )
    if per_batch_aux:
        # one (1, 8, T) block per program, indexed by its batch row
        aux_spec = pl.BlockSpec(
            (1, 8, t_pad), lambda i: ((i * g) // h, 0, 0)
        )
    else:
        aux_spec = pl.BlockSpec((g, 8, t_pad), lambda i: (i, 0, 0))
    in_specs = [
        pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0)),
        aux_spec,
    ]
    operands = [qf, kf, vf, kbias]
    if rope_base is not None:
        from proteingym_tpu.ops.rotary import _cos_sin_cache

        cos_np, sin_np = _cos_sin_cache(t_pad, d, rope_base)
        in_specs += [
            pl.BlockSpec((t_pad, d), lambda i: (0, 0)),
            pl.BlockSpec((t_pad, d), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
        ]
        operands += [jnp.asarray(cos_np), jnp.asarray(sin_np),
                     jnp.asarray(_rope_perm(d))]
    if segment_ids is not None:
        in_specs.append(aux_spec)
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


# ---------------------------------------------------------------------------
# Heads-mid (B, T, H, D) grouped attention — transpose-free kernel boundary
# ---------------------------------------------------------------------------

# max context for the heads-mid kernel: beyond this the whole-T K/V
# blocks (double-buffered) plus the f32 scores block exceed scoped VMEM
BTHD_MAX_SEQ_LEN = 512


def _bthd_attention_kernel(q_ref, k_ref, v_ref, kbias_ref, *rest,
                           causal: bool, rope: bool, segmented: bool,
                           skip_kbias: bool, bq: int):
    """One program = one batch row x one q block, ALL H heads.

    The natural layout out of the QKV projections is (B, T, H, D) — a
    free reshape of the (B, T, H*D) matmul output. The standard kernel
    wants (B, H, T, D), which costs four materialized HBM transposes per
    layer around the custom call (q/k/v in, ctx out). This kernel
    consumes (B, T, H, D) directly and moves heads-major in VMEM
    (~22x HBM bandwidth) instead.

    q_ref: (1, BQ, H, D) PRE-SCALED; k/v_ref: (1, T, H, D);
    kbias_ref/seg_ref: (1, 8, T) per-batch f32; ``rest`` holds the
    conditional operands (cos_ref, sin_ref, perm_ref) when ``rope``,
    then seg_ref when ``segmented``, then o_ref (1, BQ, H, D).
    """
    rest = list(rest)
    qb = pl.program_id(1)
    q = jnp.swapaxes(q_ref[0], 0, 1)  # (H, BQ, D) in VMEM
    k = jnp.swapaxes(k_ref[0], 0, 1)  # (H, T, D)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    if rope:
        cos_ref, sin_ref, perm_ref = rest[:3]
        del rest[:3]
        perm = perm_ref[...]
        # slice the REFS (Mosaic lowers pl.ds ref reads; dynamic_slice on
        # loaded values is unimplemented in the TC lowering)
        cos_q = cos_ref[pl.ds(qb * bq, bq), :]
        sin_q = sin_ref[pl.ds(qb * bq, bq), :]
        q = _rope_in_kernel(q, cos_q, sin_q, perm)
        k = _rope_in_kernel(k, cos_ref[...], sin_ref[...], perm)
    if segmented:
        seg_ref = rest.pop(0)
    (o_ref,) = rest
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, BQ, T) f32
    if segmented:
        seg = seg_ref[0, 0]  # (T,)
        qseg = seg_ref[0, 0, pl.ds(qb * bq, bq)]
        scores = jnp.where(
            (qseg[:, None] == seg[None, :])[None], scores, NEG_INF
        )
    if not (segmented and skip_kbias):
        # the padding mask must participate in the row max or masked
        # keys can anchor m high enough to underflow the denominator;
        # this kernel never carries an additive bias, so a one-pass
        # select suffices (same rationale as the grouped kernel's
        # mask_only path)
        scores = jnp.where(
            kbias_ref[0, 0][None, None, :] < -1.0, NEG_INF, scores
        )
    if causal:
        t = scores.shape[-1]
        q_pos = qb * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
        scores = jnp.where((k_pos <= q_pos)[None], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(denom, 1e-30)  # (H, BQ, D)
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)


# Per-program VMEM budget for the heads-mid kernel (all H heads live in
# one program, so the q-block length adapts instead of G). Unlike the
# (B, H, T, D) kernel, a scores-only budget is NOT enough here: the
# on-device failure mode (v5e, scoped-vmem limit 16 MB) was a 16.6 MB
# allocation at bq=128, T=256, H=20, D=64 with only 5.2 MB of scores —
# the full-T k/v blocks (double-buffered), their in-kernel swapaxes
# copies and the f32 RoPE temporaries dominate. _bthd_block_q models the
# whole working set, with a 1.25x factor for Mosaic tile padding
# ((H, 64) trailing dims pad to (16k, 128) tiles), calibrated so the
# model predicts ~16.6 MB at the measured OOM point. The target leaves
# headroom for the CALLER's loop context too: the same kernel that
# compiles standalone at bq=64 (T=256, H=20) hits 16.05 MB inside a
# lax.scan body, where XLA stacks the surrounding fusion's buffers on
# the same scoped allocation.
_BTHD_VMEM_TARGET = 11 << 20


def _bthd_block_q(t_pad: int, h: int, d: int, itemsize: int) -> int:
    """Largest 32-multiple q-block length whose modeled per-program VMEM
    stays under _BTHD_VMEM_TARGET; 0 when even bq=32 cannot fit (full-T
    k/v residency alone exceeds the budget — long T needs the (B,H,T,D)
    kernel or a streaming variant)."""
    pad = 1.25
    # resident regardless of bq: k+v blocks (x2 double-buffer), their
    # swapaxes copies, and the f32 RoPE temp on k
    fixed = (2 * t_pad * h * d * itemsize) * 2
    fixed += 2 * t_pad * h * d * itemsize
    fixed += t_pad * h * d * 4
    # proportional to bq: q/out blocks (x2 double-buffer), q swap copy,
    # f32 RoPE temp on q, f32 scores + exp, f32 output accumulator
    per_bq = 2 * (h * d * itemsize) * 2
    per_bq += h * d * itemsize + h * d * 4
    per_bq += 2 * h * t_pad * 4
    per_bq += h * d * 4
    room = _BTHD_VMEM_TARGET / pad - fixed
    bq = int(room // per_bq) // 32 * 32
    return max(0, min(bq, t_pad))


def grouped_mha_bthd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    rope_base: Optional[float] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    block_q: Optional[int] = None,
) -> jnp.ndarray:
    """Heads-mid grouped attention: q/k/v AND the result are
    (B, T, H, D) — the natural layout around the QKV/out projections —
    so no HBM transposes surround the kernel call. Per-head additive
    bias (ALiBi) is NOT supported here (those callers keep the
    (B, H, T, D) kernel). Returns (B, T, H, D).

    Measured on-device (v5e, ESM2-650M shapes, bench ``attn`` stage):
    LOSES to transpose + ``grouped_mha`` — 4.49 vs 1.96 ms/call at
    T=256, and the full-T all-heads k/v residency cannot fit scoped
    VMEM at T=512 at all. The transposes this layout avoids are far
    cheaper than its costs (tiny bq=32 q-blocks, (H, 64) trailing-dim
    tile padding). Kept as a tested opt-in for re-measurement on other
    TPU generations, not a production path."""
    b, t, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    t_pad = _round_up(t, 128)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    if key_mask is None:
        key_mask = jnp.ones((b, t), bool)
    kmask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    kbias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias[:, None, :], (b, 8, t_pad))
    if segment_ids is not None:
        seg = jnp.pad(segment_ids.astype(jnp.float32),
                      [(0, 0), (0, t_pad - t)])
        seg = jnp.broadcast_to(seg[:, None, :], (b, 8, t_pad))

    if block_q is None:
        bq = _bthd_block_q(t_pad, h, d, q.dtype.itemsize)
        if bq == 0 and not interpret:
            raise ValueError(
                f"grouped_mha_bthd: full-T k/v residency for T={t} H={h} "
                f"D={d} exceeds the scoped-VMEM budget; use mha/grouped_mha"
            )
        bq = max(32, bq)
    else:
        bq = block_q
    # keep bq a 32-multiple that divides t_pad (t_pad is a 128-multiple,
    # so 32 always terminates the walk)
    bq = max(32, min(bq, t_pad) // 32 * 32)
    while t_pad % bq:
        bq -= 32
    n_qb = t_pad // bq

    kernel = functools.partial(
        _bthd_attention_kernel, causal=causal,
        rope=rope_base is not None, segmented=segment_ids is not None,
        skip_kbias=segment_ids is not None, bq=bq,
    )
    aux_spec = pl.BlockSpec((1, 8, t_pad), lambda bi, qb: (bi, 0, 0))
    in_specs = [
        pl.BlockSpec((1, bq, h, d), lambda bi, qb: (bi, qb, 0, 0)),
        pl.BlockSpec((1, t_pad, h, d), lambda bi, qb: (bi, 0, 0, 0)),
        pl.BlockSpec((1, t_pad, h, d), lambda bi, qb: (bi, 0, 0, 0)),
        aux_spec,
    ]
    operands = [q, k, v, kbias]
    if rope_base is not None:
        from proteingym_tpu.ops.rotary import _cos_sin_cache

        cos_np, sin_np = _cos_sin_cache(t_pad, d, rope_base)
        in_specs += [
            pl.BlockSpec((t_pad, d), lambda bi, qb: (0, 0)),
            pl.BlockSpec((t_pad, d), lambda bi, qb: (0, 0)),
            pl.BlockSpec((d, d), lambda bi, qb: (0, 0)),
        ]
        operands += [jnp.asarray(cos_np), jnp.asarray(sin_np),
                     jnp.asarray(_rope_perm(d))]
    if segment_ids is not None:
        in_specs.append(aux_spec)
        operands.append(seg)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, h, d), q.dtype),
        grid=(b, n_qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, h, d), lambda bi, qb: (bi, qb, 0, 0)),
        interpret=interpret,
    )(*operands)
    return out[:, :t]


# ---------------------------------------------------------------------------
# Extent-sparse segmented flash attention (packed rows)
# ---------------------------------------------------------------------------

SEG_BLOCK = 128  # q/k tile edge for the extent-sparse segmented kernel


def _seg_block_kernel(lo_ref, hi_ref, seg_ref, q_ref, k_ref, v_ref, o_ref):
    """One program = one (row, head-group, q-block) flash problem that
    only visits the key blocks its segments overlap.

    Packed rows hold several short independent segments, so masked-dense
    attention wastes most of its (T, T) scores on cross-segment tiles
    that the mask zeroes anyway. Per q block, [lo, hi) bounds (in
    SEG_BLOCK units, precomputed in-graph) cover every key block sharing
    a segment with the block's queries; the kernel streams exactly those
    tiles with an online-softmax accumulator (same recurrence as flash
    attention) and skips the rest — compute scales with sum(L_s * L_s)
    instead of T**2.

    lo/hi_ref: (B, nQB) i32 SMEM, passed WHOLE (TPU SMEM blocks must
    keep the full leading dim) and indexed by program ids; seg_ref:
    (1, 8, T) f32 (row 0 used, 0 = padding); q_ref: (1, HG, BQ, D)
    PRE-SCALED and PRE-ROTATED; k/v_ref: (1, HG, T, D);
    o_ref: (1, HG, BQ, D).
    """
    bi = pl.program_id(0)
    qb = pl.program_id(2)
    lo = lo_ref[bi, qb]
    hi = hi_ref[bi, qb]
    q = q_ref[0]  # (HG, BQ, D)
    hg, bq, d = q.shape
    qseg = seg_ref[0, 0, pl.ds(qb * bq, bq)]  # (BQ,)

    def body(jb, carry):
        m, denom, acc = carry
        k_t = k_ref[0, :, pl.ds(jb * SEG_BLOCK, SEG_BLOCK), :]
        v_t = v_ref[0, :, pl.ds(jb * SEG_BLOCK, SEG_BLOCK), :]
        kseg = seg_ref[0, 0, pl.ds(jb * SEG_BLOCK, SEG_BLOCK)]
        s = jax.lax.dot_general(
            q, k_t, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HG, BQ, BK)
        same = (qseg[:, None] == kseg[None, :])[None]
        s = jnp.where(same, s, NEG_INF)
        m_t = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_t)
        alpha = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[..., None])
        denom = denom * alpha + jnp.sum(e, axis=-1)
        acc = acc * alpha[..., None] + jax.lax.dot_general(
            e.astype(v_t.dtype), v_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, denom, acc

    m0 = jnp.full((hg, bq), NEG_INF, jnp.float32)
    d0 = jnp.zeros((hg, bq), jnp.float32)
    a0 = jnp.zeros((hg, bq, d), jnp.float32)
    # dynamic-bound loop: blocks outside [lo, hi) are never visited at
    # all (no cond, no wasted MXU/VPU pass) — compute scales with the
    # per-q-block extent instead of T
    _, denom, acc = jax.lax.fori_loop(lo, hi, body, (m0, d0, a0))
    o_ref[0] = (acc / jnp.maximum(denom, 1e-30)[..., None]).astype(
        o_ref.dtype
    )


def _segment_block_extents(segment_ids: jnp.ndarray, n_qb: int):
    """(B, T) contiguous segment ids -> per-q-block key-block extents
    [lo, hi) in SEG_BLOCK units (both (B, nQB) i32), computed in-graph
    (a few cumulative ops — negligible next to the attention itself)."""
    b, t = segment_ids.shape
    seg = segment_ids.astype(jnp.int32)
    idx = jnp.arange(t, dtype=jnp.int32)[None]
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1
    )
    start_tok = jax.lax.cummax(jnp.where(is_start, idx, 0), axis=1)
    is_end = jnp.concatenate(
        [seg[:, 1:] != seg[:, :-1], jnp.ones((b, 1), bool)], axis=1
    )
    end_rev = jax.lax.cummax(
        jnp.where(is_end, t - 1 - idx, 0)[:, ::-1], axis=1
    )[:, ::-1]
    end_tok = t - 1 - end_rev
    lo = jnp.min(
        start_tok.reshape(b, n_qb, SEG_BLOCK), axis=-1
    ) // SEG_BLOCK
    hi = jnp.max(end_tok.reshape(b, n_qb, SEG_BLOCK), axis=-1) // SEG_BLOCK + 1
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def seg_block_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,
    sm_scale: Optional[float] = None,
    rope_base: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Extent-sparse block-diagonal attention for segment-packed rows.

    NOT the default (``mha`` keeps segmented rows on the masked-dense
    grouped kernel): measured on the packed production shape
    (B=4, H=20, T=1024, D=64, ~5 segments/row of 80-300 tokens) this
    kernel runs 1.16 ms vs the grouped kernel's 0.70 ms, and the
    dynamic-bound Mosaic loop costs a ~335 s compile. At ESM2's 1024
    row cap the per-q-block extents skip too few key blocks to beat one
    big batched MXU matmul; the kernel is kept (tested in interpret
    mode) for future packed rows long enough (>= 4k) that O(sum L_s^2)
    beats O(T^2).

    q/k/v: (B, H, T, D), T a multiple of SEG_BLOCK; segment_ids: (B, T)
    int32, ids CONTIGUOUS along the row, 0 = padding (a padded tail or
    all-pad row computes garbage that callers never consume). RoPE and
    the softmax scale apply in-graph here (one fused elementwise pass —
    cheap at packed-row sizes, and it keeps k-tiles rotation-free inside
    the dynamic loop). Returns (B, H, T, D)."""
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if rope_base is not None:
        q, k = _apply_rope_bhtd(q, k, rope_base)
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)

    n_qb = t // SEG_BLOCK
    lo, hi = _segment_block_extents(segment_ids, n_qb)
    seg = jnp.broadcast_to(
        segment_ids.astype(jnp.float32)[:, None, :], (b, 8, t)
    )

    # head group: largest divisor of H whose K/V blocks stay <= ~1.5 MB
    # each (double-buffered by Pallas)
    hg = h
    while hg > 1 and hg * t * d * 2 > (1 << 20) + (1 << 19):
        divs = [x for x in range(1, hg) if h % x == 0]
        hg = divs[-1]
    n_hb = h // hg

    out = pl.pallas_call(
        _seg_block_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        grid=(b, n_hb, n_qb),
        in_specs=[
            pl.BlockSpec((b, n_qb), lambda bi, hb, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, n_qb), lambda bi, hb, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, t), lambda bi, hb, qb: (bi, 0, 0)),
            pl.BlockSpec((1, hg, SEG_BLOCK, d),
                         lambda bi, hb, qb: (bi, hb, qb, 0)),
            pl.BlockSpec((1, hg, t, d), lambda bi, hb, qb: (bi, hb, 0, 0)),
            pl.BlockSpec((1, hg, t, d), lambda bi, hb, qb: (bi, hb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, SEG_BLOCK, d),
                               lambda bi, hb, qb: (bi, hb, qb, 0)),
        interpret=interpret,
    )(lo, hi, seg, q, k, v)
    return out


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


def _seg_block_dispatch(q, k, v, segment_ids, sm_scale=None, rope_base=None,
                        interpret=False):
    """Packed rows beyond the grouped kernel's VMEM cap: the
    extent-sparse kernel streams only same-segment key blocks — never
    the dense (B, H, T, T) HBM scores the reference path would
    materialize (OOM-prone at long packed rows). Padded tails map to
    segment 0, which real queries exclude via the same-segment select
    (key_mask positions are segment 0 per the packing contract).

    NOTE: seg_block_mha's dynamic-bound Mosaic loop has a long one-time
    compile (~minutes, see its docstring); no current caller reaches
    this path (ESM2 caps packed rows at GROUPED_MAX_SEQ_LEN; PoET's
    segmented layers are causal), it exists so a future long-row packer
    degrades to a working kernel instead of a dense HBM OOM."""
    t = q.shape[2]
    t_pad = _round_up(t, SEG_BLOCK)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        segment_ids = jnp.pad(segment_ids, [(0, 0), (0, t_pad - t)])
    return seg_block_mha(
        q, k, v, segment_ids, sm_scale=sm_scale, rope_base=rope_base,
        interpret=interpret,
    )[:, :, :t]


def mha_natural(q, k, v, key_mask=None, bias=None, causal=False,
                sm_scale=None, rope_base=None, segment_ids=None):
    """Attention at the MODEL's natural layout: q/k/v and the result are
    (B, T, H, D) — the free reshape of the QKV projection outputs.

    Default route: transpose to (B, H, T, D) around ``mha`` (XLA fuses
    these into surrounding ops where it can). ``PGYM_MHA_LAYOUT=bthd``
    on TPU (no per-head bias, T <= BTHD_MAX_SEQ_LEN, VMEM model fits)
    routes to the heads-mid kernel instead — measured SLOWER (4.49 vs
    1.96 ms/call at ESM2-650M T=256 on v5e; see grouped_mha_bthd's
    docstring), so the default transpose route is the production path
    and the env var exists only for re-measurement."""
    b, t, h, d = q.shape
    if (
        _HAVE_PALLAS and not _FORCE_XLA and bias is None
        and t <= BTHD_MAX_SEQ_LEN
        and os.environ.get("PGYM_MHA_LAYOUT") == "bthd"
        and jax.default_backend() == "tpu"
        # the heads-mid kernel keeps full-T k/v (all heads) resident per
        # program; when the working-set model says that cannot fit the
        # scoped-VMEM limit, take the transpose path instead of raising
        and _bthd_block_q(_round_up(t, 128), h, d, q.dtype.itemsize) > 0
    ):
        return grouped_mha_bthd(
            q, k, v, key_mask=key_mask, causal=causal, sm_scale=sm_scale,
            rope_base=rope_base, segment_ids=segment_ids,
        )
    tr = lambda x: x.transpose(0, 2, 1, 3)
    return tr(mha(
        tr(q), tr(k), tr(v), key_mask=key_mask, bias=bias, causal=causal,
        sm_scale=sm_scale, rope_base=rope_base, segment_ids=segment_ids,
    ))


def mha(q, k, v, key_mask=None, bias=None, causal=False, sm_scale=None,
        rope_base=None, segment_ids=None):
    """Dispatch: grouped-heads fused kernel on TPU up to
    GROUPED_MAX_SEQ_LEN, q-blocked flash kernel beyond, XLA elsewhere.

    With ``rope_base``, q/k arrive UNROTATED; the grouped kernel fuses
    RoPE in VMEM and the other paths apply it in-graph. ``segment_ids``
    (B, T) int, 0 = padding: block-diagonal attention for packed rows
    (masked-dense in the grouped kernel — measured FASTER than the
    extent-sparse seg_block_mha at every production row length, see its
    docstring)."""
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
        if bias is None and not causal:
            if key_mask is not None:
                # fold the mask into the segment map (masked keys join
                # segment 0, which live queries never attend) so the
                # extent-sparse kernel honors it. The kernel needs
                # CONTIGUOUS segment runs: masks at segment tails (the
                # packing contract's padding) stay contiguous; a hole in
                # the middle of a segment would split the run and drop
                # cross-hole attention.
                segment_ids = jnp.where(key_mask, segment_ids, 0)
            return _seg_block_dispatch(
                q, k, v, segment_ids, sm_scale=sm_scale, rope_base=rope_base
            )
    if rope_base is not None:
        q, k = _apply_rope_bhtd(q, k, rope_base)
    return reference_mha(
        q, k, v, key_mask=key_mask, bias=bias, causal=causal,
        sm_scale=sm_scale, segment_ids=segment_ids
    )
