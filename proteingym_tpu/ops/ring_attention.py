"""Ring attention: exact attention over a sequence-parallel mesh axis.

The reference handles long sequences only by windowing (SURVEY.md §5 —
optimal / overlapping / sliding windows, which this repo reproduces in
data/windows.py + the scoring harnesses). Ring attention is the TPU-native
EXTENSION the survey calls out: score a full-length sequence exactly, with
activations sharded over chips, instead of approximating with windows.

Algorithm (blockwise/online softmax, Liu et al. ring attention): each
device holds its local Q/K/V sequence shard; K/V shards rotate around the
mesh axis with ``ppermute`` while every device folds the visiting block
into flash-style running (max, sum, accumulator) statistics. After
``axis_size`` hops every Q block has attended to every K/V block and the
normalized output is exact — no (T, T) tensor ever exists on one chip, and
each hop's collective rides the ICI ring concurrently with compute.

Layout contract: q/k/v are (B, H, T, D) with T sharded over ``axis``
(PartitionSpec(None, None, axis, None)); the output is sharded the same
way. Padding is handled by a (B, T) key mask sharded with T.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, key_mask, axis: str, sm_scale: float):
    """shard_map body: q/k/v (B, H, T_local, D), key_mask (B, T_local)."""
    axis_size = jax.lax.psum(1, axis)
    scale = sm_scale

    def fold(carry, kv_mask):
        acc, m, l = carry
        k_blk, v_blk, mask_blk = kv_mask
        # (B, H, Tq, Tk) scores for the visiting K block
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(mask_blk[:, None, None, :], s, NEG_INF)
        blk_max = jnp.max(s, axis=-1)  # (B, H, Tq)
        new_m = jnp.maximum(m, blk_max)
        correction = jnp.exp(m - new_m)
        p = jnp.exp(s - new_m[..., None])  # (B, H, Tq, Tk)
        new_l = l * correction + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        new_acc = acc * correction[..., None] + pv
        return new_acc, new_m, new_l

    b, h, tq, d = q.shape
    acc = jnp.zeros((b, h, tq, d), jnp.float32)
    m = jnp.full((b, h, tq), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, tq), jnp.float32)
    # mark the device-constant inits as device-varying so the fori_loop
    # carry type stays fixed across iterations (shard_map vma typing)
    try:
        acc, m, l = (jax.lax.pcast(x, axis, to="varying") for x in (acc, m, l))
    except AttributeError:  # older jax: no vma typing, no cast needed
        pass

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def body(i, state):
        acc, m, l, k_cur, v_cur, mask_cur = state
        acc, m, l = fold((acc, m, l), (k_cur, v_cur, mask_cur))
        # rotate K/V/mask to the next device on the ring (overlaps with the
        # next hop's compute under XLA latency hiding)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        mask_nxt = jax.lax.ppermute(mask_cur, axis, perm)
        return acc, m, l, k_nxt, v_nxt, mask_nxt

    acc, m, l, _, _, _ = jax.lax.fori_loop(
        0, axis_size, body, (acc, m, l, k, v, key_mask)
    )
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    key_mask: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact (non-causal) attention with the sequence dim sharded over
    ``axis``. q/k/v: (B, H, T, D); key_mask: (B, T) True at REAL keys.

    T must divide evenly by the axis size (pad with masked keys first).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if key_mask is None:
        key_mask = jnp.ones((q.shape[0], q.shape[2]), bool)

    spec_qkv = P(None, None, axis, None)
    spec_mask = P(None, axis)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis=axis, sm_scale=sm_scale),
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
        out_specs=spec_qkv,
    )
    q = jax.device_put(q, NamedSharding(mesh, spec_qkv))
    k = jax.device_put(k, NamedSharding(mesh, spec_qkv))
    v = jax.device_put(v, NamedSharding(mesh, spec_qkv))
    key_mask = jax.device_put(key_mask, NamedSharding(mesh, spec_mask))
    return fn(q, k, v, key_mask)
