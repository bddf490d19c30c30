"""Gather-then-normalize log-probabilities for masked-marginal scoring.

The masked-marginal hot loop needs log p(token | context) at ONE position
per row (the masked one, ref esm/compute_fitness.py:489-504). Normalizing
the full (chunk, T, V) logits table first and gathering afterwards — the
naive composition — materializes a (chunk, T, V) f32 log-softmax output in
HBM only to read back chunk rows of it. Gathering the masked row's logits
FIRST shrinks the normalization to (chunk, V): the softmax work and the
f32 HBM traffic drop by a factor of T (~300-1000x for DMS-scale windows),
and XLA fuses the gather into the LM-head epilogue so the full-table
log-softmax never exists.

This is an algebraic restructuring, not a hand-written kernel: with V=33
(ESM alphabet) a Pallas kernel has nothing left to fuse — the op is two
reductions over a 33-wide row that XLA already keeps in registers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_log_softmax_gather(logits: jnp.ndarray, offs: jnp.ndarray) -> jnp.ndarray:
    """out[i, :] = log_softmax(logits[i, offs[i], :], axis=-1).

    logits: (B, T, V); offs: (B,) int32 row positions. Returns (B, V) f32.
    Exactly equal to ``jax.nn.log_softmax(logits, -1)[arange(B), offs]``
    (log-softmax over V commutes with selecting a T row).
    """
    rows = jnp.take_along_axis(
        logits, offs[:, None, None], axis=1
    )[:, 0, :]
    return jax.nn.log_softmax(rows.astype(jnp.float32), axis=-1)


def multi_log_softmax_gather(
    logits: jnp.ndarray, offs: jnp.ndarray
) -> jnp.ndarray:
    """out[i, s, :] = log_softmax(logits[i, offs[i, s], :], axis=-1).

    Segment-packed rows carry one masked position per packed segment:
    logits (B, T, V), offs (B, S) int32 -> (B, S, V) f32. Out-of-range
    offsets (empty slots) clamp to the last row; callers drop them.
    """
    rows = jnp.take_along_axis(logits, offs[:, :, None], axis=1)
    return jax.nn.log_softmax(rows.astype(jnp.float32), axis=-1)
