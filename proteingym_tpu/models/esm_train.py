"""Masked-LM training step for ESM models (finetuning / evotuning).

The reference only *consumes* pretrained ESM checkpoints, but ships
family-specific evotuning for UniRep (ref: baselines/unirep/unirep_evotune.py)
and trains EVE per family; this module provides the equivalent capability
for the ESM family — a fully sharded (data x model) masked-LM training step
usable for evotuning on family MSAs.

TPU design: one jit compiles the whole step; parameters carry tensor-
parallel NamedShardings (parallel/mesh.py) and the batch is sharded over the
data axis, so XLA emits all-reduces over ICI for gradient sync and TP
activations.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from proteingym_tpu.models.esm2 import ALPHABET, EsmConfig, apply


def mask_batch(
    rng: jax.Array,
    tokens: jnp.ndarray,
    mask_prob: float = 0.15,
    mask_token_frac: float = 0.8,
    random_token_frac: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BERT-style masking: (masked_tokens, target_mask).

    Special positions (cls/eos/pad) are never selected.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    special = (
        (tokens == ALPHABET.cls_idx)
        | (tokens == ALPHABET.eos_idx)
        | (tokens == ALPHABET.padding_idx)
    )
    select = (jax.random.uniform(k1, tokens.shape) < mask_prob) & ~special
    u = jax.random.uniform(k2, tokens.shape)
    use_mask = select & (u < mask_token_frac)
    use_rand = select & (u >= mask_token_frac) & (u < mask_token_frac + random_token_frac)
    rand_aa = jax.random.randint(k3, tokens.shape, 4, 24)  # AA token range
    out = jnp.where(use_mask, ALPHABET.mask_idx, tokens)
    out = jnp.where(use_rand, rand_aa, out)
    return out, select


def mlm_loss(
    params: Dict[str, Any],
    config: EsmConfig,
    masked_tokens: jnp.ndarray,
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Cross-entropy over masked positions, optionally sequence-weighted."""
    logits = apply(params, config, masked_tokens)
    logps = jax.nn.log_softmax(logits, axis=-1)
    tok_ll = jnp.take_along_axis(logps, targets[..., None], axis=-1)[..., 0]
    per_seq = jnp.sum(jnp.where(target_mask, tok_ll, 0.0), axis=-1)
    denom = jnp.maximum(jnp.sum(target_mask, axis=-1), 1)
    per_seq = per_seq / denom
    if weights is None:
        return -jnp.mean(per_seq)
    return -jnp.sum(weights * per_seq) / jnp.maximum(jnp.sum(weights), 1e-9)


def make_train_step(config: EsmConfig, optimizer=None):
    """Returns (init_opt_state, train_step) where train_step is jit-ready.

    train_step(params, opt_state, rng, tokens, seq_weights) -> (params,
    opt_state, loss).  Designed to be jitted with sharded in/out specs.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4)

    def train_step(params, opt_state, rng, tokens, seq_weights):
        masked, target_mask = mask_batch(rng, tokens)

        def loss_fn(p):
            return mlm_loss(p, config, masked, tokens, target_mask, seq_weights)

        # trace attention through the XLA path: the Pallas kernels have
        # no VJP rule and cannot be partitioned by pjit, so the grad
        # (and mesh-sharded) training step must not capture them
        from proteingym_tpu.ops.flash_attention import force_xla_attention

        with force_xla_attention():
            loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer.init, train_step
