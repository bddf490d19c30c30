"""VespaG-class predictor: per-residue head over PLM embeddings trained
against an evolutionary teacher.

The reference vendors the VespaG training + inference tree
(ref: proteingym/baselines/vespag/, 21 files): a small MLP over ESM2
per-residue embeddings predicting the full (L, 20) substitution-effect
landscape, trained to regress GEMME annotations ("expert-distilled"
zero-shot). Here:

  - head: 2-layer MLP (embedding -> hidden -> 20) applied per residue
  - training: MSE against any teacher (L, 20) landscape — the native
    GEMME implementation (models/gemme.py) supplies one out of the box
  - scoring: score(mutant) = sum over mutated positions of
    head(emb_i)[mt] - head(emb_i)[wt]

Everything jits; training is a single Adam loop on one (L, D) tensor.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.data.mutants import is_wt_row

AA20 = "ACDEFGHIKLMNPQRSTVWY"


@dataclasses.dataclass(frozen=True)
class VespagConfig:
    embed_dim: int = 1280  # ESM2-650M
    hidden_dim: int = 256


def init_params(rng: jax.Array, c: VespagConfig) -> Dict:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": {
            "w": jax.random.normal(k1, (c.embed_dim, c.hidden_dim), jnp.float32)
            * np.sqrt(2.0 / c.embed_dim),
            "b": jnp.zeros(c.hidden_dim, jnp.float32),
        },
        "fc2": {
            "w": jax.random.normal(k2, (c.hidden_dim, 20), jnp.float32)
            * np.sqrt(2.0 / c.hidden_dim),
            "b": jnp.zeros(20, jnp.float32),
        },
    }


def landscape(params, embeddings: jnp.ndarray) -> jnp.ndarray:
    """(L, D) embeddings -> (L, 20) predicted substitution landscape."""
    h = jax.nn.gelu(
        embeddings @ params["fc1"]["w"] + params["fc1"]["b"]
    )
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def train_from_teacher(
    params,
    embeddings: np.ndarray,
    teacher: np.ndarray,
    steps: int = 300,
    learning_rate: float = 1e-3,
):
    """Distill a teacher landscape (e.g. GEMME's combined table)."""
    import optax

    emb = jnp.asarray(embeddings, jnp.float32)
    target = jnp.asarray(teacher, jnp.float32)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((landscape(p, emb) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run(params, opt_state):  # all steps in one dispatch (one lax.scan)
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o)
            return (p, o), loss

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), None, length=steps
        )
        return params

    return run(params, opt_state)


def score_mutants(
    params,
    embeddings: np.ndarray,
    wt_seq: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    table = np.asarray(landscape(params, jnp.asarray(embeddings, jnp.float32)))
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if wt_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out
