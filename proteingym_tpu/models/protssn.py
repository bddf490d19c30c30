"""ProtSSN-style structure-sequence model: PLM embeddings + EGNN readout.

The reference (ref: proteingym/baselines/protssn/compute_fitness.py,
src/models.py, src/module/egnn/) feeds frozen ESM2-650M residue embeddings
through an EGNN over a k-NN Ca graph (k in {10,20,30}, hidden in
{512,768,1280}) and reads out per-position 20-way amino-acid logits;
fitness = sum over mutated positions of log p(mt) - log p(wt), ensembled
over (k, hidden) variants.

TPU rebuild: the PLM embedding pass reuses models/esm2.py; the EGNN is the
dense-gather implementation in ops/gnn.py (no torch_geometric CUDA
scatter). Training utilities are provided so denoising-style pretraining
(ProtSSN's objective: recover the native AA at noised nodes) can run
natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.ops.gnn import (
    EgnnConfig, egnn_apply, egnn_init, egnn_readout, knn_graph,
)

AA20 = "ACDEFGHIKLMNPQRSTVWY"


@dataclasses.dataclass(frozen=True)
class ProtssnConfig:
    node_dim: int = 1280  # ESM2-650M embedding width
    hidden_dim: int = 512
    num_layers: int = 6
    k_neighbors: int = 20

    def egnn(self) -> EgnnConfig:
        return EgnnConfig(
            node_dim=self.node_dim,
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            k_neighbors=self.k_neighbors,
            update_coords=False,
            out_dim=len(AA20),
        )


def init_params(rng: jax.Array, c: ProtssnConfig) -> Dict[str, Any]:
    return egnn_init(rng, c.egnn())


def logits(
    params, c: ProtssnConfig, embeddings: jnp.ndarray, ca_coords: jnp.ndarray
) -> jnp.ndarray:
    """(L, node_dim) embeddings + (L, 3) Ca coords -> (L, 20) log-probs."""
    cfg = c.egnn()
    neighbors = knn_graph(ca_coords, cfg.k_neighbors)
    h, _ = egnn_apply(params, cfg, embeddings, ca_coords, neighbors)
    return jax.nn.log_softmax(egnn_readout(params, cfg, h), axis=-1)


def esm_embeddings(esm_params, esm_config, sequence: str) -> jnp.ndarray:
    """Final-layer residue embeddings from the ESM2 trunk (BOS/EOS trimmed)."""
    from proteingym_tpu.models import esm2

    tokens = jnp.asarray(esm2.ALPHABET.tokenize(sequence)[None])
    _, reps = esm2.apply(
        esm_params, esm_config, tokens, return_representations=True
    )
    final = reps[max(reps)]
    return final[0, 1 : 1 + len(sequence)].astype(jnp.float32)


def score_mutants(
    params,
    c: ProtssnConfig,
    embeddings: jnp.ndarray,
    ca_coords: jnp.ndarray,
    sequence: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    """sum over mutated positions of logp[mt] - logp[wt] (MM-style readout,
    ref protssn/compute_fitness.py)."""
    table = np.asarray(logits(params, c, embeddings, ca_coords))
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out


def train_denoising(
    params,
    c: ProtssnConfig,
    embeddings: np.ndarray,
    ca_coords: np.ndarray,
    native_tokens: np.ndarray,
    steps: int = 100,
    learning_rate: float = 1e-3,
    noise_prob: float = 0.25,
    seed: int = 0,
):
    """ProtSSN-style denoising objective: predict the native AA at every
    position from (noised) embeddings + structure."""
    import optax

    cfg = c.egnn()
    neighbors = knn_graph(jnp.asarray(ca_coords), cfg.k_neighbors)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    emb = jnp.asarray(embeddings)
    coords = jnp.asarray(ca_coords)
    targets = jnp.asarray(native_tokens)

    @jax.jit
    def step_fn(params, opt_state, key):
        def loss_fn(p):
            noise = jax.random.bernoulli(key, noise_prob, (emb.shape[0], 1))
            noised = jnp.where(noise, 0.0, emb)
            h, _ = egnn_apply(p, cfg, noised, coords, neighbors)
            logp = jax.nn.log_softmax(egnn_readout(p, cfg, h), -1)
            return -jnp.mean(
                jnp.take_along_axis(logp, targets[:, None], -1)[:, 0]
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run(params, opt_state, rng):  # all steps in one lax.scan dispatch
        def body(carry, i):
            p, o = carry
            p, o, loss = step_fn(p, o, jax.random.fold_in(rng, i))
            return (p, o), loss

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        return params

    return run(params, opt_state, jax.random.PRNGKey(seed))
