"""UniRep: 1900-unit mLSTM autoregressive protein LM.

Replaces the reference's TF1 implementation
(ref: proteingym/baselines/unirep/unirep.py:50+ mLSTMCell1900,
unirep_inference.py) with a functional JAX mLSTM driven by ``lax.scan``:

  m_t = (x_t Wmx) * (h_{t-1} Wmh)          [multiplicative pathway]
  z_t = x_t Wx + m_t Wh + b                [4H gates: i, f, o, u]
  c_t = sigmoid(f) * c_{t-1} + sigmoid(i) * tanh(u)
  h_t = sigmoid(o) * tanh(c_t)

Scoring is AR surprisal: sum_t log p(x_t | x_<t) via the generic harness
(models/ar_scoring.py) — the logits_fn here runs the scan once per padded
batch, so the recurrence is sequential in T but batched on the VPU.

Vocabulary (ref unirep data utils): 26 tokens — ids 0..25 with
start=24, stop=25, and AAs mapped per the original aa_to_int table.
Evotuning (per-family finetuning, ref unirep_evotune.py) is
``unirep_evotune``: weighted-sequence AR max-likelihood with optax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# original UniRep aa_to_int mapping (ref unirep/data_utils.py): pad=0,
# M=1, R=2, H=3, K=4, D=5, E=6, S=7, T=8, N=9, Q=10, C=11, U=12, G=13,
# P=14, A=15, V=16, I=17, F=18, Y=19, W=20, L=21, O=22, X=23, start=24, stop=25
UNIREP_AA_TO_INT = {
    "M": 1, "R": 2, "H": 3, "K": 4, "D": 5, "E": 6, "S": 7, "T": 8, "N": 9,
    "Q": 10, "C": 11, "U": 12, "G": 13, "P": 14, "A": 15, "V": 16, "I": 17,
    "F": 18, "Y": 19, "W": 20, "L": 21, "O": 22, "X": 23,
}
UNIREP_START, UNIREP_STOP, UNIREP_PAD = 24, 25, 0


class UniRepTokenizer:
    PAD = UNIREP_PAD

    def encode(self, seq: str) -> np.ndarray:
        ids = [UNIREP_START] + [
            UNIREP_AA_TO_INT.get(c.upper(), 23) for c in seq
        ] + [UNIREP_STOP]
        return np.asarray(ids, dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class UniRepConfig:
    name: str = "unirep_1900"
    embed_dim: int = 10
    hidden_dim: int = 1900
    vocab_size: int = 26


def init_params(rng: jax.Array, c: UniRepConfig) -> Dict[str, Any]:
    k = iter(jax.random.split(rng, 7))

    def mat(key, shape, scale=0.05):
        return jax.random.normal(key, shape, jnp.float32) * scale

    return {
        "embedding": mat(next(k), (c.vocab_size, c.embed_dim)),
        "wx": mat(next(k), (c.embed_dim, 4 * c.hidden_dim)),
        "wh": mat(next(k), (c.hidden_dim, 4 * c.hidden_dim)),
        "wmx": mat(next(k), (c.embed_dim, c.hidden_dim)),
        "wmh": mat(next(k), (c.hidden_dim, c.hidden_dim)),
        "b": jnp.zeros(4 * c.hidden_dim, jnp.float32),
        "head": {
            "w": mat(next(k), (c.hidden_dim, c.vocab_size)),
            "b": jnp.zeros(c.vocab_size, jnp.float32),
        },
    }


def apply(params, c: UniRepConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, T) tokens -> (B, T, V) f32 logits (next-token heads)."""
    b, t = tokens.shape
    x = params["embedding"][tokens]  # (B, T, E)

    def cell(carry, x_t):
        h_prev, c_prev = carry
        m = (x_t @ params["wmx"]) * (h_prev @ params["wmh"])
        z = x_t @ params["wx"] + m @ params["wh"] + params["b"]
        i, f, o, u = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(u)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((b, c.hidden_dim), jnp.float32)
    _, hs = jax.lax.scan(cell, (h0, h0), x.transpose(1, 0, 2))
    hs = hs.transpose(1, 0, 2)  # (B, T, H)
    return hs @ params["head"]["w"] + params["head"]["b"]


def convert_tf_weights(weight_dir: str, c: UniRepConfig) -> Dict[str, Any]:
    """Load the published UniRep numpy weight files
    (ref unirep_inference.py loads <name>:0.npy tensors)."""
    from pathlib import Path

    d = Path(weight_dir)

    def load(*names):
        for name in names:
            for cand in (d / f"{name}:0.npy", d / f"{name}.npy"):
                if cand.exists():
                    return jnp.asarray(np.load(cand))
        raise FileNotFoundError(f"none of {names} in {weight_dir}")

    return {
        "embedding": load("embed_matrix"),
        "wx": load("rnn_mlstm_mlstm_wx"),
        "wh": load("rnn_mlstm_mlstm_wh"),
        "wmx": load("rnn_mlstm_mlstm_wmx"),
        "wmh": load("rnn_mlstm_mlstm_wmh"),
        "b": load("rnn_mlstm_mlstm_b"),
        "head": {
            "w": load("fully_connected_weights"),
            "b": load("fully_connected_biases"),
        },
    }


def evotune(
    params,
    c: UniRepConfig,
    sequences: Sequence[str],
    steps: int = 100,
    batch_size: int = 32,
    learning_rate: float = 1e-4,
    seed: int = 0,
    weights: Optional[np.ndarray] = None,
):
    """Per-family AR finetuning (ref unirep_evotune.py, 13k steps default
    there; fewer here by default)."""
    import optax

    tok = UniRepTokenizer()
    rows = [tok.encode(s) for s in sequences]
    T = max(len(r) for r in rows)
    batch_all = np.full((len(rows), T), UNIREP_PAD, dtype=np.int32)
    for i, r in enumerate(rows):
        batch_all[i, : len(r)] = r
    probs = (
        np.asarray(weights, np.float64) / np.sum(weights)
        if weights is not None
        else np.full(len(rows), 1.0 / len(rows))
    )

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch):
        def loss_fn(p):
            logits = apply(p, c, batch)
            logps = jax.nn.log_softmax(logits, axis=-1)
            targets = batch[:, 1:]
            ll = jnp.take_along_axis(logps[:, :-1], targets[..., None], -1)[..., 0]
            mask = (targets != UNIREP_PAD).astype(jnp.float32)
            return -jnp.sum(ll * mask) / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # batch sampling moves on device so all steps run in one lax.scan
    # dispatch (per-step host sampling pays a dispatch RTT per step)
    data = jnp.asarray(batch_all)
    p_dev = jnp.asarray(probs, jnp.float32)
    bsz = min(batch_size, len(rows))

    @jax.jit
    def run(params, opt_state, rng):
        def body(carry, i):
            p, o = carry
            idx = jax.random.choice(
                jax.random.fold_in(rng, i), data.shape[0], (bsz,),
                replace=True, p=p_dev,
            )
            p, o, loss = step_fn(p, o, data[idx])
            return (p, o), loss

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        return params

    return run(params, opt_state, jax.random.PRNGKey(seed))
