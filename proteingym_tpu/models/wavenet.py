"""Wavenet (SeqDesign): causal dilated-conv autoregressive family model.

The reference benchmark's Wavenet indel column comes from SeqDesign (Shin
et al. 2021): a residual causal dilated-convolution AR model trained per
family on the assay MSA, scoring variants by autoregressive log-likelihood
(insertions/deletions are natural — no alignment needed). No published
per-assay checkpoints exist; the capability is the trainer + scorer.

Architecture (SeqDesign's shape, compacted): embedding -> N residual
blocks of [LN -> gelu -> 1x1 down -> LN -> gelu -> CAUSAL dilated conv
(k=2) -> LN -> gelu -> 1x1 up], dilations cycling 1,2,4,...,max_dilation,
final LN -> vocab head. Sequences start with a BOS token; training samples
weighted MSA rows.

TPU design: causal convs are lax.conv_general_dilated with explicit left
padding (dilation*(k-1), 0); the whole Adam loop runs in one lax.scan;
scoring batches variants per length bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

WAVENET_ALPHABET = "*ACDEFGHIKLMNPQRSTVWYX"  # 0 = BOS/pad
BOS = 0


def encode(seq: str) -> np.ndarray:
    idx = {a: i for i, a in enumerate(WAVENET_ALPHABET)}
    return np.asarray([BOS] + [idx.get(c, idx["X"]) for c in seq], np.int32)


@dataclasses.dataclass(frozen=True)
class WavenetConfig:
    name: str = "wavenet"
    vocab: int = len(WAVENET_ALPHABET)
    embed_dim: int = 48
    hidden_dim: int = 48
    kernel_size: int = 2
    num_layers: int = 12
    max_dilation: int = 32
    steps: int = 400
    learning_rate: float = 1e-3
    batch: int = 32


def _dilations(c: WavenetConfig):
    out, d = [], 1
    for _ in range(c.num_layers):
        out.append(d)
        d *= 2
        if d > c.max_dilation:
            d = 1
    return out


def init_params(rng: jax.Array, c: WavenetConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 4 + 4 * c.num_layers))

    def lin(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out))
            * np.sqrt(1.0 / n_in),
            "b": jnp.zeros(n_out),
        }

    def ln(d):
        return {"g": jnp.ones(d), "b": jnp.zeros(d)}

    d, h = c.embed_dim, c.hidden_dim
    params: Dict[str, Any] = {
        "embed": jax.random.normal(next(keys), (c.vocab, d)) * 0.05,
        "final_ln": ln(d),
        "head": lin(d, c.vocab),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "ln1": ln(d), "down": lin(d, h),
                "ln2": ln(h),
                "conv": {
                    "w": jax.random.normal(
                        next(keys), (c.kernel_size, h, h)
                    ) * np.sqrt(1.0 / (c.kernel_size * h)),
                    "b": jnp.zeros(h),
                },
                "ln3": ln(h), "up": lin(h, d),
            }
        )
    return params


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _causal_conv(x, p, dilation, kernel_size):
    pad = dilation * (kernel_size - 1)
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(pad, 0)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"]


def apply(params, c: WavenetConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, T, V) next-token logits (causal)."""
    x = params["embed"][tokens]
    for layer, dil in zip(params["layers"], _dilations(c)):
        y = jax.nn.gelu(_ln(x, layer["ln1"]))
        y = y @ layer["down"]["w"] + layer["down"]["b"]
        y = jax.nn.gelu(_ln(y, layer["ln2"]))
        y = _causal_conv(y, layer["conv"], dil, c.kernel_size)
        y = jax.nn.gelu(_ln(y, layer["ln3"]))
        y = y @ layer["up"]["w"] + layer["up"]["b"]
        x = x + y
    x = _ln(x, params["final_ln"])
    return x @ params["head"]["w"] + params["head"]["b"]


def train(
    params,
    c: WavenetConfig,
    sequences: Sequence[str],
    weights: Optional[np.ndarray] = None,
    seed: int = 0,
):
    """Weighted AR training on the family sequences (one lax.scan)."""
    import optax

    all_rows = [encode(s.upper().replace("-", "").replace(".", ""))
                for s in sequences]
    keep = [i for i, r in enumerate(all_rows) if len(r) > 2]
    rows = [all_rows[i] for i in keep]
    T = max(len(r) for r in rows)
    mat = np.zeros((len(rows), T), np.int32)
    mask = np.zeros((len(rows), T), np.float32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
        mask[i, 1 : len(r)] = 1.0  # predict tokens 1..L (targets)
    w = np.ones(len(rows)) if weights is None else np.asarray(
        weights, np.float64)[keep]
    p_sample = w / w.sum()

    mat_j = jnp.asarray(mat)
    mask_j = jnp.asarray(mask)
    logp_sample = jnp.asarray(np.log(p_sample + 1e-12))
    B = min(c.batch, len(rows))
    optimizer = optax.adam(c.learning_rate)

    def loss_fn(p, key):
        idx = jax.random.categorical(key, logp_sample, shape=(B,))
        toks = mat_j[idx]
        m = mask_j[idx]
        logits = apply(p, c, toks)
        logq = jax.nn.log_softmax(logits[:, :-1], -1)
        tgt = toks[:, 1:]
        ll = jnp.take_along_axis(logq, tgt[..., None], -1)[..., 0]
        return -jnp.sum(ll * m[:, 1:]) / jnp.maximum(m[:, 1:].sum(), 1.0)

    @jax.jit
    def run(p, rng):
        opt_state = optimizer.init(p)

        def body(carry, i):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(
                p, jax.random.fold_in(rng, i)
            )
            updates, o = optimizer.update(g, o)
            return (optax.apply_updates(p, updates), o), loss

        (p, _), losses = jax.lax.scan(
            body, (p, opt_state), jnp.arange(c.steps)
        )
        return p, losses

    params, losses = run(params, jax.random.PRNGKey(seed))
    return params, np.asarray(losses)


def score_sequences(
    params, c: WavenetConfig, sequences: Sequence[str], batch: int = 32
) -> np.ndarray:
    """Total AR log-likelihood per sequence (indel-capable)."""
    rows = [encode(s) for s in sequences]
    T = max(len(r) for r in rows)

    @jax.jit
    def step(p, toks, mask):
        logits = apply(p, c, toks)
        logq = jax.nn.log_softmax(logits[:, :-1], -1)
        tgt = toks[:, 1:]
        ll = jnp.take_along_axis(logq, tgt[..., None], -1)[..., 0]
        return jnp.sum(ll * mask[:, 1:], -1)

    out = np.zeros(len(rows))
    for s in range(0, len(rows), batch):
        blk = rows[s : s + batch]
        toks = np.zeros((batch, T), np.int32)
        mask = np.zeros((batch, T), np.float32)
        for bi, r in enumerate(blk):
            toks[bi, : len(r)] = r
            mask[bi, 1 : len(r)] = 1.0
        ll = np.asarray(step(params, jnp.asarray(toks), jnp.asarray(mask)))
        out[s : s + len(blk)] = ll[: len(blk)]
    return out
