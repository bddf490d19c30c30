"""ProteinNPT: semi-supervised non-parametric transformer, trained per assay.

The reference's supervised benchmark trains ProteinNPT (Notin et al. 2023,
the 11th substitution model and one of the 3 indel models in
``DMS_supervised`` lists) per assay: each labeled variant is a ROW of
per-residue PLM embeddings plus an embedded target value; axial attention
alternates along the residue axis (within a variant) and the variant axis
(across the labeled batch), and masked target tokens are predicted from
the joint representation. There is no published per-assay checkpoint to
convert — the capability IS the trainable architecture + CV harness.

TPU design: one (N, L+1, D) tensor per step (context variants + masked
prediction rows trained jointly), row/column attention as batched MHA
(XLA fuses both into MXU matmuls), the whole Adam loop under one
``lax.scan``; prediction batches reuse a sampled labeled context like the
paper's inference procedure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

AA20 = "ACDEFGHIKLMNPQRSTVWY"


@dataclasses.dataclass(frozen=True)
class ProteinNptConfig:
    name: str = "protein_npt"
    feat_dim: int = 21          # per-residue input features (one-hot + pad)
    embed_dim: int = 48
    num_layers: int = 2
    num_heads: int = 4
    ffn_mult: int = 4
    context_size: int = 96      # labeled rows per prediction batch
    train_batch: int = 64
    mask_rate: float = 0.25     # target-masking rate during training
    steps: int = 600
    learning_rate: float = 3e-3
    max_len: int = 2048

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def residue_features(seqs: Sequence[str], seq_len: int) -> np.ndarray:
    """(N, L, 21) one-hot per-residue features (PLM embeddings slot in via
    the same shape)."""
    idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros((len(seqs), seq_len, 21), np.float32)
    for n, s in enumerate(seqs):
        for j, ch in enumerate(s[:seq_len]):
            out[n, j, idx.get(ch, 20)] = 1.0
    return out


def init_params(rng: jax.Array, c: ProteinNptConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 16 + 12 * c.num_layers))

    def lin(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out))
            * np.sqrt(1.0 / n_in),
            "b": jnp.zeros(n_out),
        }

    def ln(d):
        return {"g": jnp.ones(d), "b": jnp.zeros(d)}

    def attn(d):
        return {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                "o": lin(d, d)}

    d = c.embed_dim
    params: Dict[str, Any] = {
        "pos_embed": jax.random.normal(next(keys), (c.max_len + 1, d))
        * 0.02,
        "in_proj": lin(c.feat_dim, d),
        "target_proj": lin(1, d),
        "target_mask": jax.random.normal(next(keys), (d,)) * 0.02,
        "aux_proj": lin(1, d),  # zero-shot fitness auxiliary input
        "layers": [
            {
                "row_ln": ln(d), "row": attn(d),
                "col_ln": ln(d), "col": attn(d),
                "ffn_ln": ln(d),
                "fc1": lin(d, c.ffn_mult * d),
                "fc2": lin(c.ffn_mult * d, d),
            }
            for _ in range(c.num_layers)
        ],
        "out_ln": ln(d),
        "head1": lin(d, d),
        "head2": lin(d, 1),
    }
    return params


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lin(x, p):
    return x @ p["w"] + p["b"]


def _mha(p, x, heads):
    """Self-attention over the second-to-last axis of (..., T, D)."""
    *lead, T, D = x.shape
    hd = D // heads
    q = _lin(x, p["q"]).reshape(*lead, T, heads, hd)
    k = _lin(x, p["k"]).reshape(*lead, T, heads, hd)
    v = _lin(x, p["v"]).reshape(*lead, T, heads, hd)
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k) / np.sqrt(hd)
    w = jax.nn.softmax(scores, -1)
    ctx = jnp.einsum("...hqk,...khd->...qhd", w, v)
    return _lin(ctx.reshape(*lead, T, D), p["o"])


def apply(params, c: ProteinNptConfig, feats, targets, target_mask,
          aux=None):
    """feats (N, L, F); targets (N,); target_mask (N,) True = hidden.

    Returns (N,) predictions read from the per-variant target token."""
    N, L, _ = feats.shape
    x = _lin(feats, params["in_proj"])                       # (N, L, D)
    x = x + params["pos_embed"][None, :L]
    t_emb = _lin(targets[:, None], params["target_proj"])    # (N, D)
    t_emb = jnp.where(target_mask[:, None], params["target_mask"], t_emb)
    if aux is not None:
        t_emb = t_emb + _lin(aux[:, None], params["aux_proj"])
    x = jnp.concatenate([x, t_emb[:, None, :]], axis=1)      # (N, L+1, D)
    for layer in params["layers"]:
        # row attention: across positions within each variant
        x = x + _mha(layer["row"], _ln(x, layer["row_ln"]), c.num_heads)
        # column attention: across variants at each position
        xc = _ln(x, layer["col_ln"]).swapaxes(0, 1)          # (L+1, N, D)
        x = x + _mha(layer["col"], xc, c.num_heads).swapaxes(0, 1)
        h = _ln(x, layer["ffn_ln"])
        x = x + _lin(jax.nn.gelu(_lin(h, layer["fc1"])), layer["fc2"])
    t = _ln(x[:, -1], params["out_ln"])
    h = jax.nn.gelu(_lin(t, params["head1"]))
    return _lin(h, params["head2"])[:, 0]


def train(
    params,
    c: ProteinNptConfig,
    feats: np.ndarray,
    targets: np.ndarray,
    aux: Optional[np.ndarray] = None,
    seed: int = 0,
):
    """Per-assay training: each step samples train_batch labeled rows,
    hides mask_rate of their targets, and regresses the hidden values
    (the NPT objective). The whole loop runs in one lax.scan."""
    import optax

    N = feats.shape[0]
    B = min(c.train_batch, N)
    feats_j = jnp.asarray(feats)
    y = jnp.asarray(targets, jnp.float32)
    mu, sd = float(np.mean(targets)), float(np.std(targets) + 1e-8)
    y_n = (y - mu) / sd
    aux_j = None if aux is None else jnp.asarray(aux, jnp.float32)

    optimizer = optax.adam(c.learning_rate)

    def loss_fn(p, key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.choice(k1, N, (B,), replace=N < B)
        fb = feats_j[idx]
        yb = y_n[idx]
        ab = None if aux_j is None else aux_j[idx]
        hide = jax.random.bernoulli(k2, c.mask_rate, (B,))
        # always hide at least the first sampled row
        hide = hide.at[0].set(True)
        pred = apply(p, c, fb, jnp.where(hide, 0.0, yb), hide, aux=ab)
        err = (pred - yb) ** 2
        return jnp.sum(err * hide) / jnp.maximum(hide.sum(), 1)

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
    return params, {"mu": mu, "sd": sd, "losses": np.asarray(losses)}


def predict(
    params,
    c: ProteinNptConfig,
    norm: Dict[str, float],
    train_feats: np.ndarray,
    train_targets: np.ndarray,
    test_feats: np.ndarray,
    train_aux: Optional[np.ndarray] = None,
    test_aux: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """Batch test rows with a sampled labeled context (paper inference)."""
    rs = np.random.RandomState(seed)
    Ctx = min(c.context_size, len(train_targets))
    ctx_idx = rs.choice(len(train_targets), Ctx, replace=False)
    cf = jnp.asarray(train_feats[ctx_idx])
    cy = (jnp.asarray(train_targets[ctx_idx], jnp.float32) - norm["mu"]) \
        / norm["sd"]
    ca = None if train_aux is None else jnp.asarray(
        train_aux[ctx_idx], jnp.float32)

    chunk = 32
    out = np.zeros(len(test_feats))

    @jax.jit
    def step(p, tf, ta):
        feats = jnp.concatenate([cf, tf], 0)
        targs = jnp.concatenate([cy, jnp.zeros(tf.shape[0])], 0)
        mask = jnp.concatenate(
            [jnp.zeros(Ctx, bool), jnp.ones(tf.shape[0], bool)], 0
        )
        aux = None
        if ca is not None:
            aux = jnp.concatenate([ca, ta], 0)
        pred = apply(p, c, feats, targs, mask, aux=aux)
        return pred[Ctx:]

    for s in range(0, len(test_feats), chunk):
        blk = test_feats[s : s + chunk]
        pad = chunk - len(blk)
        tf = jnp.asarray(
            np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
            if pad else blk
        )
        if test_aux is not None:
            ba = test_aux[s : s + chunk]
            ta = jnp.asarray(
                np.concatenate([ba, np.repeat(ba[-1:], pad, 0)])
                if pad else ba, jnp.float32,
            )
        else:
            ta = None if ca is None else jnp.zeros(chunk)
        pred = np.asarray(step(params, tf, ta))
        out[s : s + len(blk)] = pred[: len(blk)] * norm["sd"] + norm["mu"]
    return out


def npt_cv_predict(
    feats: np.ndarray,
    targets: np.ndarray,
    folds: np.ndarray,
    c: Optional[ProteinNptConfig] = None,
    aux: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """Out-of-fold predictions for the supervised benchmark contract."""
    if c is None:
        c = ProteinNptConfig(feat_dim=feats.shape[-1])
    preds = np.zeros(len(targets))
    for k in np.unique(folds):
        tr = folds != k
        te = folds == k
        params = init_params(jax.random.PRNGKey(seed + int(k)), c)
        params, norm = train(
            params, c, feats[tr], targets[tr],
            aux=None if aux is None else aux[tr], seed=seed + int(k),
        )
        preds[te] = predict(
            params, c, norm, feats[tr], targets[tr], feats[te],
            train_aux=None if aux is None else aux[tr],
            test_aux=None if aux is None else aux[te],
            seed=seed,
        )
    return preds
