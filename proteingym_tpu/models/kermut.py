"""Kermut: supervised Gaussian-process regression over mutation kernels.

Semantics match the reference (ref: proteingym/baselines/kermut/kermut/
model/kernel.py:15-120, model/gp.py:13-100, data/data_utils.py:127-145):

  per-mutation kernel between variants x, x' (sums over mutation pairs):
    k_mut(m, m') = exp(-l_h * Hellinger(probs[pos_m], probs[pos_m']))
                 * exp(-l_d * ||coord[pos_m] - coord[pos_m']||)
                 * exp(-l_p * |log p(aa_m | pos_m) - log p(aa_m' | pos_m')|)
    k_1(x, x')   = h_scale * sum_{m in x, m' in x'} k_mut(m, m')
  global kernel: k = sigmoid(alpha) * k_1 + (1-sigmoid(alpha)) *
    RBF(mean-pooled embeddings)
  mean(x) = intercept + zero_shot_scale * zero_shot(x)
  exact GP, Gaussian likelihood, hyperparameters fit by maximizing the
  log marginal likelihood.

conditional_probs are per-position 20-way distributions (ProteinMPNN
conditionals in the reference — models/protein_mpnn.py supplies these
natively); coords are Ca positions; zero-shot is any merged column
(ESM-2 in the reference).

TPU design: variants are padded (positions, tokens, valid) arrays so the
full Gram matrix is one jit; training is optax Adam on softplus-
parameterized hyperparameters with a Cholesky-based marginal likelihood.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AA20 = "ACDEFGHIKLMNPQRSTVWY"


def hellinger_distance(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 20) x (m, 20) -> (n, m), HD = sqrt(0.5 * sum (sqrt p - sqrt q)^2)
    (ref data_utils.py:127-145)."""
    sp = np.sqrt(p)[:, None, :]
    sq = np.sqrt(q)[None, :, :]
    return np.sqrt(0.5 * np.sum((sp - sq) ** 2, axis=-1))


def encode_variants(
    mutants, max_depth: Optional[int] = None, offset_idx: int = 1
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mutant strings -> padded (positions, tokens, valid) arrays.

    WT rows (empty mutant / '') get zero valid mutations.
    """
    aa_idx = {a: i for i, a in enumerate(AA20)}
    parsed = []
    for m in mutants:
        toks = []
        if isinstance(m, str) and m and m.upper() != "WT":
            for t in m.split(":"):
                toks.append((int(t[1:-1]) - offset_idx, aa_idx[t[-1]]))
        parsed.append(toks)
    depth = max_depth or max(1, max(len(p) for p in parsed))
    n = len(parsed)
    pos = np.zeros((n, depth), np.int32)
    tok = np.zeros((n, depth), np.int32)
    valid = np.zeros((n, depth), bool)
    for i, toks in enumerate(parsed):
        for j, (p, a) in enumerate(toks[:depth]):
            pos[i, j], tok[i, j], valid[i, j] = p, a, True
    return pos, tok, valid


@dataclasses.dataclass
class KermutData:
    """Fixed per-assay tensors the kernel conditions on."""

    conditional_probs: np.ndarray  # (L, 20)
    coords: np.ndarray  # (L, 3) Ca
    hellinger: np.ndarray  # (L, L) precomputed
    log_probs: np.ndarray  # (L, 20) log conditional probs

    @classmethod
    def build(cls, conditional_probs: np.ndarray, coords: np.ndarray):
        probs = np.asarray(conditional_probs, np.float64)
        return cls(
            conditional_probs=probs,
            coords=np.asarray(coords, np.float64),
            hellinger=hellinger_distance(probs, probs),
            log_probs=np.log(np.clip(probs, 1e-12, None)),
        )


def init_hypers() -> Dict[str, jnp.ndarray]:
    # raw values; positive ones go through softplus
    return {
        "h_scale": jnp.asarray(1.0),
        "h_lengthscale": jnp.asarray(1.0),
        "d_lengthscale": jnp.asarray(1.0),
        "p_lengthscale": jnp.asarray(1.0),
        "alpha": jnp.asarray(0.5),  # sigmoid-weighted kernel mix
        "rbf_lengthscale": jnp.asarray(1.0),
        "zero_shot_scale": jnp.asarray(1.0),
        "mean_const": jnp.asarray(0.0),
        "noise": jnp.asarray(0.1),
    }


def _sp(x):
    return jax.nn.softplus(x)


def mutation_kernel(hypers, data: KermutData, a, b):
    """a, b: (pos, tok, valid) tuples -> (n, m) Gram block."""
    hell = jnp.asarray(data.hellinger)
    logp = jnp.asarray(data.log_probs)
    coords = jnp.asarray(data.coords)
    pa, ta, va = a
    pb, tb, vb = b

    hn = hell[pa][:, :, pb]  # (n, D, m, D)
    k_hn = jnp.exp(-_sp(hypers["h_lengthscale"]) * hn)
    dist = jnp.linalg.norm(
        coords[pa][:, :, None, None, :] - coords[pb][None, None, :, :, :],
        axis=-1,
    )
    k_d = jnp.exp(-_sp(hypers["d_lengthscale"]) * dist)
    lp_a = logp[pa, ta]  # (n, D)
    lp_b = logp[pb, tb]
    k_p = jnp.exp(
        -_sp(hypers["p_lengthscale"])
        * jnp.abs(lp_a[:, :, None, None] - lp_b[None, None, :, :])
    )
    mask = va[:, :, None, None] & vb[None, None, :, :]
    k = jnp.where(mask, k_hn * k_d * k_p, 0.0)
    return _sp(hypers["h_scale"]) * jnp.sum(k, axis=(1, 3))


def full_kernel(hypers, data: KermutData, a, b, emb_a=None, emb_b=None):
    k = mutation_kernel(hypers, data, a, b)
    if emb_a is not None and emb_b is not None:
        d2 = jnp.sum(
            (emb_a[:, None, :] - emb_b[None, :, :]) ** 2, -1
        )
        k_rbf = jnp.exp(-0.5 * d2 / _sp(hypers["rbf_lengthscale"]) ** 2)
        w = jax.nn.sigmoid(hypers["alpha"])
        k = w * k + (1.0 - w) * k_rbf
    return k


def _mean(hypers, zero_shot):
    m = hypers["mean_const"]
    if zero_shot is not None:
        m = m + hypers["zero_shot_scale"] * zero_shot
    return m


def neg_log_marginal_likelihood(
    hypers, data: KermutData, train, y, zero_shot=None, emb=None
):
    k = full_kernel(hypers, data, train, train, emb, emb)
    n = y.shape[0]
    k = k + (_sp(hypers["noise"]) + 1e-6) * jnp.eye(n)
    resid = y - _mean(hypers, zero_shot)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    return (
        0.5 * resid @ alpha
        + jnp.sum(jnp.log(jnp.diag(chol)))
        + 0.5 * n * jnp.log(2 * jnp.pi)
    )


def fit(
    data: KermutData,
    train,
    y: np.ndarray,
    zero_shot: Optional[np.ndarray] = None,
    emb: Optional[np.ndarray] = None,
    steps: int = 150,
    learning_rate: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """Fit GP hyperparameters by maximizing the marginal likelihood
    (ref proteingym_benchmark.py training loop)."""
    import optax

    hypers = init_hypers()
    y = jnp.asarray(y, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    zs = None if zero_shot is None else jnp.asarray(zero_shot, y.dtype)
    embj = None if emb is None else jnp.asarray(emb, y.dtype)
    train = tuple(jnp.asarray(t) for t in train)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(hypers)

    def step(hypers, opt_state):
        loss, grads = jax.value_and_grad(neg_log_marginal_likelihood)(
            hypers, data, train, y, zs, embj
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(hypers, updates), opt_state, loss

    @jax.jit
    def run(hypers, opt_state):  # all steps in one dispatch (one lax.scan)
        def body(carry, _):
            h, o = carry
            h, o, loss = step(h, o)
            return (h, o), loss

        (hypers, opt_state), _ = jax.lax.scan(
            body, (hypers, opt_state), None, length=steps
        )
        return hypers

    return run(hypers, opt_state)


def predict(
    hypers,
    data: KermutData,
    train,
    y: np.ndarray,
    test,
    zero_shot_train: Optional[np.ndarray] = None,
    zero_shot_test: Optional[np.ndarray] = None,
    emb_train: Optional[np.ndarray] = None,
    emb_test: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Posterior mean at test variants."""
    train = tuple(jnp.asarray(t) for t in train)
    test = tuple(jnp.asarray(t) for t in test)
    y = jnp.asarray(y)
    k_tt = full_kernel(hypers, data, train, train,
                       None if emb_train is None else jnp.asarray(emb_train),
                       None if emb_train is None else jnp.asarray(emb_train))
    k_st = full_kernel(hypers, data, test, train,
                       None if emb_test is None else jnp.asarray(emb_test),
                       None if emb_train is None else jnp.asarray(emb_train))
    n = y.shape[0]
    k_tt = k_tt + (_sp(hypers["noise"]) + 1e-6) * jnp.eye(n)
    zs_tr = None if zero_shot_train is None else jnp.asarray(zero_shot_train)
    resid = y - _mean(hypers, zs_tr)
    chol = jnp.linalg.cholesky(k_tt)
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    mean_test = 0.0 if zero_shot_test is None else (
        hypers["zero_shot_scale"] * jnp.asarray(zero_shot_test)
    )
    return np.asarray(hypers["mean_const"] + mean_test + k_st @ alpha)


def conditional_probs_from_mpnn(
    mpnn_params, mpnn_config, coords: np.ndarray, sequence: str,
    n_orders: int = 4, seed: int = 0,
) -> np.ndarray:
    """Per-position 20-way conditionals from ProteinMPNN decodes averaged
    over decoding orders (ref kermut/data/extract_mpnn_probs.py role)."""
    from proteingym_tpu.models import protein_mpnn as mpnn

    enc = mpnn.encode(mpnn_params, mpnn_config, jnp.asarray(coords, jnp.float32))
    toks = jnp.asarray(mpnn.tokenize_sequence(sequence))
    rng = np.random.default_rng(seed)
    L = len(sequence)
    acc = np.zeros((L, 21))
    for _ in range(n_orders):
        order = jnp.asarray(
            np.argsort(np.abs(rng.standard_normal(L))).astype(np.int32)
        )
        acc += np.exp(np.asarray(mpnn.decode(mpnn_params, mpnn_config, enc,
                                             toks, order)))
    probs = acc[:, :20] / n_orders
    return probs / probs.sum(axis=1, keepdims=True)
