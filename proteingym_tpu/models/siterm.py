"""SiteRM: per-site rate-matrix phylogenetic model (CherryML-style).

The reference (ref: proteingym/baselines/SiteRM/compute_fitness.py:60-200,
_datasets.py) learns one reversible rate matrix PER SITE with CherryML
(cherry-pair composite likelihood over a FastTree phylogeny) and scores

  log P(y | x, t) = log P(x | x, t)
      + sum_{i: x_i != y_i} [ log P(y_i | x_i, t) - log P(x_i | x_i, t) ]

from matrix exponentials of the per-site rate matrices (:135-200).

TPU-native rebuild (no FastTree/cherryml binaries, SURVEY.md §2.3):
  - cherries: greedy minimum-Hamming pairing of MSA rows — the role of
    FastTree's tree is only to supply closely-related pairs, and nearest
    neighbors are exactly the cherries CherryML extracts.
  - per-site model: F81-style reversible rates Q_i with site-specific
    stationary distribution pi_i (weighted counts + pseudocounts) and a
    per-site rate mu_i fit by maximizing the cherry-transition likelihood.
    F81's matrix exponential is closed-form —
      P_i(t)[a, b] = e^{-mu_i t} * 1[a == b] + (1 - e^{-mu_i t}) * pi_i[b]
    — so the whole fit + scoring pipeline is analytic array math (vmapped
    over sites), no expm loop.
  - ``score_from_rate_matrices`` accepts externally-learned per-site Q
    stacks (e.g. converted CherryML pickles) and uses jax expm for parity.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AA20 = "ACDEFGHIKLMNPQRSTVWY"


# ---------------------------------------------------------------------------
# Cherry extraction (greedy nearest-neighbor matching)
# ---------------------------------------------------------------------------

def cherry_pairs(matrix: np.ndarray, max_pairs: Optional[int] = None
                 ) -> List[Tuple[int, int]]:
    """Greedy min-Hamming pairing of rows; each row used at most once.
    O(N^2 L) — callers must subsample deep MSAs first (fit_siterm does)."""
    n = matrix.shape[0]
    nongap = matrix > 0
    sim = np.zeros((n, n))
    for i in range(n):
        both = nongap[i] & nongap
        match = (matrix == matrix[i]) & both
        denom = np.maximum(both.sum(1), 1)
        sim[i] = match.sum(1) / denom
    np.fill_diagonal(sim, -1)
    used = np.zeros(n, bool)
    pairs = []
    order = np.dstack(np.unravel_index(np.argsort(-sim, axis=None), sim.shape))[0]
    for i, j in order:
        if used[i] or used[j] or i == j:
            continue
        used[i] = used[j] = True
        pairs.append((int(i), int(j)))
        if max_pairs and len(pairs) >= max_pairs:
            break
    return pairs


# ---------------------------------------------------------------------------
# F81-style per-site model
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SiteRmModel:
    pi: np.ndarray  # (L, q) site stationary distributions
    mu: np.ndarray  # (L,) site rates
    t: float = 1.0
    alphabet: str = AA20

    def transition_prob(self) -> np.ndarray:
        """(L, q, q) P_i(t) closed-form F81 exponential."""
        e = np.exp(-self.mu * self.t)[:, None, None]
        eye = np.eye(self.pi.shape[1])[None]
        return e * eye + (1.0 - e) * self.pi[:, None, :]


def estimate_site_frequencies(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    q: int = 20,
    pseudocount: float = 0.5,
) -> np.ndarray:
    n, L = matrix.shape
    if weights is None:
        weights = np.ones(n)
    onehot = np.zeros((n, L, q))
    aa = matrix.astype(np.int64) - 1
    r, c = np.nonzero(aa >= 0)
    onehot[r, c, aa[r, c]] = 1.0
    counts = np.einsum("n,nlq->lq", weights, onehot) + pseudocount
    return counts / counts.sum(1, keepdims=True)


def fit_site_rates(
    matrix: np.ndarray,
    pi: np.ndarray,
    pairs: Sequence[Tuple[int, int]],
    t: float = 1.0,
    steps: int = 200,
    learning_rate: float = 0.1,
) -> np.ndarray:
    """Per-site mu maximizing the cherry-transition likelihood.

    For F81, P(y|x,t) = e^{-mu t} 1[x==y] + (1 - e^{-mu t}) pi[y]; the
    likelihood over cherries factorizes per site, so all L one-parameter
    problems solve in one vmapped Adam loop.
    """
    import optax

    L = matrix.shape[1]
    xs = np.stack([matrix[i] for i, _ in pairs])  # (P, L)
    ys = np.stack([matrix[j] for _, j in pairs])
    valid = (xs > 0) & (ys > 0)
    same = (xs == ys) & valid
    pi_y = np.zeros(xs.shape)
    ok = ys > 0
    pi_y[ok] = pi[np.nonzero(ok)[1], ys[ok] - 1]

    samej = jnp.asarray(same)
    validj = jnp.asarray(valid)
    pi_yj = jnp.asarray(pi_y)

    def loss_fn(raw_mu):
        mu = jax.nn.softplus(raw_mu)  # (L,)
        e = jnp.exp(-mu * t)[None, :]  # (1, L) -> (P, L)
        p = jnp.where(samej, e + (1 - e) * pi_yj, (1 - e) * pi_yj)
        ll = jnp.where(validj, jnp.log(jnp.maximum(p, 1e-12)), 0.0)
        return -jnp.sum(ll)

    raw = jnp.zeros(L)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(raw)

    def step(raw, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(raw)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(raw, updates), opt_state, loss

    @jax.jit
    def run(raw, opt_state):  # all steps in one dispatch (one lax.scan)
        def body(carry, _):
            r, o = carry
            r, o, loss = step(r, o)
            return (r, o), loss

        (raw, opt_state), _ = jax.lax.scan(
            body, (raw, opt_state), None, length=steps
        )
        return raw

    return np.asarray(jax.nn.softplus(run(raw, opt_state)))


def fit_siterm(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    t: float = 1.0,
    max_pairs: Optional[int] = None,
    max_sequences: int = 2048,
    seed: int = 0,
) -> SiteRmModel:
    """Site frequencies use the FULL alignment; the O(N^2 L) cherry
    pairing runs on a (weighted) subsample of ``max_sequences`` rows — a
    100k-row MSA would otherwise build a 20+ GB similarity matrix."""
    pi = estimate_site_frequencies(matrix, weights)
    pair_matrix = matrix
    if matrix.shape[0] > max_sequences:
        rs = np.random.RandomState(seed)
        p = None
        if weights is not None:
            w = np.asarray(weights, np.float64)
            p = w / w.sum()
        idx = rs.choice(matrix.shape[0], max_sequences, replace=False, p=p)
        pair_matrix = matrix[idx]
    pairs = cherry_pairs(pair_matrix, max_pairs=max_pairs)
    mu = fit_site_rates(pair_matrix, pi, pairs, t=t)
    return SiteRmModel(pi=pi, mu=mu, t=t)


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------

def score_mutants(
    model: SiteRmModel,
    wt_focus_seq: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    """Relative transition log-lik (the log P(x|x,t) offset is constant
    across an assay and cancels in rank metrics; ref identity at :166-194)."""
    p = model.transition_prob()
    logp = np.log(np.maximum(p, 1e-30))
    aa_idx = {a: i for i, a in enumerate(model.alphabet)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if not m or m.upper() == "WT":
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if wt_focus_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            a, b = aa_idx[wt], aa_idx[mt]
            out[i] += logp[pos, a, b] - logp[pos, a, a]
    return out


def score_from_rate_matrices(
    rate_matrices: np.ndarray,
    t: float,
    wt_focus_seq: str,
    mutants: Sequence[str],
    alphabet: str = AA20,
    offset_idx: int = 1,
) -> np.ndarray:
    """Score with externally-learned per-site rate matrices (L, q, q) via
    a vmapped matrix exponential (parity hook for CherryML models)."""
    from jax.scipy.linalg import expm

    p = np.asarray(jax.vmap(expm)(jnp.asarray(rate_matrices * t)))
    model = SiteRmModel(pi=np.zeros(p.shape[:2]), mu=np.zeros(p.shape[0]),
                        t=t, alphabet=alphabet)
    logp = np.log(np.maximum(p, 1e-30))
    aa_idx = {a: i for i, a in enumerate(alphabet)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if not m or m.upper() == "WT":
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            a, b = aa_idx[wt], aa_idx[mt]
            out[i] += logp[pos, a, b] - logp[pos, a, a]
    return out
