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

from proteingym_tpu.data.mutants import is_wt_row

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


def cherry_pairs_nj(matrix: np.ndarray, max_pairs: Optional[int] = None
                    ) -> List[Tuple[int, int]]:
    """Cherries from a native neighbor-joining tree with iterative pruning
    (the FastCherries recipe: take every sibling-leaf pair, prune them,
    repeat on the reduced tree — ref SiteRM/compute_fitness.py:19 runs
    cherryml's FastCherries on a FastTree topology). Falls back to the
    greedy min-Hamming pairing when the C++ library is unavailable.

    Processing the NJ merges in creation order implements the pruning
    bottom-up: each subtree carries at most one not-yet-paired leaf; when
    two such leaves meet at a merge they form a cherry of the (pruned)
    tree."""
    from proteingym_tpu import native as native_mod

    tree = native_mod.nj_tree(matrix)
    if tree is None:
        return cherry_pairs(matrix, max_pairs)
    left, right, _, _ = tree
    n = matrix.shape[0]
    rep = np.full(2 * n - 1, -1, np.int64)
    rep[:n] = np.arange(n)
    pairs: List[Tuple[int, int]] = []
    for k in range(n - 1):
        a, b = int(left[k]), int(right[k])
        ra, rb = rep[a], rep[b]
        if ra >= 0 and rb >= 0:
            pairs.append((int(ra), int(rb)))
            if max_pairs and len(pairs) >= max_pairs:
                return pairs
        else:
            rep[n + k] = ra if ra >= 0 else rb
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


def _weighted_subsample(
    matrix: np.ndarray,
    weights: Optional[np.ndarray],
    max_sequences: int,
    seed: int,
) -> np.ndarray:
    """Weighted without-replacement row subsample (shared by both SiteRM
    fitters). A tiny floor keeps zero-weight rows selectable so
    ``replace=False`` stays feasible when fewer than ``max_sequences`` rows
    have nonzero weight."""
    if matrix.shape[0] <= max_sequences:
        return matrix
    rs = np.random.RandomState(seed)
    p = None
    if weights is not None:
        w = np.asarray(weights, np.float64)
        w = w + (w.sum() + 1.0) * 1e-12
        p = w / w.sum()
    idx = rs.choice(matrix.shape[0], max_sequences, replace=False, p=p)
    return matrix[idx]


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
    pair_matrix = _weighted_subsample(matrix, weights, max_sequences, seed)
    pairs = cherry_pairs_nj(pair_matrix, max_pairs=max_pairs)
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
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if wt_focus_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            a, b = aa_idx[wt], aa_idx[mt]
            out[i] += logp[pos, a, b] - logp[pos, a, a]
    return out


# ---------------------------------------------------------------------------
# Real SiteRM: per-site 21-state reversible rate matrices (CherryML-style)
#
# The reference trains cherryml's ``learn_site_specific_rate_matrices`` with
# FastCherries pairing, LG(+gap) pseudocount regularization (strength 0.5),
# 20 site-rate categories, 64-step quantized cherry times, 100 epochs
# (ref SiteRM/compute_fitness.py:600-620 arg defaults, :83-130 model IO,
# expm scoring at :328-350).  Native rebuild, no cherryml/FastTree:
#   - cherries: greedy min-Hamming pairing (cherry_pairs above)
#   - cherry times + site rates: grid MLE under the prior matrix
#   - per-site reversible GTR (Q[a,b] = s[a,b] * pi[b], s symmetric)
#     trained with Adam on the quantized cherry counts blended with prior
#     pseudocounts; expm via eigendecomposition of the pi-symmetrized Q,
#     vmapped over all sites (one lax.scan over epochs -> MXU batched)
# ---------------------------------------------------------------------------

GAP = "-"
ALPHABET21 = AA20 + GAP


def read_rate_matrix(path) -> Tuple[np.ndarray, List[str]]:
    """Parse a cherryml-format rate matrix file (tab-separated; first line
    = states; rows = 'state<TAB>values...'), e.g. the reference's lg.txt /
    lg_with_gaps.txt."""
    lines = [l.rstrip("\n") for l in open(path) if l.strip()]
    states = lines[0].split()
    rows = []
    for line in lines[1:]:
        parts = line.split()
        rows.append([float(v) for v in parts[1:]])
    return np.asarray(rows, np.float64), states


def reorder_rate_matrix(
    Q: np.ndarray, states: Sequence[str], alphabet: str = ALPHABET21
) -> np.ndarray:
    """Permute a rate matrix from its file's state order into ``alphabet``
    order. The reference's shipped lg_with_gaps.txt is in PAML order
    (A R N D C Q E G H I L K M F P S T W Y V -), NOT alphabetical — using
    its rows unpermuted would silently assign LG rates to the wrong
    amino-acid pairs."""
    states = list(states)
    if sorted(states) != sorted(alphabet):
        raise ValueError(
            f"rate-matrix states {states} don't cover alphabet {alphabet!r}"
        )
    perm = np.asarray([states.index(a) for a in alphabet])
    return Q[np.ix_(perm, perm)]


def stationary_distribution(Q: np.ndarray) -> np.ndarray:
    """pi with pi @ Q = 0, via the null left-eigenvector."""
    w, v = np.linalg.eig(Q.T)
    pi = np.real(v[:, np.argmin(np.abs(w))])
    pi = np.abs(pi)
    return pi / pi.sum()


def uniform_prior(q: int = 21) -> np.ndarray:
    """Fallback prior when no LG file is supplied: all exchanges equal,
    expected rate 1."""
    Q = np.full((q, q), 1.0 / (q - 1))
    np.fill_diagonal(Q, -1.0)
    return Q


def _reversible_expm_factors(Q: np.ndarray):
    """(pi, U, lam, D^1/2, D^-1/2) so expm(tQ) = Dm @ U @ e^{lam t} @ U.T @ Dp."""
    pi = stationary_distribution(Q)
    dp = np.sqrt(pi)
    B = dp[:, None] * Q / dp[None, :]
    B = 0.5 * (B + B.T)  # symmetric up to float error for reversible Q
    lam, U = np.linalg.eigh(B)
    return pi, U, lam, dp


def _prior_transition_table(Q: np.ndarray, rates: np.ndarray,
                            taus: np.ndarray) -> np.ndarray:
    """(R, T, q, q) transition probabilities expm(r * tau * Q)."""
    _, U, lam, dp = _reversible_expm_factors(Q)
    rt = rates[:, None] * taus[None, :]                      # (R, T)
    e = np.exp(lam[None, None, :] * rt[..., None])           # (R, T, q)
    M = np.einsum("ak,rtk,bk->rtab", U, e, U)
    P = (1.0 / dp)[None, None, :, None] * M * dp[None, None, None, :]
    return np.clip(P, 1e-16, None)


@jax.custom_jvp
def _expm_sym_multi(B, taus):
    """expm(B * tau) for symmetric B over a vector of taus -> (G, q, q).

    The JVP uses the Loewner divided-difference matrix, which stays finite
    for degenerate eigenvalues — jnp.linalg.eigh's builtin gradient NaNs
    there (repeated eigenvalues are guaranteed at the prior-matrix init)."""
    lam, U = jnp.linalg.eigh(B)
    e = jnp.exp(lam[None, :] * taus[:, None])
    return jnp.einsum("ak,gk,bk->gab", U, e, U)


@_expm_sym_multi.defjvp
def _expm_sym_multi_jvp(primals, tangents):
    B, taus = primals
    dB, _ = tangents
    dB = 0.5 * (dB + dB.T)
    lam, U = jnp.linalg.eigh(B)
    e = jnp.exp(lam[None, :] * taus[:, None])                # (G, q)
    out = jnp.einsum("ak,gk,bk->gab", U, e, U)
    dlam = lam[None, :, None] - lam[None, None, :]           # (1, q, q)
    de = e[:, :, None] - e[:, None, :]                       # (G, q, q)
    safe = jnp.abs(dlam) > 1e-9
    F = jnp.where(
        safe,
        de / jnp.where(safe, dlam, 1.0),
        taus[:, None, None] * e[:, :, None],                 # limit t*e^{lt}
    )
    inner = U.T @ dB @ U
    dout = jnp.einsum("ai,gij,bj->gab", U, F * inner[None], U)
    return out, dout


@dataclasses.dataclass
class SiteRmGtrModel:
    rate_matrices: np.ndarray  # (L, q, q)
    # Diagnostic only: the learned per-site Q absorbs the rate scale, so
    # scoring uses expm(Q t) alone; these are the grid categories the
    # alternation assigned (useful for inspecting conservation).
    site_rates: np.ndarray     # (L,)
    t: float = 1.0
    alphabet: str = ALPHABET21


def fit_site_rate_matrices(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    prior_Q: Optional[np.ndarray] = None,
    regularization_strength: float = 0.5,
    num_rate_categories: int = 20,
    quantization_grid_num_steps: int = 64,
    epochs: int = 100,
    learning_rate: float = 0.1,
    t: float = 1.0,
    max_sequences: int = 1024,
    max_pairs: Optional[int] = None,
    seed: int = 0,
) -> SiteRmGtrModel:
    """Learn one reversible 21-state rate matrix per site from cherry
    transitions (the real SiteRM model class; see module banner)."""
    q = 21
    if prior_Q is None:
        prior_Q = uniform_prior(q)
    prior_pi = stationary_distribution(prior_Q)

    # ---- cherries on a subsample (O(N^2 L) distances + O(N^3) NJ)
    pair_matrix = _weighted_subsample(matrix, weights, max_sequences, seed)
    pairs = cherry_pairs_nj(pair_matrix, max_pairs=max_pairs)
    if not pairs:
        raise ValueError("need >= 2 sequences to extract cherries")
    L = matrix.shape[1]
    xs = np.stack([pair_matrix[i] for i, _ in pairs])  # (P, L) 0=gap coding
    ys = np.stack([pair_matrix[j] for _, j in pairs])
    # 21-state encoding: gap/indeterminate -> state 20
    X = np.where(xs > 0, xs - 1, 20)
    Y = np.where(ys > 0, ys - 1, 20)
    P_n = len(pairs)

    # ---- quantized time grid + rate categories
    taus = np.geomspace(1e-3, 10.0, 2 * quantization_grid_num_steps + 1)
    rates = np.geomspace(1.0 / 8, 8.0, num_rate_categories)

    prior_P = _prior_transition_table(prior_Q, rates, taus)  # (R, T, q, q)
    logP = np.log(prior_P).astype(np.float32)
    T_n, R_n = len(taus), len(rates)

    # ---- alternate: cherry times (rate=1 slice) -> site rates -> times
    # Chunked over sites/pairs: materializing the full (P, L, T) gather at
    # typical assay sizes (P~1024, L~1000, T=129) would be >0.5 GB.
    mid_rate = np.argmin(np.abs(np.log(rates)))  # category closest to 1
    site_rate_idx = np.full(L, mid_rate)
    site_chunk = max(1, (1 << 24) // max(P_n * T_n, 1))
    pair_chunk = max(1, (1 << 24) // max(R_n * L, 1))
    for _ in range(2):
        # cherry times: argmax_tau sum_i log P[r_i, tau, X[p,i], Y[p,i]]
        cherry_ll = np.zeros((P_n, T_n), np.float32)
        for s0 in range(0, L, site_chunk):
            sl = slice(s0, min(s0 + site_chunk, L))
            lp = logP[site_rate_idx[sl]]                  # (Ls, T, q, q)
            n_s = lp.shape[0]
            per = lp[np.arange(n_s)[None, :], :, X[:, sl], Y[:, sl]]
            cherry_ll += per.sum(1)                       # (P, T)
        time_idx = cherry_ll.argmax(1)                    # (P,)
        # site rates: argmax_r sum_p log P[r, tau_p, X, Y]
        rate_ll = np.zeros((R_n, L), np.float32)
        for p0 in range(0, P_n, pair_chunk):
            pl = slice(p0, min(p0 + pair_chunk, P_n))
            lp_t = logP[:, time_idx[pl]]                  # (R, Pc, q, q)
            n_p = lp_t.shape[1]
            per = lp_t[:, np.arange(n_p)[:, None], X[pl], Y[pl]]
            rate_ll += per.sum(1)                         # (R, L)
        site_rate_idx = rate_ll.argmax(0)                 # (L,)

    used = np.unique(time_idx)
    G = len(used)
    bucket_of = {g: k for k, g in enumerate(used)}
    tau_used = taus[used]                                  # (G,)

    # ---- counts (L, G, q, q): symmetrized cherry transitions
    counts = np.zeros((L, G, q, q), np.float32)
    site_ax = np.arange(L)
    for p in range(P_n):
        g = bucket_of[int(time_idx[p])]
        np.add.at(counts, (site_ax, g, X[p], Y[p]), 0.5)
        np.add.at(counts, (site_ax, g, Y[p], X[p]), 0.5)
    # prior pseudocounts: lambda-fraction of each bucket's mass, shaped as
    # pi_a * P_prior[r_i, tau_g, a, b]
    n_per_bucket = counts.sum((2, 3))                      # (L, G)
    prior_joint = (
        prior_pi[None, None, :, None]
        * prior_P[site_rate_idx[:, None], used[None, :]]   # (L, G, q, q)
    ).astype(np.float32)
    lam = regularization_strength
    counts = (1 - lam) * counts + lam * (
        n_per_bucket[..., None, None] * prior_joint
    )

    # ---- per-site reversible GTR via Adam (vmapped eigh expm)
    import optax

    counts_j = jnp.asarray(counts)
    tau_j = jnp.asarray(tau_used, jnp.float32)
    iu = np.triu_indices(q, 1)
    prior_s = np.log(
        np.maximum(prior_Q[iu] / prior_pi[iu[1]], 1e-8)
    ).astype(np.float32)

    def make_Q(s_raw, pi_raw):
        pi = jax.nn.softmax(pi_raw)
        s = jnp.zeros((q, q)).at[iu].set(jnp.exp(s_raw))
        s = s + s.T
        Q = s * pi[None, :]
        Q = Q - jnp.diag(Q.sum(1))
        return Q, pi

    def site_loss(s_raw, pi_raw, cnt):
        Q, pi = make_Q(s_raw, pi_raw)
        dp = jnp.sqrt(pi + 1e-12)
        B = dp[:, None] * Q / dp[None, :]
        B = 0.5 * (B + B.T)
        M = _expm_sym_multi(B, tau_j)                      # (G, q, q)
        P = (1.0 / dp)[None, :, None] * M * dp[None, None, :]
        return -jnp.sum(cnt * jnp.log(jnp.clip(P, 1e-16, None)))

    def total_loss(params):
        losses = jax.vmap(site_loss)(
            params["s"], params["pi"], counts_j
        )
        return losses.sum()

    params0 = {
        "s": jnp.tile(jnp.asarray(prior_s)[None], (L, 1)),
        "pi": jnp.tile(
            jnp.asarray(np.log(prior_pi).astype(np.float32))[None], (L, 1)
        ),
    }
    optimizer = optax.adam(learning_rate)

    @jax.jit
    def run(params):
        opt_state = optimizer.init(params)

        def body(carry, _):
            p, o = carry
            loss, g = jax.value_and_grad(total_loss)(p)
            updates, o = optimizer.update(g, o)
            return (optax.apply_updates(p, updates), o), loss

        (params, _), _ = jax.lax.scan(
            body, (params, opt_state), None, length=epochs
        )
        return params

    learned = run(params0)
    Qs = np.asarray(
        jax.vmap(lambda s, p: make_Q(s, p)[0])(learned["s"], learned["pi"])
    )
    return SiteRmGtrModel(
        rate_matrices=Qs, site_rates=rates[site_rate_idx], t=t
    )


def score_mutants_gtr(
    model: SiteRmGtrModel,
    wt_focus_seq: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    """Reference scoring identity (compute_fitness.py:166-194): relative
    sum over mutated sites of log expm(Q_i t)[x,y] - log expm(Q_i t)[x,x]."""
    return score_from_rate_matrices(
        model.rate_matrices, model.t, wt_focus_seq, mutants,
        alphabet=model.alphabet, offset_idx=offset_idx,
    )


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
    logp = np.log(np.maximum(p, 1e-30))
    aa_idx = {a: i for i, a in enumerate(alphabet)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            a, b = aa_idx[wt], aa_idx[mt]
            out[i] += logp[pos, a, b] - logp[pos, a, a]
    return out
