"""Profile HMM: hmmbuild-equivalent estimation + batched forward algorithm.

The reference shells out to HMMER's ``hmmbuild`` and a forward-algorithm
example binary and scores log p(seq) - log p(WT)
(ref: proteingym/baselines/HMM/score_hmm.py:9-111). Here both halves are
native:

  - ``build_profile_hmm``: match-state emissions and M/D transition
    probabilities from weighted MSA counts over focus columns (gap in a
    focus column = delete state), Laplace-style pseudocounts, insert
    emissions = background composition.
  - ``score_sequences``: the full M/I/D forward recursion in log space as a
    ``lax.scan`` over residues. The within-step delete chain
    D_j = logaddexp(M_{j-1} + a_MD, D_{j-1} + a_DD) is a first-order linear
    recurrence in the (logsumexp, +) semiring, solved with
    ``lax.associative_scan`` (log-depth) so one scan step is O(L) work —
    the TPU-native replacement for HMMER's per-cell C loop.

Scores are log-odds vs a background-composition null model, so indel
assays (length changes) are comparable, like HMMER bit scores.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

AA_ORDER = "ACDEFGHIKLMNPQRSTVWY"
NEG_BIG = -1e30


@dataclasses.dataclass
class ProfileHMM:
    """Log-space parameters. L = number of match states (focus columns)."""

    log_e_match: np.ndarray  # (L, 20) match emission log-probs
    log_bg: np.ndarray  # (20,) background (insert emission / null model)
    # transitions, index j = state j (1-based model column j+1 boundary)
    log_a: dict  # keys: MM, MI, MD, IM, II, DM, DD -> (L,) arrays

    @property
    def L(self) -> int:
        return self.log_e_match.shape[0]


def build_profile_hmm(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    emission_pseudocount: float = 0.5,
    transition_pseudocount: float = 0.5,
    insert_open: float = 0.01,
    insert_extend: float = 0.4,
) -> ProfileHMM:
    """Estimate a profile HMM from an (N, L) focus-column matrix
    (0 = gap, 1..20 = AA in '-ACDEFGHIKLMNPQRSTVWY' order).

    Insert states are parameterized by fixed open/extend priors (the focus-
    column matrix has no insert observations by construction — the reference
    MSA preprocessing drops lowercase insert columns the same way).
    """
    matrix = np.asarray(matrix)
    n, L = matrix.shape
    if weights is None:
        weights = np.ones(n)
    weights = np.asarray(weights, dtype=np.float64)

    onehot = np.zeros((n, L, 20))
    aa = matrix.astype(np.int64) - 1
    rows, cols = np.nonzero(aa >= 0)
    onehot[rows, cols, aa[rows, cols]] = 1.0

    counts = np.einsum("n,nlq->lq", weights, onehot)
    e_match = (counts + emission_pseudocount) / (
        counts.sum(axis=1, keepdims=True) + 20 * emission_pseudocount
    )
    bg_counts = counts.sum(axis=0)
    bg = (bg_counts + emission_pseudocount) / (
        bg_counts.sum() + 20 * emission_pseudocount
    )

    # M/D transition counts from consecutive-column gap patterns
    present = matrix > 0  # (N, L) match vs delete
    pc = transition_pseudocount
    w = weights[:, None]
    prev = present[:, :-1]
    nxt = present[:, 1:]
    c_mm = (w * (prev & nxt)).sum(axis=0)
    c_md = (w * (prev & ~nxt)).sum(axis=0)
    c_dm = (w * (~prev & nxt)).sum(axis=0)
    c_dd = (w * (~prev & ~nxt)).sum(axis=0)

    # boundary column 0 -> begin handled by caller via a BEGIN->M1/D1 mix
    m_tot = c_mm + c_md + 2 * pc
    d_tot = c_dm + c_dd + 2 * pc
    a_md = np.concatenate([(c_md + pc) / m_tot, [1e-4]])  # last col: ~no delete out
    a_dm = np.concatenate([(c_dm + pc) / d_tot, [1.0 - 1e-4]])
    a_dd = 1.0 - a_dm
    a_mi = np.full(L, insert_open)
    a_ii = np.full(L, insert_extend)
    a_im = 1.0 - a_ii
    a_mm = 1.0 - a_md - a_mi

    with np.errstate(divide="ignore"):
        log_a = {
            "MM": np.log(a_mm),
            "MI": np.log(a_mi),
            "MD": np.log(a_md),
            "IM": np.log(a_im),
            "II": np.log(a_ii),
            "DM": np.log(a_dm),
            "DD": np.log(a_dd),
        }
    return ProfileHMM(
        log_e_match=np.log(e_match), log_bg=np.log(bg), log_a=log_a
    )


def _encode(seq: str) -> np.ndarray:
    """Canonical AAs -> 0..19; degenerate residues (X/B/Z/U...) -> 20
    (emitted from the background, log-odds 0, as HMMER does); -1 is
    RESERVED for batch padding (freezes the recursion)."""
    idx = {a: i for i, a in enumerate(AA_ORDER)}
    return np.asarray(
        [idx.get(c.upper(), len(AA_ORDER)) for c in seq], dtype=np.int32
    )


def _lse(a, b):
    return jnp.logaddexp(a, b)


def _delete_chain(u, c):
    """Solve D_j = logaddexp(u_j, D_{j-1} + c_j), D_0 base included in u_0,
    via associative scan in the (logsumexp, +) semiring."""

    def combine(x, y):
        cx, ux = x
        cy, uy = y
        return cx + cy, _lse(uy, ux + cy)

    _, d = jax.lax.associative_scan(combine, (c, u))
    return d


def forward_logprob(
    hmm: ProfileHMM,
    tokens: jnp.ndarray,
    insert_open: float = 0.01,
    insert_extend: float = 0.4,
) -> jnp.ndarray:
    """Log-odds forward score of one padded token row (log p(seq|HMM) -
    log p(seq|bg)). tokens: (T,) int32 with -1 padding.

    States: BEGIN (consumes nothing, only occupied before the first
    residue), I_0 (N-terminal inserts), M_j/I_j/D_j for model columns
    j = 1..L. Insert emissions equal the background, so their log-odds
    emission term is zero.
    """
    L = hmm.L
    e_m = jnp.asarray(hmm.log_e_match, jnp.float32)  # (L, 20)
    bg = jnp.asarray(hmm.log_bg, jnp.float32)
    a = {k: jnp.asarray(v, jnp.float32) for k, v in hmm.log_a.items()}

    log_i_open = float(np.log(insert_open))
    log_i_ext = float(np.log(insert_extend))
    log_i_exit = float(np.log(1.0 - insert_extend))
    # BEGIN -> {M1, D1, I0}
    b_d1 = a["MD"][0]
    b_m1 = jnp.log(jnp.maximum(1.0 - jnp.exp(b_d1) - insert_open, 1e-8))

    m0 = jnp.full(L, NEG_BIG)
    i0 = jnp.full(L, NEG_BIG)
    # chain multiplier into column j is the DD transition out of column j-1
    dd_in = jnp.concatenate([jnp.zeros(1), a["DD"][:-1]])
    # deletes reachable before any residue: BEGIN -> D_1 -> D_2 ...
    u0 = jnp.full(L, NEG_BIG).at[0].set(b_d1)
    d0 = _delete_chain(u0, dd_in)

    def step(carry, tok):
        begin, ins0, m, i, d = carry
        is_pad = tok < 0
        is_degen = tok >= e_m.shape[1]  # X/B/Z/U: background emission
        tok_c = jnp.clip(tok, 0, e_m.shape[1] - 1)
        # log-odds match emission; degenerate residues contribute 0
        # (emitted from the background) but still advance the recursion
        emit_m = jnp.where(is_degen, 0.0, e_m[:, tok_c] - bg[tok_c])

        new_ins0 = _lse(begin + log_i_open, ins0 + log_i_ext)
        entry_m1 = _lse(begin + b_m1, ins0 + log_i_exit)
        prev_m = jnp.concatenate([jnp.array([entry_m1]), m[:-1] + a["MM"][:-1]])
        prev_i = jnp.concatenate([jnp.array([NEG_BIG]), i[:-1] + a["IM"][:-1]])
        prev_d = jnp.concatenate([jnp.array([NEG_BIG]), d[:-1] + a["DM"][:-1]])
        new_m = emit_m + _lse(_lse(prev_m, prev_i), prev_d)
        new_i = _lse(m + a["MI"], i + a["II"])
        # same-step delete chain seeded by the new match scores
        u = jnp.concatenate([jnp.array([NEG_BIG]), new_m[:-1] + a["MD"][:-1]])
        new_d = _delete_chain(u, dd_in)

        # BEGIN is unreachable once a residue has been consumed
        new_begin = jnp.where(is_pad, begin, NEG_BIG)
        ins0 = jnp.where(is_pad, ins0, new_ins0)
        m = jnp.where(is_pad, m, new_m)
        i = jnp.where(is_pad, i, new_i)
        d = jnp.where(is_pad, d, new_d)
        return (new_begin, ins0, m, i, d), None

    (_, _, m, i, d), _ = jax.lax.scan(step, (0.0, NEG_BIG, m0, i0, d0), tokens)
    # termination: M_L / I_L / D_L -> END (exit prob absorbed as 1)
    return _lse(_lse(m[-1], i[-1]), d[-1])


def score_sequences(
    hmm: ProfileHMM, sequences: Sequence[str], batch_size: int = 256
) -> np.ndarray:
    """Batched log-odds forward scores for arbitrary-length sequences."""
    toks = [_encode(s) for s in sequences]
    T = max(len(t) for t in toks)
    out = np.zeros(len(toks))

    fwd = jax.jit(jax.vmap(lambda row: forward_logprob(hmm, row)))
    for start in range(0, len(toks), batch_size):
        blk = toks[start : start + batch_size]
        rows = np.full((len(blk), T), -1, dtype=np.int32)
        for bi, t in enumerate(blk):
            rows[bi, : len(t)] = t
        out[start : start + len(blk)] = np.asarray(fwd(jnp.asarray(rows)))
    return out
