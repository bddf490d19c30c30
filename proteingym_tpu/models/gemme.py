"""GEMME: global epistatic model over evolutionary (tree) distances.

The reference wraps the external GEMME package (Java JET2 + R + python2,
ref: proteingym/baselines/gemme/compute_fitness.py:1-121 drives it via
subprocess). This module reimplements the published algorithm natively
(SURVEY.md §2.3 "reimplement scoring math natively where feasible").

Equation-level mapping to Laine, Karami & Carbone 2019 (MBE 36(8),
"GEMME: A Simple and Fast Global Epistatic Model Predicting Mutational
Effects") — items marked [reconstruction] are defensible parameter /
normalization choices where the paper or the GEMME R sources pin no
exact value we can consult offline:

  1. TRACE LEVELS T(i) (paper §"Conservation levels", via JET2 /
     Engelen et al. 2009): per-position ranked evolutionary traces from
     phylogenetic trees. We build neighbor-joining trees (native
     ``pgym_nj_tree``, the repo's FastTree stand-in) over weighted
     samples of the alignment and compute Mihalek-style ranked ET: cut
     the tree at increasing root distances; rank(i) = smallest number
     of groups such that every group is monomorphic at i;
     T(i) = 1 - (rank(i)-1)/(n_internal). Globally conserved columns
     get T=1; columns varying inside the shallowest cherries get T->0;
     columns whose variation tracks the deepest splits rank in between,
     exactly the ET ordering JET2 encodes. Traces are averaged over
     ``n_trace_trees`` independently sampled trees (JET2 averages over
     Gibbs-sampled trees). Gaps count as a 21st symbol for monomorphism
     [reconstruction: JET2's gap treatment].
  2. EPISTATIC TERM (paper §"Global epistatic model"):
         dE_epi(a,i) = -T(i) * Dmin(a,i) / Dmax
     where Dmin(a,i) = min over sequences s carrying a at i of the
     evolutionary distance D(q,s) between query and s, and unobserved
     variants get Dmax * (1 + margin). D(q,s) is the PATRISTIC distance
     along the NJ tree (sum of branch lengths on the q..s path, branch
     lengths from the same p-distance matrix FastTree/JET2 operate on).
     Sequences outside the tree sample get D via an affine p-distance ->
     patristic calibration fitted on the sampled leaves [reconstruction:
     GEMME computes distances for all sequences; we exactly match the
     tree scale on the sample and extend it to the full alignment].
  3. INDEPENDENT TERM (paper §"Independent model"):
         dE_ind(a,i) = T(i) * log f_i(a)
     with weighted, pseudocounted column frequencies f_i; the scorer
     consumes per-variant deltas table[mt] - table[wt], which realizes
     the paper's log(f_i(a)/f_i(wt)) ratio.
  4. NORMALIZATION + COMBINATION (paper §"Combining ..."): both tables
     are affinely rescaled to [0,1] (rank-preserving; the benchmark
     metric is Spearman) and combined as
         dE_combi = (1-alpha) * dE_epi + alpha * dE_ind,
     alpha = 0.4 + 0.2 * exp(-Neff/30)  [reconstruction: the paper
     motivates leaning on the independent model when the alignment is
     too shallow to estimate minimal distances reliably; the exact
     schedule is ours]. Multi-mutants combine additively over positions
     (paper: summed single-site predictions).

When the native NJ library is unavailable (or the MSA has < 4 rows) the
model falls back to the previous surrogate: global-identity distances +
weighted-entropy conservation (``method == "surrogate"``).

ESCOTT (ref escott/compute_fitness.py) rides on this model with
RSA-modulated conservation — see pipeline/scorers.py:score_gemme.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from proteingym_tpu.data.mutants import is_wt_row

AA20 = "ACDEFGHIKLMNPQRSTVWY"


@dataclasses.dataclass
class GemmeModel:
    pred_epi: np.ndarray  # (L, 20) epistatic effect (higher = fitter)
    pred_ind: np.ndarray  # (L, 20) independent effect
    conservation: np.ndarray  # (L,) trace levels T(i)
    wt_codes: np.ndarray  # (L,)
    alphabet: str = AA20
    alpha: float = 0.5  # independent-model weight in the combination
    method: str = "tree"  # "tree" (faithful) or "surrogate" (fallback)

    def combined(self) -> np.ndarray:
        return (1.0 - self.alpha) * self.pred_epi + self.alpha * self.pred_ind


# ---------------------------------------------------------------------------
# Tree machinery (JET2-style traces + patristic distances)
# ---------------------------------------------------------------------------


def _p_distance_to_query(matrix: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Fractional mismatch to the query over non-gap positions, matching
    the native NJ builder's convention (pgym_native.cpp:pgym_nj_tree:
    matches over min(nongap_i, nongap_j))."""
    nongap = (matrix > 0).sum(1)
    q_nongap = int((query > 0).sum())
    matches = ((matrix == query[None]) & (matrix > 0)).sum(1)
    den = np.minimum(nongap, q_nongap)
    return np.where(den > 0, 1.0 - matches / np.maximum(den, 1), 1.0)


def _patristic_from_leaf(tree, n: int, leaf: int) -> np.ndarray:
    """Distances from one leaf to every leaf along the NJ merge tree
    (branch lengths clamped at 0 — NJ can emit slightly negative ones)."""
    left, right, llen, rlen = tree
    tot = 2 * n - 1
    adj: list = [[] for _ in range(tot)]
    for k in range(n - 1):
        p = n + k
        for child, w in ((int(left[k]), max(float(llen[k]), 0.0)),
                         (int(right[k]), max(float(rlen[k]), 0.0))):
            adj[p].append((child, w))
            adj[child].append((p, w))
    dist = np.full(tot, -1.0)
    dist[leaf] = 0.0
    stack = [leaf]
    while stack:
        u = stack.pop()
        for v, w in adj[u]:
            if dist[v] < 0:
                dist[v] = dist[u] + w
                stack.append(v)
    return dist[:n]


def _ranked_et_trace(sub: np.ndarray, tree) -> np.ndarray:
    """Mihalek-style ranked evolutionary trace on one NJ tree.

    Cutting the rooted merge tree at increasing root distance splits it
    into groups; rank(i) = smallest group count at which every group is
    monomorphic at column i. Because root distance is monotone along
    root->leaf paths, "split the j shallowest internal nodes" is exactly
    the ET cut sequence, so rank(i) = 2 + (depth order index of the
    deepest polymorphic node), or 1 when the column is globally
    monomorphic. Returns T(i) = 1 - (rank-1)/n_internal in (0, 1]."""
    left, right, llen, rlen = tree
    n, L = sub.shape
    m = n - 1
    sym = np.empty((2 * n - 1, L), np.int16)
    sym[:n] = sub
    mono = np.ones((2 * n - 1, L), bool)
    for k in range(m):  # children always precede their parent
        a, b, p = int(left[k]), int(right[k]), n + k
        same = mono[a] & mono[b] & (sym[a] == sym[b])
        mono[p] = same
        sym[p] = np.where(same, sym[a], -1)
    depth = np.zeros(2 * n - 1)
    for k in range(m - 1, -1, -1):  # top-down from the root (last merge)
        p = n + k
        depth[int(left[k])] = depth[p] + max(float(llen[k]), 1e-9)
        depth[int(right[k])] = depth[p] + max(float(rlen[k]), 1e-9)
    order = np.argsort(depth[n:], kind="stable")  # ascending root distance
    rank_of = np.empty(m, np.int64)
    rank_of[order] = np.arange(m)
    poly = ~mono[n:]  # (m, L): node needs splitting at this column
    deepest = np.where(poly, rank_of[:, None], -1).max(0)  # (L,)
    rank = np.where(deepest < 0, 1, deepest + 2).astype(np.float64)
    return 1.0 - (rank - 1.0) / m


def _sample_rows(n: int, weights: np.ndarray, size: int, focus_row: int,
                 rng: np.random.Generator) -> np.ndarray:
    if size >= n:
        return np.arange(n)
    p = np.asarray(weights, np.float64)
    p = p / p.sum()
    idx = rng.choice(n, size=size, replace=False, p=p)
    if focus_row not in idx:
        idx[0] = focus_row
    return np.unique(idx)


# ---------------------------------------------------------------------------
# Fitting
# ---------------------------------------------------------------------------


def _column_stats(matrix, weights, q):
    n, L = matrix.shape
    onehot = np.zeros((n, L, q))
    aa = matrix.astype(np.int64) - 1
    r, c = np.nonzero(aa >= 0)
    onehot[r, c, aa[r, c]] = 1.0
    counts = np.einsum("n,nlq->lq", weights, onehot)
    freq = (counts + 0.05) / (counts.sum(1, keepdims=True) + 0.05 * q)
    return counts, freq


def _entropy_conservation(freq: np.ndarray, q: int) -> np.ndarray:
    f = np.maximum(freq, 1e-12)
    ent = -(f * np.log(f)).sum(1)
    return 1.0 - ent / np.log(q)


def _min_carrier_distance(matrix, dist, q):
    """(L, q) minimal distance-to-query among carriers of each AA."""
    L = matrix.shape[1]
    dmin = np.full((L, q), np.inf)
    for a in range(1, q + 1):
        carrier = matrix == a  # (N, L)
        masked = np.where(carrier, dist[:, None], np.inf)
        dmin[:, a - 1] = masked.min(0)
    return dmin


def _normalize(x: np.ndarray) -> np.ndarray:
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo + 1e-12)


def fit_gemme(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    focus_row: int = 0,
    q: int = 20,
    tree_size: int = 512,
    n_trace_trees: int = 3,
    seed: int = 0,
    use_tree: Optional[bool] = None,
) -> GemmeModel:
    """matrix: (N, L) int codes (0 gap, 1..20 AA), focus/query row first.

    ``tree_size`` bounds the NJ problem (weighted sample, query always
    included); ``n_trace_trees`` trees are averaged for the trace levels
    (JET2 averages over sampled trees). ``use_tree=False`` forces the
    identity-distance surrogate."""
    n, L = matrix.shape
    if weights is None:
        weights = np.ones(n)
    query = matrix[focus_row]
    neff = float(np.asarray(weights).sum())

    tree = None
    sample_idx = None
    if use_tree is not False and n >= 4:
        from proteingym_tpu import native

        rng = np.random.default_rng(seed)
        sample_idx = _sample_rows(n, weights, tree_size, focus_row, rng)
        tree = native.nj_tree(matrix[sample_idx].astype(np.int8))

    counts, freq = _column_stats(matrix, weights, q)

    if tree is None:
        # ---- surrogate fallback (no native NJ): identity distances +
        # entropy conservation (the pre-r4 model)
        dist = _p_distance_to_query(matrix, query)
        cons = _entropy_conservation(freq, q)
        method = "surrogate"
    else:
        # ---- faithful path -------------------------------------------
        sub = matrix[sample_idx]
        qpos = int(np.nonzero(sample_idx == focus_row)[0][0])
        ns = len(sample_idx)

        # trace levels: ranked ET averaged over independently sampled
        # trees (first tree doubles as the distance tree). When the
        # sample already covers the whole alignment, resampling would
        # rebuild byte-identical trees — one is enough.
        traces = [_ranked_et_trace(sub, tree)]
        if ns < n:
            for t in range(1, n_trace_trees):
                idx_t = _sample_rows(n, weights, tree_size, focus_row, rng)
                tree_t = native.nj_tree(matrix[idx_t].astype(np.int8))
                if tree_t is not None:
                    traces.append(_ranked_et_trace(matrix[idx_t], tree_t))
        cons = np.mean(traces, axis=0)

        # patristic distances to the query for the sampled leaves, then
        # an affine p-distance -> patristic calibration for the rest
        pat = _patristic_from_leaf(tree, ns, qpos)
        pdist = _p_distance_to_query(matrix, query)
        pd_sample = pdist[sample_idx]
        A = np.stack([pd_sample, np.ones(ns)], 1)
        coef, *_ = np.linalg.lstsq(A, pat, rcond=None)
        slope = max(float(coef[0]), 0.0)
        dist = np.maximum(slope * pdist + float(coef[1]), 0.0)
        dist[sample_idx] = pat  # exact tree distances where available
        method = "tree"

    dmin = _min_carrier_distance(matrix, dist, q)
    worst = float(dist.max()) if n > 1 else 1.0
    dmin[~np.isfinite(dmin)] = worst * 1.5  # unseen AA: beyond max distance
    dnorm = dmin / max(worst, 1e-12)

    pred_epi = -cons[:, None] * dnorm
    pred_ind = cons[:, None] * np.log(freq)
    # alpha: lean on the independent model for shallow families
    # [reconstruction]; bounded so both signals always contribute
    alpha = float(np.clip(0.4 + 0.2 * np.exp(-neff / 30.0), 0.4, 0.6))

    return GemmeModel(
        pred_epi=_normalize(pred_epi),
        pred_ind=_normalize(pred_ind),
        conservation=cons,
        wt_codes=query,
        alpha=alpha,
        method=method,
    )


def score_mutants(
    model: GemmeModel,
    wt_focus_seq: str,
    mutants: Sequence[str],
    mode: str = "combined",
    offset_idx: int = 1,
) -> np.ndarray:
    """Delta vs WT per mutated position, summed (higher = fitter)."""
    table = {
        "combined": model.combined(),
        "epistatic": model.pred_epi,
        "independent": model.pred_ind,
    }[mode]
    aa_idx = {a: i for i, a in enumerate(model.alphabet)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if wt_focus_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out


# ---------------------------------------------------------------------------
# ESCOTT: exact reference ingestion recipe
# (ref escott/compute_fitness.py — the predictor itself runs in the
# authors' Docker image; the importable pure-Python pieces are the MSA
# sanitization and the landscape->per-mutant score extraction, both
# replicated verbatim here and parity-tested against the imported
# reference functions in tests/test_reference_recipe_parity.py)
# ---------------------------------------------------------------------------

ESCOTT_AA_VOCAB = "ACDEFGHIKLMNPQRSTVWY"
_ESCOTT_AA2IDX = {a: i for i, a in enumerate(ESCOTT_AA_VOCAB)}


def escott_extract_scores(predictions: np.ndarray, mutants: Sequence[str],
                          offset: int) -> list:
    """Per-mutant scores from a full (L, 20) mutational landscape —
    verbatim reference extraction (ref escott/compute_fitness.py:92-101,
    extract_scores): RAW landscape entries summed over sub-mutants (the
    evolCombi landscape is already a delta-vs-WT surface, so no WT
    subtraction), positions shifted by the first PDB chunk's start."""
    scores = []
    for mut in mutants:
        score = 0
        for m in str(mut).split(":"):
            pos, mut_aa = int(m[1:-1]) - offset, m[-1]
            score += predictions[pos, _ESCOTT_AA2IDX[mut_aa]]
        scores.append(score)
    return scores


def escott_parse_alignment(lines: Sequence[str]) -> dict:
    """FASTA-alignment sanitization exactly as the reference feeds ESCOTT
    (ref escott/compute_fitness.py:75-88, parse_alignment): header '_'
    and '.' characters dropped (they break ESCOTT), sequence lines
    uppercased with '.' gaps rewritten to '-'."""
    seqs: dict = {}
    seq_id = None
    for line in lines:
        if line[:1] == ">":
            seq_id = line[1:].strip().replace("_", "").replace(".", "")
            seqs[seq_id] = ""
        else:
            seqs[seq_id] += line.strip().upper().replace(".", "-")
    return seqs
