"""GEMME-class predictor: evolutionary-distance epistatic model, native.

The reference wraps the external GEMME package (Java JET2 + R + python2,
ref: proteingym/baselines/gemme/compute_fitness.py:1-121 drives it via
subprocess). This module reimplements the scoring math natively
(SURVEY.md §2.3 "reimplement scoring math natively where feasible"):

GEMME (Laine et al. 2019) predicts the effect of substituting AA ``a`` at
position ``i`` from two signals:
  1. EPISTATIC: the minimal evolutionary distance between the query and
     any homolog carrying ``a`` at ``i`` — if only remote homologs carry
     the variant, many compensating changes are implied and the mutation
     is predicted deleterious. Distance here = 1 - global sequence
     identity to the query (the tree-distance surrogate).
  2. INDEPENDENT: the (weighted) log-frequency of ``a`` at ``i``.
Both are scaled by per-position conservation levels (JET2 trace
surrogate: weighted-entropy conservation), and the final prediction is
the average of the normalized epistatic and independent parts; unseen
AAs get the worst observed distance. Multi-mutants combine as the sum of
per-position effects weighted by conservation rank (GEMME's multi-site
scheme).
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
    conservation: np.ndarray  # (L,)
    wt_codes: np.ndarray  # (L,)
    alphabet: str = AA20

    def combined(self) -> np.ndarray:
        return 0.5 * (self.pred_epi + self.pred_ind)


def _conservation(matrix: np.ndarray, weights: np.ndarray, q: int = 20
                  ) -> np.ndarray:
    """JET-like conservation: 1 - normalized weighted entropy per column."""
    n, L = matrix.shape
    onehot = np.zeros((n, L, q))
    aa = matrix.astype(np.int64) - 1
    r, c = np.nonzero(aa >= 0)
    onehot[r, c, aa[r, c]] = 1.0
    counts = np.einsum("n,nlq->lq", weights, onehot) + 1e-3
    freq = counts / counts.sum(1, keepdims=True)
    ent = -(freq * np.log(freq)).sum(1)
    return 1.0 - ent / np.log(q)


def fit_gemme(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    focus_row: int = 0,
    q: int = 20,
) -> GemmeModel:
    """matrix: (N, L) int codes (0 gap, 1..20 AA), focus/query row first."""
    n, L = matrix.shape
    if weights is None:
        weights = np.ones(n)
    query = matrix[focus_row]

    # global identity of every homolog to the query (non-gap query cols)
    qmask = query > 0
    matches = ((matrix == query[None]) & qmask[None]).sum(1)
    identity = matches / max(int(qmask.sum()), 1)
    dist = 1.0 - identity  # (N,)

    # per (pos, aa): minimal distance among carriers
    dmin = np.full((L, q), np.inf)
    for a in range(1, q + 1):
        carrier = matrix == a  # (N, L)
        masked = np.where(carrier, dist[:, None], np.inf)
        dmin[:, a - 1] = masked.min(0)
    worst = dist.max() if n > 1 else 1.0
    dmin[~np.isfinite(dmin)] = worst * 1.5  # unseen AA: beyond max distance

    cons = _conservation(matrix, weights, q)
    # epistatic prediction: -conservation * distance (higher = fitter)
    pred_epi = -cons[:, None] * dmin
    # independent prediction: conservation-weighted log frequency
    onehot = np.zeros((n, L, q))
    aa = matrix.astype(np.int64) - 1
    r, c = np.nonzero(aa >= 0)
    onehot[r, c, aa[r, c]] = 1.0
    counts = np.einsum("n,nlq->lq", weights, onehot)
    freq = (counts + 0.05) / (counts.sum(1, keepdims=True) + 0.05 * q)
    pred_ind = cons[:, None] * np.log(freq)

    def normalize(x):
        lo, hi = x.min(), x.max()
        return (x - lo) / (hi - lo + 1e-12)

    return GemmeModel(
        pred_epi=normalize(pred_epi),
        pred_ind=normalize(pred_ind),
        conservation=cons,
        wt_codes=query,
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
