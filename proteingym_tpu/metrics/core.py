"""Per-assay metric kernels as jitted JAX array ops.

Five metrics, matching the reference's evaluation semantics exactly
(ref: proteingym/performance_DMS_benchmarks.py:11-78, 212-226):

  - Spearman  — scipy.stats.spearmanr (Pearson on average ranks)
  - AUC       — sklearn.roc_auc_score via the rank identity
  - MCC       — sklearn.matthews_corrcoef after median binarization of
                model scores (x >= median -> 1)
  - NDCG      — the reference's custom top-10%-quantile NDCG with min-max
                gains and argsort-derived ranks (calc_ndcg, :14-70)
  - Top-recall— overlap of top-10 percentile sets (calc_toprecall, :71-78)

Everything here is mask-aware so assays of different lengths can be padded
to a common shape and batched with vmap — the TPU-native replacement for
the reference's per-assay Python loop.  All kernels support a boolean
``valid`` mask; padded slots must have valid=False.

Design notes (TPU):
  - ranks are computed with two sorts (O(n log n), XLA-friendly) via the
    searchsorted identity: avg_rank(x) = (left(x) + right(x) + 1) / 2
  - no data-dependent shapes: filters are expressed as masked sums
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e30  # sentinel pushing invalid slots to the end of sorts


def _ftype():
    """f64 when x64 is enabled (bit-parity with scipy), else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _masked(x, valid, fill):
    return jnp.where(valid, x, fill)


def average_rank(x: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """1-based average (midrank) ranks, matching scipy.stats.rankdata.

    Invalid slots receive arbitrary large ranks; callers must mask them out.
    """
    x = jnp.asarray(x, dtype=_ftype())
    if valid is None:
        valid = jnp.ones(x.shape, dtype=bool)
    xm = _masked(x, valid, _BIG)
    sx = jnp.sort(xm)
    left = jnp.searchsorted(sx, xm, side="left")
    right = jnp.searchsorted(sx, xm, side="right")
    return (left + right + 1) / 2.0


def _masked_mean(x, valid):
    n = jnp.sum(valid)
    return jnp.sum(jnp.where(valid, x, 0.0)) / jnp.maximum(n, 1)


def _pearson(x, y, valid):
    mx = _masked_mean(x, valid)
    my = _masked_mean(y, valid)
    dx = jnp.where(valid, x - mx, 0.0)
    dy = jnp.where(valid, y - my, 0.0)
    num = jnp.sum(dx * dy)
    den = jnp.sqrt(jnp.sum(dx * dx) * jnp.sum(dy * dy))
    return jnp.where(den > 0, num / den, jnp.nan)


def spearman(
    y_true: jnp.ndarray, y_score: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Spearman rho with average-rank tie handling (== scipy.stats.spearmanr)."""
    y_true = jnp.asarray(y_true, dtype=_ftype())
    y_score = jnp.asarray(y_score, dtype=_ftype())
    if valid is None:
        valid = jnp.ones(y_true.shape, dtype=bool)
    rt = average_rank(y_true, valid)
    rs = average_rank(y_score, valid)
    return _pearson(rt, rs, valid)


def auc(
    y_bin: jnp.ndarray, y_score: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """ROC AUC via the Mann-Whitney rank identity (== sklearn.roc_auc_score).

    AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos * n_neg),
    with average ranks for tied scores.  Returns NaN when only one class is
    present (the reference catches sklearn's ValueError and records NaN,
    ref :215-219).
    """
    y_bin = jnp.asarray(y_bin, dtype=_ftype())
    y_score = jnp.asarray(y_score, dtype=_ftype())
    if valid is None:
        valid = jnp.ones(y_bin.shape, dtype=bool)
    pos = valid & (y_bin > 0.5)
    neg = valid & (y_bin <= 0.5)
    # counts in float: int32 products n_pos*(n_pos+1) overflow past ~46k
    # positives (x64 is off in production; only tests enable it)
    n_pos = jnp.sum(pos).astype(_ftype())
    n_neg = jnp.sum(neg).astype(_ftype())
    r = average_rank(y_score, valid)
    rank_sum_pos = jnp.sum(jnp.where(pos, r, 0.0))
    val = (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1)
    return jnp.where((n_pos > 0) & (n_neg > 0), val, jnp.nan)


def _masked_median(x, valid):
    """Median over valid slots (== pandas .median, linear midpoint)."""
    n = jnp.sum(valid)
    sx = jnp.sort(_masked(x, valid, _BIG))
    hi = sx[jnp.maximum(n - 1, 0) // 2 + jnp.where(n % 2 == 0, 1, 0)]
    lo = sx[jnp.maximum(n - 1, 0) // 2]
    return (lo + hi) / 2.0


def mcc(
    y_bin: jnp.ndarray, y_score: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Matthews correlation after binarizing scores at their median.

    ref semantics (:221-223): pred = 1 if score >= median(score) else 0, then
    sklearn.matthews_corrcoef(y_true=DMS_score_bin, y_pred=pred); a zero
    denominator yields 0.0 (sklearn convention).
    """
    y_bin = jnp.asarray(y_bin, dtype=_ftype())
    y_score = jnp.asarray(y_score, dtype=_ftype())
    if valid is None:
        valid = jnp.ones(y_bin.shape, dtype=bool)
    med = _masked_median(y_score, valid)
    pred = (y_score >= med) & valid
    t = (y_bin > 0.5) & valid
    # counts in float: int32 tp*tn overflows (sign-flips) past ~185k rows
    tp = jnp.sum(pred & t).astype(_ftype())
    fp = jnp.sum(pred & ~t & valid).astype(_ftype())
    fn = jnp.sum(~pred & t).astype(_ftype())
    tn = jnp.sum(~pred & ~t & valid).astype(_ftype())
    num = tp * tn - fp * fn
    den = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    # degenerate confusion matrix -> 0.0 (sklearn convention), but a label
    # column that is entirely NaN/absent must yield NaN, not a fake 0.0
    val = jnp.where(den > 0, num / den, 0.0)
    return jnp.where(jnp.sum(valid & ~jnp.isnan(y_bin)) > 0, val, jnp.nan)


def _ordinal_ranks_desc(x, valid):
    """1-based ranks of -x with argsort(argsort(.)) tie-order (stable)."""
    n = x.shape[0]
    xm = _masked(-jnp.asarray(x, dtype=_ftype()), valid, _BIG)
    order = jnp.argsort(xm, stable=True)
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(1, n + 1, dtype=jnp.int32)
    )
    return ranks


def ndcg(
    y_true: jnp.ndarray,
    y_score: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    top_percent: float = 10.0,
) -> jnp.ndarray:
    """The reference's quantile NDCG (calc_ndcg, ref :14-70).

    Quirks preserved:
      - gains are min-max normalized true scores over the assay
      - k = floor(n * top/100)
      - ranks come from argsort-of-argsort on -score (ordinal, first-come
        tie order); we use a stable sort (ties in continuous scores are rare)
      - zero-gain items are excluded from both DCG and IDCG
      - if no positive-gain item ranks in the top k, returns 0
    """
    y_true = jnp.asarray(y_true, dtype=_ftype())
    y_score = jnp.asarray(y_score, dtype=_ftype())
    if valid is None:
        valid = jnp.ones(y_true.shape, dtype=bool)
    n = jnp.sum(valid)
    k = jnp.floor(n * (top_percent / 100.0)).astype(jnp.int32)

    tmin = jnp.min(_masked(y_true, valid, _BIG))
    tmax = jnp.max(_masked(y_true, valid, -_BIG))
    gains = jnp.where(valid, (y_true - tmin) / jnp.maximum(tmax - tmin, 1e-30), 0.0)

    ranks = _ordinal_ranks_desc(y_score, valid)
    in_top = valid & (ranks <= k) & (gains != 0)
    dcg = jnp.sum(jnp.where(in_top, gains / jnp.log2(ranks + 1.0), 0.0))

    ideal_ranks = _ordinal_ranks_desc(gains, valid)
    ideal_top = valid & (ideal_ranks <= k) & (gains != 0)
    idcg = jnp.sum(jnp.where(ideal_top, gains / jnp.log2(ideal_ranks + 1.0), 0.0))

    return jnp.where(jnp.sum(in_top) > 0, dcg / jnp.maximum(idcg, 1e-30), 0.0)


def _percentile_linear(x, valid, q):
    """np.percentile(x, q) with linear interpolation over valid slots."""
    n = jnp.sum(valid)
    sx = jnp.sort(_masked(x, valid, _BIG))
    pos = (q / 100.0) * (n - 1).astype(_ftype())
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    return sx[lo] * (1 - frac) + sx[hi] * frac


def top_k_recall(
    y_true: jnp.ndarray,
    y_score: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    top_true: float = 10.0,
    top_model: float = 10.0,
) -> jnp.ndarray:
    """Recall of the true top-10% set by the model top-10% set (ref :71-78)."""
    y_true = jnp.asarray(y_true, dtype=_ftype())
    y_score = jnp.asarray(y_score, dtype=_ftype())
    if valid is None:
        valid = jnp.ones(y_true.shape, dtype=bool)
    thr_t = _percentile_linear(y_true, valid, 100.0 - top_true)
    thr_m = _percentile_linear(y_score, valid, 100.0 - top_model)
    top_t = valid & (y_true >= thr_t)
    top_m = valid & (y_score >= thr_m)
    tp = jnp.sum(top_t & top_m)
    denom = jnp.sum(top_t)
    return jnp.where(denom > 0, tp / denom, 0.0)


@functools.partial(jax.jit, static_argnames=())
def assay_metrics(
    y_true: jnp.ndarray,
    y_bin: jnp.ndarray,
    y_score: jnp.ndarray,
    valid: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """All five benchmark metrics for one (padded) assay in a single jit."""
    return {
        "Spearman": spearman(y_true, y_score, valid),
        "AUC": auc(y_bin, y_score, valid),
        "MCC": mcc(y_bin, y_score, valid),
        "NDCG": ndcg(y_true, y_score, valid),
        "Top_recall": top_k_recall(y_true, y_score, valid),
    }


# Batched across (models or assays) on the leading axis — the per-mutant
# heavy path; one jit evaluates a whole padded block on the TPU.
batched_assay_metrics = jax.jit(
    jax.vmap(
        lambda t, b, s, v: assay_metrics(t, b, s, v),
        in_axes=(0, 0, 0, 0),
    )
)


def assay_metrics_host(y_true, y_bin, y_score) -> Dict[str, float]:
    """Convenience host wrapper for variable-length numpy inputs."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_bin = np.asarray(y_bin, dtype=np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    valid = np.ones(y_true.shape, dtype=bool)
    out = assay_metrics(y_true, y_bin, y_score, valid)
    return {k: float(v) for k, v in out.items()}
