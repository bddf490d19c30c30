"""Metric kernels vs scipy/sklearn and vs the reference's quirky NDCG/top-recall.

The reference implementations are re-derived here in pure numpy (from the
documented semantics) as the parity oracle.
"""

import numpy as np
import pytest
from scipy.stats import spearmanr
from sklearn.metrics import matthews_corrcoef, roc_auc_score

from proteingym_tpu.metrics import (
    assay_metrics,
    auc,
    mcc,
    ndcg,
    spearman,
    top_k_recall,
)
from proteingym_tpu.metrics.core import assay_metrics_host, average_rank


def _ref_ndcg(y_true, y_score, top=10):
    """Oracle for the reference calc_ndcg (performance_DMS_benchmarks.py:14-70)."""
    k = int(np.floor(y_true.shape[0] * (top / 100)))
    gains = (y_true - y_true.min()) / (y_true.max() - y_true.min())
    ranks = np.argsort(np.argsort(-y_score, kind="stable"), kind="stable") + 1
    ranks_k = ranks[ranks <= k]
    gains_k = gains[ranks <= k]
    ranks_fil = ranks_k[gains_k != 0]
    gains_fil = gains_k[gains_k != 0]
    if len(ranks_fil) == 0:
        return 0.0
    dcg = np.sum([g / np.log2(r + 1) for r, g in zip(ranks_fil, gains_fil)])
    ideal_ranks = np.argsort(np.argsort(-gains, kind="stable"), kind="stable") + 1
    ideal_ranks_k = ideal_ranks[ideal_ranks <= k]
    ideal_gains_k = gains[ideal_ranks <= k]
    sel = ideal_gains_k != 0
    idcg = np.sum(
        [g / np.log2(r + 1) for r, g in zip(ideal_ranks_k[sel], ideal_gains_k[sel])]
    )
    return dcg / idcg


def _ref_toprecall(true_scores, model_scores, top_true=10, top_model=10):
    """Oracle for calc_toprecall (ref :71-78)."""
    tt = true_scores >= np.percentile(true_scores, 100 - top_true)
    tm = model_scores >= np.percentile(model_scores, 100 - top_model)
    tp = tt & tm
    return tp.sum() / tt.sum() if tt.sum() > 0 else 0


@pytest.mark.parametrize("n", [10, 137, 2048])
def test_spearman_matches_scipy(rng, n):
    y = rng.normal(size=n)
    s = 0.5 * y + rng.normal(size=n)
    expected = spearmanr(y, s)[0]
    got = float(spearman(y, s))
    assert got == pytest.approx(expected, abs=1e-12)


def test_spearman_with_ties(rng):
    y = rng.integers(0, 5, size=300).astype(float)  # heavy ties
    s = rng.integers(0, 7, size=300).astype(float)
    expected = spearmanr(y, s)[0]
    got = float(spearman(y, s))
    assert got == pytest.approx(expected, abs=1e-12)


def test_spearman_masked(rng):
    y = rng.normal(size=100)
    s = rng.normal(size=100)
    valid = np.ones(128, dtype=bool)
    valid[100:] = False
    yp = np.concatenate([y, np.zeros(28)])
    sp = np.concatenate([s, np.zeros(28)])
    got = float(spearman(yp, sp, valid))
    assert got == pytest.approx(spearmanr(y, s)[0], abs=1e-12)


def test_average_rank_matches_scipy(rng):
    from scipy.stats import rankdata

    x = rng.integers(0, 10, size=200).astype(float)
    got = np.asarray(average_rank(x))
    np.testing.assert_allclose(got, rankdata(x), atol=1e-12)


@pytest.mark.parametrize("with_ties", [False, True])
def test_auc_matches_sklearn(rng, with_ties):
    n = 500
    y_bin = rng.integers(0, 2, size=n)
    if with_ties:
        s = rng.integers(0, 20, size=n).astype(float)
    else:
        s = rng.normal(size=n)
    expected = roc_auc_score(y_true=y_bin, y_score=s)
    got = float(auc(y_bin.astype(float), s))
    assert got == pytest.approx(expected, abs=1e-12)


def test_auc_single_class_is_nan(rng):
    s = rng.normal(size=50)
    assert np.isnan(float(auc(np.ones(50), s)))
    assert np.isnan(float(auc(np.zeros(50), s)))


def test_mcc_matches_sklearn(rng):
    n = 401  # odd + even both exercised below
    for size in (n, n + 1):
        y_bin = rng.integers(0, 2, size=size)
        s = rng.normal(size=size)
        med = np.median(s)
        pred = (s >= med).astype(int)
        expected = matthews_corrcoef(y_true=y_bin, y_pred=pred)
        got = float(mcc(y_bin.astype(float), s))
        assert got == pytest.approx(expected, abs=1e-12), f"size={size}"


def test_mcc_degenerate_returns_zero():
    # constant predictions -> 0 denominator -> 0.0 like sklearn
    y_bin = np.array([1.0, 1.0, 1.0, 1.0])
    s = np.array([1.0, 1.0, 1.0, 1.0])
    assert float(mcc(y_bin, s)) == 0.0


@pytest.mark.parametrize("n", [50, 333, 1000])
def test_ndcg_matches_reference(rng, n):
    y = rng.normal(size=n)
    s = 0.3 * y + rng.normal(size=n)
    expected = _ref_ndcg(y, s)
    got = float(ndcg(y, s))
    assert got == pytest.approx(expected, rel=1e-10)


def test_ndcg_no_top_hits_returns_zero():
    # model ranks all zero-gain items on top -> 0
    y = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0] * 2)
    s = -y  # inverts: zero-gain first
    got = float(ndcg(y, s))
    assert got == pytest.approx(_ref_ndcg(y, s), abs=1e-12)


@pytest.mark.parametrize("n", [40, 500])
def test_top_recall_matches_reference(rng, n):
    y = rng.normal(size=n)
    s = 0.3 * y + rng.normal(size=n)
    expected = _ref_toprecall(y, s)
    got = float(top_k_recall(y, s))
    assert got == pytest.approx(expected, abs=1e-12)


def test_assay_metrics_bundle(rng):
    n = 256
    y = rng.normal(size=n)
    s = 0.4 * y + rng.normal(size=n)
    y_bin = (y > np.median(y)).astype(float)
    out = assay_metrics_host(y, y_bin, s)
    assert out["Spearman"] == pytest.approx(spearmanr(y, s)[0], abs=1e-10)
    assert out["AUC"] == pytest.approx(roc_auc_score(y_bin, s), abs=1e-10)
    assert set(out) == {"Spearman", "AUC", "MCC", "NDCG", "Top_recall"}


def test_assay_metrics_padded_equals_unpadded(rng):
    n, pad = 100, 156
    y = rng.normal(size=n)
    s = rng.normal(size=n)
    y_bin = (y > 0).astype(float)
    base = assay_metrics_host(y, y_bin, s)
    valid = np.zeros(pad, dtype=bool)
    valid[:n] = True
    yp, bp, sp = (np.pad(a, (0, pad - n)) for a in (y, y_bin, s))
    padded = assay_metrics(yp, bp, sp, valid)
    for k in base:
        assert float(padded[k]) == pytest.approx(base[k], abs=1e-10), k


class TestLargeAssayOverflow:
    """int32 count products overflowed on 100k+-mutant assays when x64 is
    off (the production default; conftest enables x64, so these tests
    locally disable it)."""

    def test_auc_mcc_large_assay_x64_off(self):
        import jax
        from sklearn.metrics import matthews_corrcoef, roc_auc_score

        from proteingym_tpu.metrics.core import auc, mcc

        rs = np.random.RandomState(0)
        n = 500_000
        y = rs.randint(0, 2, n).astype(np.float64)
        s = y + rs.normal(0, 5, n)
        with jax.enable_x64(False):
            got_auc = float(auc(y, s))
            got_mcc = float(mcc(y, s))
        assert abs(got_auc - roc_auc_score(y, s)) < 1e-4
        pred = (s >= np.median(s)).astype(int)
        assert abs(got_mcc - matthews_corrcoef(y, pred)) < 1e-4

    def test_mcc_all_nan_labels_is_nan(self):
        from proteingym_tpu.metrics.core import mcc

        rs = np.random.RandomState(1)
        assert np.isnan(float(mcc(np.full(64, np.nan), rs.normal(size=64))))
