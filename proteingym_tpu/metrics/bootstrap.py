"""Non-parametric bootstrap standard errors for leaderboard means.

Semantics match ref performance_DMS_benchmarks.py:84-111 but are fully
vectorized (one gather + mean per category instead of 10k pandas samples),
making the 10k-resample default ~100x faster on host and trivially
jit-able on device if needed.
"""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np
import pandas as pd


def bootstrap_standard_error(
    df: pd.DataFrame,
    number_assay_reshuffle: int = 10000,
    seed: Optional[int] = 0,
) -> pd.Series:
    """SE of the column means under row resampling with replacement.

    Equivalent to ref :84-93 (sample std with ddof=1 across resample means).
    """
    rng = np.random.default_rng(seed)
    values = df.to_numpy(dtype=np.float64)
    n = values.shape[0]
    idx = rng.integers(0, n, size=(number_assay_reshuffle, n))
    # NaN-aware mean to mirror pandas .mean() skipna behavior
    sample_means = np.nanmean(values[idx], axis=1)  # (B, n_models)
    return pd.Series(np.std(sample_means, axis=0, ddof=1), index=df.columns)


def bootstrap_standard_error_functional_categories(
    df: pd.DataFrame,
    number_assay_reshuffle: int = 10000,
    seed: Optional[int] = 0,
    category_level: str = "Selection Type",
) -> pd.Series:
    """SE of the across-category average of within-category resample means.

    Equivalent to ref :95-111: resample rows within each functional category,
    take the category mean, average the category means, and report the sample
    std (ddof=1) over bootstrap replicates.
    """
    rng = np.random.default_rng(seed)
    replicates = None
    n_categories = 0
    columns = None
    for _, group in df.groupby(category_level):
        values = group.select_dtypes(include=[np.number]).to_numpy(dtype=np.float64)
        if columns is None:
            columns = group.select_dtypes(include=[np.number]).columns
        n = values.shape[0]
        idx = rng.integers(0, n, size=(number_assay_reshuffle, n))
        with warnings.catch_warnings():
            # all-NaN model columns (absent scores) legitimately yield NaN
            warnings.simplefilter("ignore", category=RuntimeWarning)
            means = np.nanmean(values[idx], axis=1)
        replicates = means if replicates is None else replicates + means
        n_categories += 1
    combined = replicates / n_categories
    return pd.Series(np.std(combined, axis=0, ddof=1), index=columns)
