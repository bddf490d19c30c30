"""Long-sequence windowing schemes.

These define benchmark semantics for proteins longer than a model's context
(SURVEY.md §5 "long-context handling"): scores are only comparable to the
published leaderboards if the window math matches exactly.

  (a) optimal window  — centered on the mutation barycenter, clamped
      (ref: proteingym/utils/scoring_utils.py:43-52)
  (b) overlapping sigmoid-weighted windows for wt-marginals
      (ref: esm/compute_fitness.py:435-473)
  (c) non-overlapping sliding windows whose scores sum
      (ref: tranception/utils/scoring_utils.py:184-202)
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def get_optimal_window(
    mutation_position_relative: int, seq_len_wo_special: int, model_window: int
) -> Tuple[int, int]:
    """Half-open [start, end) window of width <= model_window around a position.

    Exact semantics of ref utils/scoring_utils.py:43-52, including the quirk
    that the interior case returns a window of width ``2 * (model_window // 2)``
    (one short of ``model_window`` when it is odd).
    """
    half = model_window // 2
    if seq_len_wo_special <= model_window:
        return (0, seq_len_wo_special)
    if mutation_position_relative < half:
        return (0, model_window)
    if mutation_position_relative >= seq_len_wo_special - half:
        return (seq_len_wo_special - model_window, seq_len_wo_special)
    return (
        max(0, mutation_position_relative - half),
        min(seq_len_wo_special, mutation_position_relative + half),
    )


def mutation_barycenter(positions_0idx: np.ndarray) -> int:
    """Center of mass of mutated positions, rounded down.

    ref semantics: tranception/utils/scoring_utils.py:170-171 (mean of
    0-indexed mutated positions, int-cast).
    """
    return int(np.mean(np.asarray(positions_0idx, dtype=np.float64)))


def overlapping_windows(seq_len: int, window: int, overlap: int) -> List[Tuple[int, int]]:
    """Overlapping [start, end) windows stepping by ``window - overlap``.

    Used for wt-marginal scoring of long sequences where every position needs
    coverage (scheme (b)).  The final window is right-aligned to cover the
    tail.  ref semantics: esm/compute_fitness.py:435-447.
    """
    if seq_len <= window:
        return [(0, seq_len)]
    step = window - overlap
    starts = list(range(0, seq_len - window + 1, step))
    if starts[-1] + window < seq_len:
        starts.append(seq_len - window)
    return [(s, s + window) for s in starts]


def sigmoid_edge_weights(window_len: int, ramp: int = 50, slope: float = 0.2) -> np.ndarray:
    """Per-position confidence weights for stitching overlapping windows.

    Positions near window edges are down-weighted with a logistic ramp so that
    the weight-normalized sum over windows favors central (well-conditioned)
    predictions.  ref semantics: esm/compute_fitness.py:448-473 — weight at
    offset d from the nearer edge is sigmoid(slope * (d - ramp/2)) mirrored at
    both edges.
    """
    idx = np.arange(window_len, dtype=np.float64)
    dist_left = idx
    dist_right = window_len - 1 - idx

    def _sig(d):
        return 1.0 / (1.0 + np.exp(-slope * (d - ramp / 2.0)))

    return np.minimum(_sig(dist_left), _sig(dist_right))


def stitch_window_scores(
    seq_len: int,
    windows: List[Tuple[int, int]],
    window_tables: List[np.ndarray],
    ramp: int = 50,
    slope: float = 0.2,
) -> np.ndarray:
    """Stitch per-window (w_len, V) score tables into one (seq_len, V) table.

    Each window contributes its table weighted by :func:`sigmoid_edge_weights`;
    the result is the weight-normalized sum (scheme (b) wt-marginal stitching).
    """
    vocab = window_tables[0].shape[-1]
    acc = np.zeros((seq_len, vocab), dtype=np.float64)
    wsum = np.zeros((seq_len, 1), dtype=np.float64)
    for (start, end), table in zip(windows, window_tables):
        w = sigmoid_edge_weights(end - start, ramp=ramp, slope=slope)[:, None]
        acc[start:end] += w * np.asarray(table, dtype=np.float64)
        wsum[start:end] += w
    return acc / np.maximum(wsum, 1e-12)


def sliding_windows(seq_len: int, window: int) -> List[Tuple[int, int]]:
    """Non-overlapping [start, end) windows covering the sequence (scheme (c)).

    Per-window AR log-likelihoods summed over these windows give the
    full-sequence score.  ref semantics: tranception/utils/scoring_utils.py:184-202.
    """
    return [(s, min(s + window, seq_len)) for s in range(0, seq_len, window)]
