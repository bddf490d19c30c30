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


def sliding_windows(seq_len: int, window: int) -> List[Tuple[int, int]]:
    """Non-overlapping [start, end) windows covering the sequence (scheme (c)).

    Per-window AR log-likelihoods summed over these windows give the
    full-sequence score.  ref semantics: tranception/utils/scoring_utils.py:184-202.
    """
    return [(s, min(s + window, seq_len)) for s in range(0, seq_len, window)]
