"""Clinical benchmark evaluation: per-protein AUC + summary leaderboard.

The reference ships clinical leaderboards as artifacts
(benchmarks/clinical_zero_shot/{substitutions,indels}/AUC/ — a per-protein
``clinical_<type>_AUC_DMS_level.csv`` and a ranked
``Summary_performance_clinical_<type>_AUC.csv`` with Average_AUC and a
bootstrap SE centered on the top model); the producing script lives
outside the repo. This module reproduces that artifact contract:

  per protein: ROC-AUC of each model column against the binary clinical
  label -> protein x model table -> mean across proteins -> bootstrap SE
  (protein resampling, centered on the top model, matching the DMS
  bootstrap at performance_DMS_benchmarks.py:84-93).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd

from proteingym_tpu.data.reference import ReferenceSet
from proteingym_tpu.data.registry import ModelRegistry
from proteingym_tpu.metrics.bootstrap import bootstrap_standard_error
from proteingym_tpu.metrics.core import auc

LABEL_CANDIDATES = ["DMS_bin_score", "DMS_score_bin", "label", "ClinVar_label"]


def _find_label_column(frame: pd.DataFrame, label_column: Optional[str]) -> str:
    if label_column is not None:
        return label_column
    for cand in LABEL_CANDIDATES:
        if cand in frame.columns:
            return cand
    raise KeyError(
        f"No clinical label column found (looked for {LABEL_CANDIDATES})"
    )


def evaluate_clinical(
    reference: ReferenceSet,
    registry: ModelRegistry,
    merged_scores_loader: Callable[[str], Optional[pd.DataFrame]],
    output_dir: str | Path,
    mutation_type: str = "substitutions",
    label_column: Optional[str] = None,
    bootstrap_samples: int = 10000,
    model_types: Optional[Dict[str, str]] = None,
    write_html: bool = False,
) -> pd.DataFrame:
    """AUC-only clinical evaluation. Returns the ranked summary frame."""
    output_dir = Path(output_dir) / "AUC"
    output_dir.mkdir(parents=True, exist_ok=True)
    model_names = registry.names

    rows = {}
    for rec in reference:
        merged = merged_scores_loader(rec.DMS_id)
        if merged is None:
            print(f"Scoring file for {rec.DMS_id} missing")
            continue
        label_col = _find_label_column(merged, label_column)
        labels = merged[label_col].to_numpy()
        row = {}
        for model in model_names:
            if model not in merged.columns:
                row[model] = np.nan
                continue
            scores = merged[model].to_numpy(dtype=np.float64)
            valid = np.isfinite(scores) & np.isfinite(
                labels.astype(np.float64)
            )
            y = labels[valid].astype(int)
            if valid.sum() == 0 or len(np.unique(y)) < 2:
                row[model] = np.nan
                continue
            row[model] = float(auc(y, scores[valid]))
        rows[rec.DMS_id] = row

    dms_level = pd.DataFrame.from_dict(rows, orient="index")
    dms_level.index.name = "RefSeq ID"
    dms_level = dms_level.rename(columns=registry.clean_names)
    dms_level.round(3).to_csv(
        output_dir / f"clinical_{mutation_type}_AUC_DMS_level.csv"
    )
    return summarize_clinical(
        dms_level,
        output_dir=output_dir,
        mutation_type=mutation_type,
        bootstrap_samples=bootstrap_samples,
        model_types=model_types,
        write_html=write_html,
    )


def summarize_clinical(
    dms_level: pd.DataFrame,
    output_dir: Optional[Path] = None,
    mutation_type: str = "substitutions",
    bootstrap_samples: int = 10000,
    model_types: Optional[Dict[str, str]] = None,
    write_html: bool = False,
) -> pd.DataFrame:
    """Protein-level AUC table -> ranked leaderboard (mean over proteins,
    bootstrap SE centered on the top model, 3-decimal rounding). The input
    schema matches the published clinical_*_AUC_DMS_level.csv files, which
    are golden fixtures for this function."""
    averages = dms_level.mean(axis=0)
    top_model = averages.idxmax()
    centered = dms_level.subtract(dms_level[top_model], axis=0)
    se = bootstrap_standard_error(
        centered, number_assay_reshuffle=bootstrap_samples
    )

    summary = pd.DataFrame(
        {
            "Model_name": averages.index,
            "Model type": [
                (model_types or {}).get(m, "") for m in averages.index
            ],
            "Average_AUC": averages.to_numpy(),
            "Bootstrap_standard_error_AUC": se.reindex(averages.index).to_numpy(),
        }
    ).sort_values("Average_AUC", ascending=False)
    summary.index = range(1, len(summary) + 1)
    summary.index.name = "Model_rank"
    summary = summary.round(3)
    if output_dir is not None:
        out = (Path(output_dir)
               / f"Summary_performance_clinical_{mutation_type}_AUC.csv")
        summary.to_csv(out)
        if write_html:
            summary.to_html(out.with_suffix(".html"))
    return summary
