"""Supervised score merging: long-format (DMS, model, CV-scheme) assembly.

Behavioral parity target: ref proteingym/merge_supervised.py:10-139 —
  - per CV scheme (fold_random_5 / fold_modulo_5 / fold_contiguous_5;
    indels: fold_random_5 only), left-join every model's predictions onto
    the assay frame by the model's merge key;
  - the first model's ``label_name`` column becomes ``normalized_targets``;
  - duplicate mutants groupby-mean'd before joining;
  - per (assay, model): Spearman of predictions vs normalized targets and
    MSE; output is a long frame
    (DMS_id, model_name, fold_variable_name, Spearman, MSE).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import numpy as np
import pandas as pd

from proteingym_tpu.data.reference import ReferenceSet
from proteingym_tpu.data.registry import ModelEntry, ModelRegistry

log = logging.getLogger(__name__)

CV_SCHEMES_SUBS = ["fold_random_5", "fold_modulo_5", "fold_contiguous_5"]
CV_SCHEMES_INDELS = ["fold_random_5"]


def merge_supervised(
    reference: ReferenceSet,
    registry: ModelRegistry,
    dms_loader: Callable[["AssayRecord"], Optional[pd.DataFrame]],
    score_loader: Callable[[str, str, ModelEntry], Optional[pd.DataFrame]],
    output_dir: Optional[str | Path] = None,
    mutation_type: str = "substitutions",
    cv_schemes: Optional[Sequence[str]] = None,
) -> pd.DataFrame:
    """Merge supervised predictions and compute per-assay Spearman/MSE.

    ``score_loader(cv_scheme, DMS_id, entry)`` returns a model's prediction
    frame for one assay and CV scheme, or None if missing.
    Returns the long frame; also writes per-scheme merged CSVs and the
    combined ``merged_scores_<mutation_type>_DMS.csv`` under output_dir
    when given (the reference's artifact contract).
    """
    if cv_schemes is None:
        cv_schemes = (
            CV_SCHEMES_INDELS if mutation_type == "indels" else CV_SCHEMES_SUBS
        )
    output_dir = Path(output_dir) if output_dir is not None else None

    rows: List[dict] = []
    for cv_scheme in cv_schemes:
        for rec in reference:
            dms_frame = dms_loader(rec)
            if dms_frame is None:
                log.warning("Could not find DMS file for %s; skipping", rec.DMS_id)
                continue
            merged = dms_frame.copy()
            if "mutated_sequence" not in merged:
                merged["mutated_sequence"] = merged["mutant"]

            for entry in registry:
                scores = score_loader(cv_scheme, rec.DMS_id, entry)
                if scores is None:
                    log.warning(
                        "Missing %s scores for %s (%s)",
                        entry.name, rec.DMS_id, cv_scheme,
                    )
                    rows.append(
                        {
                            "DMS_id": rec.DMS_id,
                            "model_name": entry.name,
                            "fold_variable_name": cv_scheme,
                            "Spearman": np.nan,
                            "MSE": np.nan,
                        }
                    )
                    continue
                key = entry.key
                pred_col = f"{entry.name}_predictions"
                keep = [key, entry.input_score_name]
                scores = scores.copy()
                if "normalized_targets" not in merged:
                    if not entry.label_name or entry.label_name not in scores:
                        raise KeyError(
                            f"model {entry.name!r}: label_name "
                            f"{entry.label_name!r} not found in its score "
                            f"file (columns: {list(scores.columns)}) — the "
                            "first merged model must carry the CV target "
                            "column"
                        )
                    scores = scores.rename(
                        columns={entry.label_name: "normalized_targets"}
                    )
                    keep.append("normalized_targets")
                scores = scores[keep].rename(
                    columns={entry.input_score_name: pred_col}
                )
                scores = scores.groupby(key, as_index=False).mean()

                before = set(merged[key])
                merged = pd.merge(merged, scores, on=key, how="left")
                after = set(merged[key])
                if len(after) != len(merged) or after != before:
                    raise ValueError(
                        f"Merge on {entry.name} for {rec.DMS_id} changed the "
                        f"mutant set (ref merge_supervised.py:108-111)"
                    )
                spearman = merged["normalized_targets"].corr(
                    merged[pred_col], method="spearman"
                )
                mse = float(
                    ((merged["normalized_targets"] - merged[pred_col]) ** 2).mean()
                )
                rows.append(
                    {
                        "DMS_id": rec.DMS_id,
                        "model_name": entry.name,
                        "fold_variable_name": cv_scheme,
                        "Spearman": spearman,
                        "MSE": mse,
                    }
                )
            if output_dir is not None:
                cv_dir = output_dir / cv_scheme
                cv_dir.mkdir(parents=True, exist_ok=True)
                merged.to_csv(cv_dir / f"{rec.DMS_id}.csv", index=False)

    long = (
        pd.DataFrame(rows)
        .sort_values(by=["DMS_id", "model_name", "fold_variable_name"])
        .reset_index(drop=True)
    )
    if output_dir is not None:
        output_dir.mkdir(parents=True, exist_ok=True)
        long.to_csv(
            output_dir / f"merged_scores_{mutation_type}_DMS.csv", index=False
        )
    return long


def supervised_filesystem_loaders(dms_dir: str | Path, scores_root: str | Path):
    """Reference layout: scores_root/<cv_scheme>/<location>/<DMS_id>.csv."""
    dms_dir = Path(dms_dir)
    scores_root = Path(scores_root)

    def dms_loader(rec):
        path = dms_dir / (rec.DMS_filename or f"{rec.DMS_id}.csv")
        return pd.read_csv(path) if path.exists() else None

    def score_loader(cv_scheme: str, dms_id: str, entry: ModelEntry):
        path = scores_root / cv_scheme / entry.location / f"{dms_id}.csv"
        return pd.read_csv(path) if path.exists() else None

    return dms_loader, score_loader
