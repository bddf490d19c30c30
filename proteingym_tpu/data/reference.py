"""Typed loaders for the ProteinGym reference files.

The reference files are per-assay metadata CSVs keyed by ``DMS_id``
(ref: reference_files/reference_files_description.md:1-33, 46-column schema
for DMS_substitutions.csv).  They are the source of truth for target
sequences, MSA locations/hyperparameters, binarization cutoffs, and the
aggregation lookups (UniProt, taxon, function category, MSA depth).
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import pandas as pd


@dataclasses.dataclass(frozen=True)
class AssayRecord:
    """One row of a DMS reference file (the fields the pipeline consumes)."""

    DMS_id: str
    DMS_filename: str
    UniProt_ID: str
    target_seq: str
    seq_len: int
    taxon: Optional[str] = None
    source_organism: Optional[str] = None
    includes_multiple_mutants: Optional[bool] = None
    DMS_total_number_mutants: Optional[int] = None
    DMS_binarization_cutoff: Optional[float] = None
    DMS_binarization_method: Optional[str] = None
    coarse_selection_type: Optional[str] = None
    selection_type: Optional[str] = None
    MSA_filename: Optional[str] = None
    MSA_start: Optional[int] = None
    MSA_end: Optional[int] = None
    MSA_theta: Optional[float] = None
    MSA_Neff_L_category: Optional[str] = None
    weight_file_name: Optional[str] = None
    raw: Optional[dict] = dataclasses.field(default=None, repr=False, compare=False)

    @property
    def region(self) -> tuple:
        """MSA-covered [start, end] region in 1-indexed DMS coordinates."""
        return (self.MSA_start, self.MSA_end)


def _opt(row: dict, key: str, cast=None):
    if key not in row:
        return None
    v = row[key]
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return cast(v) if cast is not None else v


def _norm_depth_category(x):
    # ref quirk: first letter uppercased (performance_DMS_benchmarks.py:128)
    if isinstance(x, str) and x:
        return x[0].upper() + x[1:]
    return x


class ReferenceSet:
    """An ordered collection of assay records plus the aggregation lookups."""

    def __init__(self, records: List[AssayRecord], frame: pd.DataFrame):
        self.records = records
        self.frame = frame
        self._by_id: Dict[str, AssayRecord] = {r.DMS_id: r for r in records}

    def __len__(self) -> int:
        return len(self.records)

    def __iter__(self) -> Iterator[AssayRecord]:
        return iter(self.records)

    def __getitem__(self, key) -> AssayRecord:
        if isinstance(key, int):
            return self.records[key]
        return self._by_id[key]

    def __contains__(self, dms_id: str) -> bool:
        return dms_id in self._by_id

    @property
    def dms_ids(self) -> List[str]:
        return [r.DMS_id for r in self.records]

    def uniprot_lookup(self, column: str) -> pd.DataFrame:
        """Deduplicated (UniProt_ID, column) lookup used by the metric layer
        (ref: performance_DMS_benchmarks.py:136-141)."""
        out = self.frame[["UniProt_ID", column]].drop_duplicates()
        return out.reset_index(drop=True)


def load_reference(path: str | Path) -> ReferenceSet:
    """Load a DMS or clinical reference CSV into typed records.

    Handles both the 46-column DMS schema and the clinical schemas (which
    lack some columns); absent fields become None.
    """
    frame = pd.read_csv(path)
    if "MSA_Neff_L_category" in frame.columns:
        frame["MSA_Neff_L_category"] = frame["MSA_Neff_L_category"].apply(
            _norm_depth_category
        )
    records = []
    for row in frame.to_dict(orient="records"):
        records.append(
            AssayRecord(
                DMS_id=row.get("DMS_id") or row.get("protein_id") or "",
                DMS_filename=_opt(row, "DMS_filename") or "",
                UniProt_ID=_opt(row, "UniProt_ID") or "",
                target_seq=_opt(row, "target_seq") or "",
                seq_len=int(_opt(row, "seq_len") or len(_opt(row, "target_seq") or "")),
                taxon=_opt(row, "taxon"),
                source_organism=_opt(row, "source_organism"),
                includes_multiple_mutants=_opt(
                    row, "includes_multiple_mutants", bool
                ),
                DMS_total_number_mutants=_opt(row, "DMS_total_number_mutants", int),
                DMS_binarization_cutoff=_opt(row, "DMS_binarization_cutoff", float),
                DMS_binarization_method=_opt(row, "DMS_binarization_method"),
                coarse_selection_type=_opt(row, "coarse_selection_type"),
                selection_type=_opt(row, "selection_type"),
                MSA_filename=_opt(row, "MSA_filename"),
                MSA_start=_opt(row, "MSA_start", int),
                MSA_end=_opt(row, "MSA_end", int),
                MSA_theta=_opt(row, "MSA_theta", float),
                MSA_Neff_L_category=_opt(row, "MSA_Neff_L_category"),
                weight_file_name=_opt(row, "weight_file_name"),
                raw=row,
            )
        )
    return ReferenceSet(records, frame)
