"""Raw DMS assay cleanup into the canonical (mutant, mutated_sequence, DMS_score) form.

Behavioral parity target: ref proteingym/utils/data_utils.py:5-30 —
validity filters, directionality flip, silent-mutation aggregation
(groupby-mean on duplicate mutants), and mutated-sequence derivation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from proteingym_tpu.constants import AA_VOCAB
from proteingym_tpu.data.mutants import apply_mutant


def _valid_token(tok: str, target_seq: str, start_idx: int, end_idx: int) -> bool:
    if len(tok) < 3:
        return False
    wt, pos_str, mt = tok[0], tok[1:-1], tok[-1]
    if wt not in AA_VOCAB or mt not in AA_VOCAB or not pos_str.isnumeric():
        return False
    pos = int(pos_str)
    # ref quirk (data_utils.py:17): lower bound checks pos-start_idx >= 0 but
    # upper bound checks pos <= end_idx (not pos-start_idx < len).
    if pos - start_idx < 0 or pos > end_idx:
        return False
    return wt == target_seq[pos - start_idx]


def dms_file_cleanup(
    dms_file: str | Path | pd.DataFrame,
    target_seq: str,
    start_idx: int = 1,
    end_idx: Optional[int] = None,
    mutant_column: str = "mutant",
    phenotype_name: str = "score",
    directionality: int = 1,
) -> pd.DataFrame:
    """Clean a raw substitution assay into (mutant, mutated_sequence, DMS_score).

    Steps (matching ref data_utils.py:5-30):
      1. drop null mutants and malformed / out-of-range / WT-mismatched triplets
      2. coerce the phenotype to numeric, drop non-finite rows
      3. DMS_score = phenotype * directionality (so higher = fitter)
      4. aggregate duplicate mutants (silent-mutation variants) by mean
      5. derive mutated_sequence from the target sequence
    """
    if isinstance(dms_file, pd.DataFrame):
        data = dms_file.copy()
    else:
        data = pd.read_csv(dms_file, low_memory=False)
    end_idx = start_idx + len(target_seq) - 1 if end_idx is None else end_idx

    data["mutant"] = data[mutant_column]
    data = data[data["mutant"].notnull()].copy()
    data = data[
        data["mutant"].apply(
            lambda m: all(
                _valid_token(tok, target_seq, start_idx, end_idx)
                for tok in str(m).split(":")
            )
        )
    ].copy()

    data[phenotype_name] = pd.to_numeric(data[phenotype_name], errors="coerce")
    data = data[np.isfinite(data[phenotype_name])]
    data = data.dropna(subset=[phenotype_name])
    data["DMS_score"] = data[phenotype_name] * directionality
    data = data[["mutant", "DMS_score"]]
    data = data.groupby("mutant").mean().reset_index()

    data["mutated_sequence"] = data["mutant"].apply(
        lambda m: apply_mutant(target_seq, m, start_idx=start_idx)
    )
    return data[["mutant", "mutated_sequence", "DMS_score"]]
