"""Mutant-string parsing and application.

ProteinGym encodes substitutions as colon-joined triplets like ``A1P:D2N``
(1-indexed by default).  These helpers validate and apply them, and shift
coordinates between DMS and MSA frames.

Behavioral parity targets (semantics, not code):
  ref: proteingym/utils/scoring_utils.py:26-76
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from proteingym_tpu.constants import AA_TO_IDX, AA_VOCAB, IDX_TO_AA


def is_wt_row(mutant) -> bool:
    """True for assay rows that denote the wild type: empty/NaN cells and
    the literal ``WT`` label (the reference's label_row scores these 0).
    The single source of truth for WT-row semantics — scorers with manual
    token loops call this instead of re-implementing the check."""
    if mutant is None or (isinstance(mutant, float) and np.isnan(mutant)):
        return True
    s = str(mutant).strip()
    return not s or s.upper() == "WT"


def parse_mutant(mutant: str, delim: str = ":") -> List[Tuple[str, int, str]]:
    """Parse ``A1P:D2N`` into ``[("A", 1, "P"), ("D", 2, "N")]``.

    Positions are returned exactly as written (typically 1-indexed).
    Empty strings and the literal ``WT`` label parse to no mutations
    (the reference's label_row treats such assay rows as wild-type).
    """
    if is_wt_row(mutant):
        return []
    out = []
    for token in mutant.split(delim):
        if len(token) < 3:
            raise ValueError(f"Malformed mutation token: {token!r}")
        from_aa, pos_str, to_aa = token[0], token[1:-1], token[-1]
        try:
            pos = int(pos_str)
        except ValueError as e:
            raise ValueError(f"Malformed mutation position in {token!r}") from e
        out.append((from_aa, pos, to_aa))
    return out


def mutation_depth(mutant: str, delim: str = ":") -> int:
    """Number of individual substitutions in a mutant string.

    ref semantics: performance_DMS_benchmarks.py:198 (len of colon-split).
    """
    return len(mutant.split(delim))


def apply_mutant(
    focus_seq: str,
    mutant: str,
    start_idx: int = 1,
    aa_vocab: str = AA_VOCAB,
    delim: str = ":",
) -> str:
    """Apply a substitution triplet string to ``focus_seq``.

    Validates that the wild-type letter in each triplet matches the sequence
    (ref: utils/scoring_utils.py:38 assertion) and that the target amino acid
    is in the vocabulary.
    """
    seq = list(focus_seq)
    for from_aa, pos, to_aa in parse_mutant(mutant, delim=delim):
        rel = pos - start_idx
        if rel < 0 or rel >= len(seq):
            raise ValueError(
                f"Mutation {from_aa}{pos}{to_aa} out of bounds for sequence of "
                f"length {len(seq)} (start_idx={start_idx})"
            )
        if seq[rel] != from_aa:
            raise ValueError(
                f"Invalid from_AA for mutation {from_aa}{pos}{to_aa}: sequence "
                f"has {seq[rel]!r} at relative position {rel}"
            )
        if to_aa not in aa_vocab:
            raise ValueError(f"Mutant to_AA not in vocabulary: {to_aa!r}")
        seq[rel] = to_aa
    return "".join(seq)


def set_mutant_offset(mutant: str, msa_start: int, delim: str = ":") -> str:
    """Shift mutant positions from DMS coordinates into MSA coordinates.

    ref semantics: utils/scoring_utils.py:54-64 (pos - MSA_start + 1).
    """
    out = []
    for from_aa, pos, to_aa in parse_mutant(mutant, delim=delim):
        out.append(f"{from_aa}{pos - msa_start + 1}{to_aa}")
    return delim.join(out)


def undo_mutant_offset(mutant: str, msa_start: int, delim: str = ",") -> str:
    """Inverse of :func:`set_mutant_offset`.

    ref semantics: utils/scoring_utils.py:66-76 (note the reference's default
    delimiter for the inverse is a comma; we keep that quirk).
    """
    out = []
    for from_aa, pos, to_aa in parse_mutant(mutant, delim=delim):
        out.append(f"{from_aa}{pos + msa_start - 1}{to_aa}")
    return delim.join(out)


def encode_sequence(seq: str, aa_to_idx=None, unknown: int = -1) -> np.ndarray:
    """Encode an AA string into int32 indices over the 20-letter vocabulary.

    Characters outside the vocabulary map to ``unknown``.
    """
    table = AA_TO_IDX if aa_to_idx is None else aa_to_idx
    return np.asarray([table.get(c, unknown) for c in seq], dtype=np.int32)


def decode_sequence(ids: Sequence[int]) -> str:
    return "".join(IDX_TO_AA[int(i)] for i in ids)


def mutations_to_arrays(
    mutants: Sequence[str],
    max_depth: int | None = None,
    start_idx: int = 1,
    delim: str = ":",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorize a batch of mutant strings into fixed-shape arrays for jit.

    Returns ``(positions, from_idx, to_idx, valid_mask)`` each of shape
    ``(num_mutants, max_depth)``.  Positions are 0-indexed.  Padding slots
    have ``valid_mask == False`` and position 0.

    This is the TPU-friendly representation: scoring kernels gather
    log-probabilities at ``positions`` and sum over the depth axis under
    ``valid_mask``, replacing the reference's per-row Python loops
    (ref: esm/compute_fitness.py:240-250 label_row).
    """
    parsed = [parse_mutant(m, delim=delim) for m in mutants]
    depth = max((len(p) for p in parsed), default=1)
    depth = max(depth, 1)  # all-WT batches still need one (masked) slot
    if max_depth is not None:
        depth = max(depth, max_depth)
    n = len(parsed)
    positions = np.zeros((n, depth), dtype=np.int32)
    from_idx = np.zeros((n, depth), dtype=np.int32)
    to_idx = np.zeros((n, depth), dtype=np.int32)
    valid = np.zeros((n, depth), dtype=bool)
    for i, muts in enumerate(parsed):
        for j, (f, pos, t) in enumerate(muts):
            positions[i, j] = pos - start_idx
            from_idx[i, j] = AA_TO_IDX.get(f, 0)
            to_idx[i, j] = AA_TO_IDX.get(t, 0)
            valid[i, j] = True
    return positions, from_idx, to_idx, valid
