from proteingym_tpu.data.mutants import (
    apply_mutant,
    encode_sequence,
    decode_sequence,
    mutation_depth,
    parse_mutant,
    set_mutant_offset,
    undo_mutant_offset,
)
from proteingym_tpu.data.reference import AssayRecord, ReferenceSet, load_reference
from proteingym_tpu.data.cleanup import dms_file_cleanup
from proteingym_tpu.data.windows import get_optimal_window

__all__ = [
    "AssayRecord",
    "ReferenceSet",
    "apply_mutant",
    "decode_sequence",
    "dms_file_cleanup",
    "encode_sequence",
    "get_optimal_window",
    "load_reference",
    "mutation_depth",
    "parse_mutant",
    "set_mutant_offset",
    "undo_mutant_offset",
]
