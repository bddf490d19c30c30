import numpy as np
import pytest

from proteingym_tpu.data.mutants import (
    apply_mutant,
    mutation_depth,
    mutations_to_arrays,
    parse_mutant,
    set_mutant_offset,
    undo_mutant_offset,
)
from proteingym_tpu.data.windows import (
    get_optimal_window,
    sliding_windows,
)


def test_parse_mutant():
    assert parse_mutant("A1P") == [("A", 1, "P")]
    assert parse_mutant("A1P:D2N") == [("A", 1, "P"), ("D", 2, "N")]
    assert parse_mutant("M123K") == [("M", 123, "K")]
    with pytest.raises(ValueError):
        parse_mutant("AB")
    with pytest.raises(ValueError):
        parse_mutant("AxP")


def test_apply_mutant():
    assert apply_mutant("ACDE", "A1P") == "PCDE"
    assert apply_mutant("ACDE", "A1P:E4W") == "PCDW"
    # custom start index
    assert apply_mutant("ACDE", "A5P", start_idx=5) == "PCDE"
    with pytest.raises(ValueError):
        apply_mutant("ACDE", "C1P")  # wrong wild-type letter
    with pytest.raises(ValueError):
        apply_mutant("ACDE", "A9P")  # out of range


def test_mutation_depth():
    assert mutation_depth("A1P") == 1
    assert mutation_depth("A1P:D2N:E3W") == 3


def test_offsets_roundtrip():
    m = "A25P:D30N"
    shifted = set_mutant_offset(m, msa_start=20)
    assert shifted == "A6P:D11N"
    back = undo_mutant_offset(shifted.replace(":", ","), msa_start=20)
    assert back == "A25P,D30N"


def test_mutations_to_arrays():
    pos, f, t, valid = mutations_to_arrays(["A1P", "A1P:D2N"])
    assert pos.shape == (2, 2)
    assert valid.tolist() == [[True, False], [True, True]]
    assert pos[1].tolist() == [0, 1]
    assert f[0, 0] == 0  # A
    assert t[0, 0] == 12  # P


def test_get_optimal_window():
    # short sequence: whole thing
    assert get_optimal_window(5, 10, 100) == (0, 10)
    # near left edge
    assert get_optimal_window(3, 1000, 100) == (0, 100)
    # near right edge
    assert get_optimal_window(990, 1000, 100) == (900, 1000)
    # interior (even window -> width == window)
    s, e = get_optimal_window(500, 1000, 100)
    assert (s, e) == (450, 550)


