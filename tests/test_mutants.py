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
    overlapping_windows,
    sliding_windows,
    stitch_window_scores,
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


def test_overlapping_windows_cover_sequence():
    wins = overlapping_windows(2500, 1022, 511)
    covered = np.zeros(2500, dtype=bool)
    for s, e in wins:
        assert e - s == 1022
        covered[s:e] = True
    assert covered.all()


def test_sliding_windows():
    wins = sliding_windows(250, 100)
    assert wins == [(0, 100), (100, 200), (200, 250)]


def test_stitch_window_scores_constant():
    # stitching constant tables must return the constant
    wins = overlapping_windows(300, 128, 64)
    tables = [np.full((e - s, 4), 3.0) for s, e in wins]
    out = stitch_window_scores(300, wins, tables)
    np.testing.assert_allclose(out, 3.0, rtol=1e-9)
