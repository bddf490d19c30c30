import numpy as np
import pytest

from proteingym_tpu.msa.parser import (
    encode_alignment,
    parse_a2m,
    parse_focus_header,
    preprocess_msa,
)
from proteingym_tpu.msa.weights import num_cluster_members, sequence_weights


def _oracle_num_cluster_members(matrix, identity_threshold, invalid_value=0):
    """Direct numpy transcription of the documented reference semantics
    (weights.py:114-161): asymmetric identity over non-gap length, strict >,
    self included (count starts at 1)."""
    n, length = matrix.shape
    counts = np.ones(n)
    l_non_gaps = length - np.sum(matrix == invalid_value, axis=1)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            matches = np.sum(
                (matrix[i] == matrix[j]) & (matrix[i] != invalid_value)
            )
            if matches / l_non_gaps[i] > identity_threshold:
                counts[i] += 1
    return counts


@pytest.mark.parametrize("theta", [0.2, 0.01])
def test_weights_match_oracle(rng, theta):
    n, length = 60, 40
    # clustered sequences: a few seeds + noisy copies + gaps
    seeds = rng.integers(1, 21, size=(5, length))
    matrix = seeds[rng.integers(0, 5, size=n)]
    noise = rng.random(size=(n, length)) < 0.15
    matrix = np.where(noise, rng.integers(1, 21, size=(n, length)), matrix)
    gaps = rng.random(size=(n, length)) < 0.1
    matrix = np.where(gaps, 0, matrix).astype(np.int8)

    thr = 1.0 - theta
    expected = _oracle_num_cluster_members(matrix, thr)
    got = np.asarray(num_cluster_members(matrix, thr, block=16))
    np.testing.assert_allclose(got, expected, atol=1e-6)

    w = sequence_weights(matrix, theta=theta, use_pallas=False, block=16)
    np.testing.assert_allclose(w, 1.0 / expected, atol=1e-9)


def test_weights_pallas_parity(rng):
    """Pallas kernel (interpret) == blocked-XLA path, exercising the
    K-tiled accumulation (tile_k < K forces multi-step grid dim 2) and
    zero-padded K columns. The untiled form OOMed scoped VMEM on v5e at
    real alignment lengths (L=300 -> K=6000 -> 29 MB working set)."""
    from proteingym_tpu.msa.weights import num_cluster_members_pallas

    n, length = 48, 13  # K = 260: pads to 2 x tile_k=128 + remainder
    seeds = rng.integers(1, 21, size=(4, length))
    matrix = seeds[rng.integers(0, 4, size=n)]
    noise = rng.random(size=(n, length)) < 0.2
    matrix = np.where(noise, rng.integers(1, 21, size=(n, length)), matrix)
    matrix[5] = 0  # all-gap row: weight 0, never a neighbor
    matrix = matrix.astype(np.int8)

    thr = 0.8
    expected = np.asarray(num_cluster_members(matrix, thr, block=16))
    got = np.asarray(
        num_cluster_members_pallas(
            matrix, thr, tile_i=16, tile_j=16, tile_k=128, interpret=True
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_weights_pallas_tile_k_model():
    """The VMEM model keeps the modeled working set under the 16 MB
    scoped limit at the bench shape that OOMed (N=16384, L=300)."""
    from proteingym_tpu.msa.weights import _weights_tile_k

    for k in (260, 6000, 20000, 40000):
        tk = _weights_tile_k(k, 256, 512)
        assert tk % 128 == 0 and tk >= 128
        working = (256 + 512) * tk * 2 * 2 + 2 * 256 * 512 * 4
        assert working <= 12 << 20, (k, tk, working)


def test_weights_empty_sequence_gets_zero(rng):
    matrix = rng.integers(1, 21, size=(10, 12)).astype(np.int8)
    matrix[3] = 0  # all gaps
    w = sequence_weights(matrix, theta=0.2, use_pallas=False, block=8)
    assert w[3] == 0.0
    assert (w[np.arange(10) != 3] > 0).all()


def test_weights_identical_sequences(rng):
    row = rng.integers(1, 21, size=20).astype(np.int8)
    matrix = np.tile(row, (7, 1))
    w = sequence_weights(matrix, theta=0.2, use_pallas=False, block=8)
    np.testing.assert_allclose(w, 1.0 / 7, atol=1e-9)


A2M_DOC = """>FOCUS/5-24
MKLV-AGDEF
>seq1
MKLVWAGDEF
>seq2
mklv.agdef
>seq3
MK--------
>seq4
MKXVWAGDEF
"""


def test_parse_a2m():
    names, seqs, focus = parse_a2m(A2M_DOC.splitlines())
    assert focus == ">FOCUS/5-24"
    assert len(names) == 5
    assert seqs[0] == "MKLV-AGDEF"
    assert parse_focus_header(focus) == (5, 24)


def test_encode_alignment():
    enc = encode_alignment(["-ACD", "acd."])
    assert enc.shape == (2, 4)
    assert enc[0, 0] == 0  # gap
    assert enc[0, 1] == 1  # A
    assert enc[1, 3] == 0  # '.' -> gap


def test_preprocess_msa():
    names, seqs, focus = parse_a2m(A2M_DOC.splitlines())
    msa = preprocess_msa(names, seqs, focus, threshold_focus_cols_frac_gaps=1.0)
    # focus has 9 non-gap columns (position 4 is '-')
    assert msa.seq_len == 9
    # seq3 is 80% gaps after column restriction -> dropped as fragment
    assert ">seq3" not in msa.names
    # seq4 has an X in focus cols -> dropped
    assert ">seq4" not in msa.names
    assert ">seq2" in msa.names  # lowercase normalizes fine
    assert msa.focus_seq_trimmed == "MKLVAGDEF"
    assert msa.focus_start == 5 and msa.focus_stop == 24
    # one-hot shape and row sums (gap positions contribute 0)
    oh = msa.one_hot()
    assert oh.shape == (msa.num_sequences, 9, 20)
    assert oh.sum() == sum((msa.matrix != 0).sum() for _ in [0])


def test_preprocess_column_filter():
    doc = """>F/1-4
ABCD
>s1
A-CD
>s2
A-CD
>s3
A-C-
""".replace("B", "W")  # avoid indeterminate B
    names, seqs, focus = parse_a2m(doc.splitlines())
    msa = preprocess_msa(names, seqs, focus, threshold_focus_cols_frac_gaps=0.5)
    # column 2 is gap in 3/4 sequences -> above 0.5 threshold -> dropped
    assert msa.seq_len == 3
    assert msa.focus_seq_trimmed == "ACD"
