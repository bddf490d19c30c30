"""Native C++ kernels: parity with the JAX/numba-equivalent paths."""

import numpy as np
import pytest

from proteingym_tpu import native

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def _random_msa(rs, n=40, L=30, q=21):
    mat = rs.randint(1, q, size=(n, L)).astype(np.int8)
    mat[rs.rand(n, L) < 0.1] = 0  # gaps
    return mat


class TestClusterCounts:
    def test_matches_jax_weights_kernel(self):
        from proteingym_tpu.msa.weights import num_cluster_members

        rs = np.random.RandomState(0)
        mat = _random_msa(rs)
        native_counts = native.cluster_counts(mat, 0.8)
        jax_counts = np.asarray(num_cluster_members(mat, 0.8))
        np.testing.assert_array_equal(native_counts, jax_counts)

    def test_identical_rows_cluster(self):
        mat = np.ones((5, 10), dtype=np.int8) * 3
        counts = native.cluster_counts(mat, 0.8)
        np.testing.assert_array_equal(counts, [5] * 5)

    def test_all_gap_row_zero(self):
        mat = np.ones((3, 8), dtype=np.int8)
        mat[1] = 0
        counts = native.cluster_counts(mat, 0.8)
        assert counts[1] == 0


class TestHhfilter:
    def test_first_sequence_always_kept(self):
        rs = np.random.RandomState(1)
        mat = _random_msa(rs, n=20)
        keep = native.hhfilter_mask(mat, min_coverage=0.99)
        assert keep[0]

    def test_coverage_filter(self):
        rs = np.random.RandomState(2)
        mat = _random_msa(rs, n=10, L=20)
        mat[3, :15] = 0  # 75% gaps
        keep = native.hhfilter_mask(mat, min_coverage=0.5, max_identity=1.0)
        assert not keep[3]

    def test_identity_filter_drops_duplicates(self):
        rs = np.random.RandomState(3)
        row = rs.randint(1, 21, 30).astype(np.int8)
        mat = np.stack([row, row, row])
        keep = native.hhfilter_mask(mat, min_coverage=0.0, max_identity=0.9)
        assert keep[0] and not keep[1] and not keep[2]

    def test_matches_python_fallback(self):
        rs = np.random.RandomState(4)
        mat = _random_msa(rs, n=25, L=18)
        fast = native.hhfilter_mask(mat, 0.5, 0.85, 0.1)
        lib, native._lib = native._lib, None
        failed = native._build_failed
        native._build_failed = True
        try:
            slow = native.hhfilter_mask(mat, 0.5, 0.85, 0.1)
        finally:
            native._lib, native._build_failed = lib, failed
        np.testing.assert_array_equal(fast, slow)


class TestAffineAlign:
    def test_identical_sequences(self):
        a = np.arange(1, 11, dtype=np.int8)
        alen, ca, cb = native.affine_align(a, a)
        assert alen == 10
        np.testing.assert_array_equal(ca, np.arange(10))
        np.testing.assert_array_equal(cb, np.arange(10))

    def test_single_deletion(self):
        a = np.array([1, 2, 3, 4, 5, 6], dtype=np.int8)
        b = np.array([1, 2, 4, 5, 6], dtype=np.int8)  # 3 deleted
        alen, ca, cb = native.affine_align(a, b)
        assert alen == 6
        # b's residues align to a's columns skipping the deletion column
        np.testing.assert_array_equal(ca, np.arange(6))
        assert list(cb) == [0, 1, 3, 4, 5]

    def test_single_insertion(self):
        a = np.array([1, 2, 4, 5], dtype=np.int8)
        b = np.array([1, 2, 3, 4, 5], dtype=np.int8)
        alen, ca, cb = native.affine_align(a, b)
        assert alen == 5
        np.testing.assert_array_equal(cb, np.arange(5))
        assert list(ca) == [0, 1, 3, 4]

    def test_affine_prefers_one_long_gap(self):
        # with affine gaps, a 2-residue gap should be contiguous
        a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.int8)
        b = np.array([1, 2, 5, 6, 7, 8], dtype=np.int8)
        alen, ca, cb = native.affine_align(a, b)
        assert alen == 8
        gap_cols = sorted(set(range(8)) - set(cb.tolist()))
        assert gap_cols == [2, 3]  # contiguous


class TestHmmForward:
    def test_matches_jax_path(self):
        from proteingym_tpu.models.hmm import (
            AA_ORDER, build_profile_hmm, score_sequences,
        )

        rs = np.random.RandomState(7)
        mat = rs.randint(1, 21, (40, 14)).astype(np.int8)
        mat[rs.rand(40, 14) < 0.05] = 0
        hmm = build_profile_hmm(mat)
        idx = {a: i for i, a in enumerate(AA_ORDER)}
        seqs = ["ACDEFGHIKLMNPQ", "ACDEFGHIKL", "WYWYWYWYWYWYWY"]
        jax_scores = score_sequences(hmm, seqs)
        T = max(len(s) for s in seqs)
        toks = np.full((3, T), -1, np.int32)
        for i, s in enumerate(seqs):
            toks[i, : len(s)] = [idx[c] for c in s]
        cpp = native.hmm_forward(toks, hmm.log_e_match, hmm.log_bg, hmm.log_a)
        np.testing.assert_allclose(cpp, jax_scores, rtol=1e-5)


class TestNjTree:
    def test_two_families_pair_within(self):
        """NJ cherries join sequences from the same family, never across."""
        rs = np.random.RandomState(0)
        L = 40
        fam_a = rs.randint(1, 21, L).astype(np.int8)
        fam_b = rs.randint(1, 21, L).astype(np.int8)
        rows = []
        for base in (fam_a, fam_b):
            for _ in range(6):
                r = base.copy()
                idx = rs.choice(L, 4, replace=False)
                r[idx] = rs.randint(1, 21, 4)
                rows.append(r)
        mat = np.stack(rows)  # rows 0-5 family A, 6-11 family B
        tree = native.nj_tree(mat)
        assert tree is not None
        left, right, ll, rl = tree
        assert len(left) == mat.shape[0] - 1
        assert (ll >= 0).all() and (rl >= 0).all()

        from proteingym_tpu.models import siterm

        pairs = siterm.cherry_pairs_nj(mat)
        assert pairs
        seen = set()
        for i, j in pairs:
            assert i not in seen and j not in seen  # disjoint pairing
            seen.update((i, j))
            assert (i < 6) == (j < 6), (i, j)  # same family

    def test_merge_tree_is_well_formed(self):
        rs = np.random.RandomState(1)
        mat = _random_msa(rs, n=15, L=25)
        left, right, _, _ = native.nj_tree(mat)
        n = mat.shape[0]
        used = np.zeros(2 * n - 1, bool)
        for k in range(n - 1):
            a, b = int(left[k]), int(right[k])
            # children exist before this merge and are consumed exactly once
            assert a < n + k and b < n + k and a != b
            assert not used[a] and not used[b]
            used[a] = used[b] = True
        # every node except the root is consumed
        assert used[: 2 * n - 2].all() and not used[2 * n - 2]

    def test_recovers_additive_quartet(self):
        """Classic quartet: ((A,B),(C,D)) — NJ must join the two close
        pairs as cherries before the root."""
        # sequences: A,B differ in 2 positions; C,D differ in 2; the
        # groups differ everywhere else
        L = 30
        base = np.ones(L, np.int8)
        A = base.copy()
        B = base.copy(); B[:2] = 2
        other = np.full(L, 3, np.int8)
        C = other.copy()
        D = other.copy(); D[:2] = 4
        mat = np.stack([A, C, B, D])  # interleave to avoid order luck
        from proteingym_tpu.models import siterm

        pairs = {frozenset(p) for p in siterm.cherry_pairs_nj(mat)}
        assert frozenset((0, 2)) in pairs  # A with B
        assert frozenset((1, 3)) in pairs  # C with D

    def test_tiny_inputs(self):
        assert native.nj_tree(np.ones((1, 5), np.int8)) is None
        two = np.asarray([[1, 2, 3], [1, 2, 4]], np.int8)
        left, right, ll, rl = native.nj_tree(two)
        assert len(left) == 1 and {int(left[0]), int(right[0])} == {0, 1}
