"""Native PROVEAN (and friends): batched Gotoh kernel correctness vs a
reference numpy DP, clustering behavior, and the delta-scoring contract."""

import numpy as np
import pytest

pytest.importorskip("jax")

from proteingym_tpu.models import provean


def numpy_gotoh(a, b, sub, gap_open, gap_extend):
    """Textbook O(L1*L2) affine-gap global alignment score."""
    NEG = -1e9
    l1, l2 = len(a), len(b)
    M = np.full((l1 + 1, l2 + 1), NEG)
    Ix = np.full((l1 + 1, l2 + 1), NEG)
    Iy = np.full((l1 + 1, l2 + 1), NEG)
    M[0, 0] = 0.0
    for j in range(1, l2 + 1):
        Iy[0, j] = -gap_open - (j - 1) * gap_extend
    for i in range(1, l1 + 1):
        Ix[i, 0] = max(M[i - 1, 0] - gap_open, Ix[i - 1, 0] - gap_extend)
        for j in range(1, l2 + 1):
            s = sub[a[i - 1], b[j - 1]]
            M[i, j] = max(M[i - 1, j - 1], Ix[i - 1, j - 1],
                          Iy[i - 1, j - 1]) + s
            Ix[i, j] = max(M[i - 1, j] - gap_open, Ix[i - 1, j] - gap_extend)
            Iy[i, j] = max(M[i, j - 1] - gap_open, Iy[i, j - 1] - gap_extend)
    return max(M[l1, l2], Ix[l1, l2], Iy[l1, l2])


class TestGotohKernel:
    def test_matches_numpy_dp(self):
        rng = np.random.RandomState(0)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        for trial in range(5):
            a = "".join(AA[i] for i in rng.randint(0, 20, 12))
            b = "".join(AA[i] for i in rng.randint(0, 20,
                                                   rng.randint(6, 18)))
            got = provean.align_scores([a], [b])[0]
            want = numpy_gotoh(
                provean.encode(a), provean.encode(b), provean.BLOSUM62,
                10.0, 1.0,
            )
            assert got == pytest.approx(want), (trial, a, b)

    def test_identity_alignment_score(self):
        seq = "MKTAYIAKQR"
        got = provean.align_scores([seq], [seq])[0]
        want = sum(
            provean.BLOSUM62[provean.encode(seq)[i], provean.encode(seq)[i]]
            for i in range(len(seq))
        )
        assert got == pytest.approx(want)

    def test_blosum62_is_symmetric_and_canonical(self):
        B = provean.BLOSUM62
        np.testing.assert_array_equal(B, B.T)
        idx = provean._IDX
        assert B[idx["W"], idx["W"]] == 11
        assert B[idx["A"], idx["A"]] == 4
        assert B[idx["E"], idx["Q"]] == 2
        assert B[idx["G"], idx["I"]] == -4


class TestProvean:
    def test_deleterious_substitution_scores_negative(self):
        rng = np.random.RandomState(1)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        wt = "".join(AA[i] for i in rng.randint(0, 20, 30))
        homs = []
        for _ in range(12):
            s = list(wt)
            for p in rng.choice(30, 4, replace=False):
                s[p] = AA[rng.randint(0, 20)]
            homs.append("".join(s))
        clusters = provean.cluster_supporting_set(wt, homs, identity=0.5)
        assert clusters
        # conserved position 0 (never mutated in homologs): W substitution
        mut_sub = "W" + wt[1:] if wt[0] != "W" else "A" + wt[1:]
        mut_del = wt[:5] + wt[8:]     # 3-residue deletion
        scores = provean.provean_scores(wt, [wt, mut_sub, mut_del], clusters)
        assert scores[0] == pytest.approx(0.0)
        assert scores[1] < 0
        assert scores[2] < scores[0]  # deletions are costly

    def test_clustering_respects_identity(self):
        wt = "MKTAYIAKQRMKTAYIAKQR"
        near = wt[:-1] + "W"
        far = "GGGGGGGGGGGGGGGGGGGG"
        clusters = provean.cluster_supporting_set(
            wt, [near, far], identity=0.75
        )
        # near joins a cluster with itself; far starts its own
        reps = [cl[0] for cl in clusters]
        assert near in reps and far in reps


class TestWavenet:
    def test_learns_family_statistics(self):
        import jax

        from proteingym_tpu.models import wavenet

        rng = np.random.RandomState(0)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        consensus = "".join(AA[i] for i in rng.randint(0, 20, 24))
        fam = []
        for _ in range(40):
            s = list(consensus)
            for p in rng.choice(24, 3, replace=False):
                s[p] = AA[rng.randint(0, 20)]
            fam.append("".join(s))
        c = wavenet.WavenetConfig(num_layers=6, steps=250,
                                  embed_dim=32, hidden_dim=32)
        params = wavenet.init_params(jax.random.PRNGKey(0), c)
        params, losses = wavenet.train(params, c, fam, seed=0)
        assert losses[-10:].mean() < losses[:10].mean()
        # consensus scores above a scrambled sequence; deletion penalized
        scrambled = consensus[::-1]
        dele = consensus[:8] + consensus[12:]
        scores = wavenet.score_sequences(
            params, c, [consensus, scrambled, dele]
        )
        assert scores[0] > scores[1]
        assert np.isfinite(scores).all()

    def test_causality(self):
        """Changing a later residue cannot change earlier predictions."""
        import jax
        import jax.numpy as jnp

        from proteingym_tpu.models import wavenet

        c = wavenet.WavenetConfig(num_layers=4, embed_dim=16, hidden_dim=16)
        params = wavenet.init_params(jax.random.PRNGKey(0), c)
        a = wavenet.encode("ACDEFGHIKL")
        b = a.copy()
        b[-1] = wavenet.encode("W")[-1]
        la = np.asarray(wavenet.apply(params, c, jnp.asarray(a[None])))
        lb = np.asarray(wavenet.apply(params, c, jnp.asarray(b[None])))
        np.testing.assert_allclose(la[0, :-1], lb[0, :-1], atol=1e-6)
