"""Profile HMM: forward-algorithm parity vs a brute-force DP and
biological sanity (conserved positions penalized more)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.models.hmm import (
    AA_ORDER, build_profile_hmm, forward_logprob, score_sequences,
)

NEG_BIG = -1e30


def _lse(a, b):
    return np.logaddexp(a, b)


def _brute_force_forward(hmm, tokens, insert_open=0.01, insert_extend=0.4):
    """O(T*L) loop DP over the same state space as forward_logprob."""
    L = hmm.L
    e_m = hmm.log_e_match
    bg = hmm.log_bg
    a = hmm.log_a
    li_open, li_ext = np.log(insert_open), np.log(insert_extend)
    li_exit = np.log(1 - insert_extend)
    b_d1 = a["MD"][0]
    b_m1 = np.log(max(1 - np.exp(b_d1) - insert_open, 1e-8))

    begin = 0.0
    ins0 = NEG_BIG
    m = np.full(L, NEG_BIG)
    i = np.full(L, NEG_BIG)
    d = np.full(L, NEG_BIG)
    d[0] = b_d1
    for j in range(1, L):
        d[j] = d[j - 1] + a["DD"][j - 1]

    for tok in tokens:
        if tok < 0:
            break
        new_ins0 = _lse(begin + li_open, ins0 + li_ext)
        new_m = np.full(L, NEG_BIG)
        new_i = np.full(L, NEG_BIG)
        new_d = np.full(L, NEG_BIG)
        for j in range(L):
            if j == 0:
                entry = _lse(begin + b_m1, ins0 + li_exit)
            else:
                entry = _lse(
                    _lse(m[j - 1] + a["MM"][j - 1], i[j - 1] + a["IM"][j - 1]),
                    d[j - 1] + a["DM"][j - 1],
                )
            new_m[j] = e_m[j, tok] - bg[tok] + entry
            new_i[j] = _lse(m[j] + a["MI"][j], i[j] + a["II"][j])
        for j in range(1, L):
            new_d[j] = _lse(
                new_m[j - 1] + a["MD"][j - 1], new_d[j - 1] + a["DD"][j - 1]
            )
        begin, ins0, m, i, d = NEG_BIG, new_ins0, new_m, new_i, new_d
    return _lse(_lse(m[-1], i[-1]), d[-1])


def _toy_msa(rs, n=40, L=10):
    """MSA with strongly conserved even positions, variable odd ones, and
    some gappy rows."""
    mat = np.zeros((n, L), dtype=np.int8)
    consensus = rs.randint(1, 21, L)
    for r in range(n):
        row = consensus.copy()
        for j in range(1, L, 2):
            if rs.rand() < 0.7:
                row[j] = rs.randint(1, 21)
        if r % 7 == 0:
            row[rs.randint(L)] = 0  # gap
        mat[r] = row
    return mat, consensus


class TestForwardParity:
    @pytest.mark.parametrize("seq_len", [6, 10, 14])
    def test_matches_brute_force(self, seq_len):
        rs = np.random.RandomState(0)
        mat, consensus = _toy_msa(rs, L=10)
        hmm = build_profile_hmm(mat)
        tokens = rs.randint(0, 20, seq_len).astype(np.int32)
        got = float(forward_logprob(hmm, jnp.asarray(tokens)))
        want = _brute_force_forward(hmm, tokens)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_padding_is_ignored(self):
        rs = np.random.RandomState(1)
        mat, _ = _toy_msa(rs)
        hmm = build_profile_hmm(mat)
        tokens = rs.randint(0, 20, 8).astype(np.int32)
        padded = np.concatenate([tokens, -np.ones(5, dtype=np.int32)])
        a = float(forward_logprob(hmm, jnp.asarray(tokens)))
        b = float(forward_logprob(hmm, jnp.asarray(padded)))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestSemantics:
    def test_consensus_beats_random(self):
        rs = np.random.RandomState(2)
        mat, consensus = _toy_msa(rs, n=80, L=12)
        hmm = build_profile_hmm(mat)
        cons_seq = "".join(AA_ORDER[c - 1] for c in consensus)
        rand_seq = "".join(AA_ORDER[i] for i in rs.randint(0, 20, 12))
        s = score_sequences(hmm, [cons_seq, rand_seq])
        assert s[0] > s[1]

    def test_conserved_position_penalized_more(self):
        rs = np.random.RandomState(3)
        mat, consensus = _toy_msa(rs, n=200, L=12)
        hmm = build_profile_hmm(mat)
        cons = "".join(AA_ORDER[c - 1] for c in consensus)

        def mutate(seq, pos):
            new_aa = AA_ORDER[(AA_ORDER.index(seq[pos]) + 5) % 20]
            return seq[:pos] + new_aa + seq[pos + 1 :]

        s = score_sequences(
            hmm, [cons, mutate(cons, 4), mutate(cons, 5)]
        )  # pos 4 conserved (even), pos 5 variable (odd)
        delta_conserved = s[1] - s[0]
        delta_variable = s[2] - s[0]
        assert delta_conserved < delta_variable < 0 or (
            delta_conserved < delta_variable
        )

    def test_indels_scoreable(self):
        rs = np.random.RandomState(4)
        mat, consensus = _toy_msa(rs, n=50, L=12)
        hmm = build_profile_hmm(mat)
        cons = "".join(AA_ORDER[c - 1] for c in consensus)
        deletion = cons[:5] + cons[6:]
        insertion = cons[:5] + "A" + cons[5:]
        s = score_sequences(hmm, [cons, deletion, insertion])
        assert np.isfinite(s).all()
        assert s[0] > s[1] and s[0] > s[2]

    def test_weights_change_model(self):
        rs = np.random.RandomState(5)
        mat, _ = _toy_msa(rs, n=30, L=8)
        w_flat = np.ones(30)
        w_skew = np.ones(30)
        w_skew[:5] = 20.0
        h1 = build_profile_hmm(mat, w_flat)
        h2 = build_profile_hmm(mat, w_skew)
        assert not np.allclose(h1.log_e_match, h2.log_e_match)


def test_degenerate_residues_score_as_background():
    """X/B/Z residues emit from the background (log-odds 0) but still
    advance the recursion — they must NOT freeze it like padding, and the
    JAX and C++ paths must agree."""
    import numpy as np

    from proteingym_tpu.models import hmm as hmm_mod

    rs = np.random.RandomState(0)
    msa = ["".join("ACDEFGHIKLMNPQRSTVWY"[i] for i in rs.randint(0, 20, 12))
           for _ in range(8)]
    mat = np.stack([hmm_mod._encode(s) for s in msa])
    model = hmm_mod.build_profile_hmm(mat)
    clean = msa[0]
    with_x = clean[:5] + "X" + clean[6:]
    s_clean = hmm_mod.score_sequences(model, [clean])[0]
    s_x = hmm_mod.score_sequences(model, [with_x])[0]
    assert np.isfinite(s_x)
    # replacing one residue with X removes exactly that residue's
    # information: score must move, and NOT equal the frozen-recursion
    # value of the 11-residue truncated sequence
    truncated = clean[:5] + clean[6:]
    s_trunc = hmm_mod.score_sequences(model, [truncated])[0]
    assert s_x != s_clean
    assert abs(s_x - s_trunc) > 1e-6
