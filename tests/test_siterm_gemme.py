"""SiteRM (per-site rate matrices) and GEMME-class evolutionary models."""

import numpy as np
import pytest

pytest.importorskip("jax")

from proteingym_tpu.models import gemme, siterm

AA = "ACDEFGHIKLMNPQRSTVWY"


def _msa(rs, n=60, L=12, conserved_every=2):
    """Even positions conserved, odd variable; returns codes (1..20)."""
    consensus = rs.randint(1, 21, L)
    mat = np.tile(consensus, (n, 1)).astype(np.int8)
    for r in range(1, n):
        for j in range(1, L, conserved_every):
            if rs.rand() < 0.6:
                mat[r, j] = rs.randint(1, 21)
    return mat, consensus


class TestCherries:
    def test_pairs_disjoint_and_similar(self):
        rs = np.random.RandomState(0)
        mat, _ = _msa(rs, n=20)
        pairs = siterm.cherry_pairs(mat)
        flat = [i for p in pairs for i in p]
        assert len(flat) == len(set(flat))
        assert len(pairs) == 10


class TestSiteRm:
    def test_transition_probs_are_stochastic(self):
        rs = np.random.RandomState(1)
        mat, _ = _msa(rs)
        model = siterm.fit_siterm(mat)
        p = model.transition_prob()
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
        assert (p >= 0).all()

    def test_conserved_positions_get_lower_rates(self):
        rs = np.random.RandomState(2)
        mat, _ = _msa(rs, n=100)
        model = siterm.fit_siterm(mat)
        # even positions conserved -> lower substitution rate
        assert model.mu[::2].mean() < model.mu[1::2].mean()

    def test_scoring_penalizes_conserved_sites_more(self):
        rs = np.random.RandomState(3)
        mat, consensus = _msa(rs, n=100)
        model = siterm.fit_siterm(mat)
        wt = "".join(AA[c - 1] for c in consensus)

        def mut(pos):
            new = AA[(consensus[pos] - 1 + 7) % 20]
            return f"{wt[pos]}{pos + 1}{new}"

        s = siterm.score_mutants(model, wt, [mut(4), mut(5)])
        assert s[0] < s[1] < 0  # conserved site (4) worse than variable (5)

    def test_expm_path_matches_closed_form(self):
        rs = np.random.RandomState(4)
        mat, consensus = _msa(rs, n=40)
        model = siterm.fit_siterm(mat)
        wt = "".join(AA[c - 1] for c in consensus)
        muts = [f"{wt[1]}2{AA[(consensus[1]+3) % 20]}"]
        closed = siterm.score_mutants(model, wt, muts)
        # build the equivalent F81 generator: Q[a,b] = mu*pi[b] (a!=b)
        L, q = model.pi.shape
        Q = np.zeros((L, q, q))
        for i in range(L):
            Q[i] = model.mu[i] * np.tile(model.pi[i], (q, 1))
            np.fill_diagonal(Q[i], 0.0)
            np.fill_diagonal(Q[i], -Q[i].sum(1))
        via_expm = siterm.score_from_rate_matrices(Q, model.t, wt, muts)
        np.testing.assert_allclose(closed, via_expm, rtol=1e-4)

    def test_wt_scores_zero(self):
        rs = np.random.RandomState(5)
        mat, consensus = _msa(rs)
        model = siterm.fit_siterm(mat)
        wt = "".join(AA[c - 1] for c in consensus)
        assert siterm.score_mutants(model, wt, ["WT"])[0] == 0.0


class TestGemme:
    def test_conserved_positions_penalized_more(self):
        rs = np.random.RandomState(6)
        mat, consensus = _msa(rs, n=120)
        model = gemme.fit_gemme(mat)
        wt = "".join(AA[c - 1] for c in consensus)

        def mut(pos):
            new = AA[(consensus[pos] - 1 + 7) % 20]
            return f"{wt[pos]}{pos + 1}{new}"

        s = gemme.score_mutants(model, wt, [mut(6), mut(7)])
        assert s[0] < s[1]

    def test_variant_seen_in_close_homolog_scores_better(self):
        rs = np.random.RandomState(7)
        L = 10
        consensus = rs.randint(1, 21, L)
        # family: one very close homolog carries aa X at pos 3;
        # a distant homolog carries aa Y at pos 3
        close = consensus.copy()
        x_aa = (consensus[3] % 20) + 1
        close[3] = x_aa
        far = rs.randint(1, 21, L)
        y_aa = (consensus[3] + 9) % 20 + 1
        if y_aa == x_aa:
            y_aa = (y_aa % 20) + 1
        far[3] = y_aa
        mat = np.stack([consensus, close, consensus, far]).astype(np.int8)
        model = gemme.fit_gemme(mat)
        wt = "".join(AA[c - 1] for c in consensus)
        m_close = f"{wt[3]}4{AA[x_aa - 1]}"
        m_far = f"{wt[3]}4{AA[y_aa - 1]}"
        s = gemme.score_mutants(model, wt, [m_close, m_far],
                                mode="epistatic")
        assert s[0] > s[1]

    def test_modes_and_wt(self):
        rs = np.random.RandomState(8)
        mat, consensus = _msa(rs)
        model = gemme.fit_gemme(mat)
        wt = "".join(AA[c - 1] for c in consensus)
        for mode in ["combined", "epistatic", "independent"]:
            s = gemme.score_mutants(model, wt, ["WT", f"{wt[0]}1{AA[5]}"],
                                    mode=mode)
            assert s[0] == 0.0
            assert np.isfinite(s).all()


def _two_clade_msa(rs, L=30, per_clade=20):
    """Known tree structure: two clades split at the root.

    Column roles: 0-9 globally conserved; 10-14 differ BETWEEN clades but
    are conserved within each (deep-split columns); 15-29 vary randomly
    within clades (shallow columns)."""
    base = rs.randint(1, 21, L)
    clade_b = base.copy()
    for p in range(10, 15):
        clade_b[p] = (base[p] % 20) + 1
    rows = []
    for c, proto in enumerate([base, clade_b]):
        for _ in range(per_clade):
            s = proto.copy()
            for p in range(15, L):
                if rs.rand() < 0.6:
                    s[p] = rs.randint(1, 21)
            rows.append(s)
    return np.asarray(rows, np.int8), base


class TestGemmeTree:
    """The faithful (JET2-trace + NJ patristic distance) path."""

    def test_method_is_tree_with_native_lib(self):
        from proteingym_tpu import native

        rs = np.random.RandomState(10)
        mat, base = _two_clade_msa(rs)
        model = gemme.fit_gemme(mat)
        if native.get_lib() is None:
            assert model.method == "surrogate"
        else:
            assert model.method == "tree"

    def test_ranked_et_trace_orders_by_tree_level(self):
        """Globally conserved > deep-split > shallow columns — the ET
        ordering (Engelen et al. 2009) that entropy conservation cannot
        produce (entropy scores deep-split and shallow columns alike)."""
        from proteingym_tpu import native

        rs = np.random.RandomState(11)
        mat, base = _two_clade_msa(rs)
        tree = native.nj_tree(mat)
        if tree is None:
            import pytest

            pytest.skip("native NJ library unavailable")
        trace = gemme._ranked_et_trace(mat.astype(np.int64), tree)
        conserved = trace[:10].mean()
        deep = trace[10:15].mean()
        shallow = trace[15:].mean()
        assert conserved > deep > shallow
        np.testing.assert_allclose(trace[:10], 1.0)  # rank 1 exactly

    def test_epistatic_uses_tree_distance(self):
        """A variant carried only in the other clade must score worse
        than one carried by a same-clade neighbor, and the distances
        must come from the tree (method == 'tree')."""
        from proteingym_tpu import native

        if native.get_lib() is None:
            import pytest

            pytest.skip("native NJ library unavailable")
        rs = np.random.RandomState(12)
        mat, base = _two_clade_msa(rs)
        # query = row 0 (clade A). Plant variant X in a clade-A row and
        # variant Y in a clade-B row at a conserved column
        pos = 5
        x_aa = (base[pos] % 20) + 1
        y_aa = ((base[pos] + 7) % 20) + 1
        if y_aa == x_aa:
            y_aa = (y_aa % 20) + 1
        mat[0] = base  # exact query
        mat[3, pos] = x_aa  # same clade
        mat[25, pos] = y_aa  # other clade
        model = gemme.fit_gemme(mat)
        assert model.method == "tree"
        wt = "".join(AA[c - 1] for c in base)
        m_same = f"{wt[pos]}{pos + 1}{AA[x_aa - 1]}"
        m_other = f"{wt[pos]}{pos + 1}{AA[y_aa - 1]}"
        s = gemme.score_mutants(model, wt, [m_same, m_other],
                                mode="epistatic")
        assert s[0] > s[1]

    def test_surrogate_fallback_forced(self):
        rs = np.random.RandomState(13)
        mat, base = _two_clade_msa(rs)
        model = gemme.fit_gemme(mat, use_tree=False)
        assert model.method == "surrogate"
        wt = "".join(AA[c - 1] for c in base)
        s = gemme.score_mutants(model, wt, [f"{wt[0]}1{AA[5]}"])
        assert np.isfinite(s).all()

    def test_alpha_depth_schedule(self):
        rs = np.random.RandomState(14)
        mat, _ = _two_clade_msa(rs)
        shallow = gemme.fit_gemme(mat[:6])
        deep = gemme.fit_gemme(mat)
        assert shallow.alpha >= deep.alpha  # shallow leans independent


class TestSiteRmGtr:
    """The real SiteRM model class: per-site reversible 21-state rate
    matrices (ref SiteRM/compute_fitness.py:83-130, 328-350)."""

    def _fit(self, seed=0, **kw):
        rs = np.random.RandomState(seed)
        mat, consensus = _msa(rs, n=40, L=10)
        model = siterm.fit_site_rate_matrices(mat, epochs=30, **kw)
        return model, mat, consensus

    def test_valid_reversible_rate_matrices(self):
        model, _, _ = self._fit()
        Q = model.rate_matrices
        assert Q.shape == (10, 21, 21)
        np.testing.assert_allclose(Q.sum(-1), 0.0, atol=1e-4)
        off = Q * (1 - np.eye(21))
        assert (off >= -1e-8).all()
        # detailed balance: pi_a Q_ab == pi_b Q_ba
        for i in (0, 3, 7):
            pi = siterm.stationary_distribution(Q[i])
            flux = pi[:, None] * Q[i]
            np.testing.assert_allclose(flux, flux.T, atol=1e-4)

    def test_conserved_sites_score_lower_for_substitutions(self):
        model, mat, consensus = self._fit()
        wt = "".join(AA[c - 1] for c in consensus)
        # even sites conserved, odd variable in _msa
        cons_pos, var_pos = 2, 1
        mt_c = AA[(consensus[cons_pos]) % 20]
        mt_v = AA[(consensus[var_pos]) % 20]
        scores = siterm.score_mutants_gtr(
            model, wt,
            [f"{wt[cons_pos]}{cons_pos + 1}{mt_c}",
             f"{wt[var_pos]}{var_pos + 1}{mt_v}"],
        )
        assert scores[0] < scores[1]

    def test_prior_matrix_file_roundtrip(self, tmp_path):
        Q = siterm.uniform_prior(21)
        states = list(siterm.ALPHABET21)
        f = tmp_path / "prior.txt"
        with open(f, "w") as fh:
            fh.write("\t" + "\t".join(states) + "\n")
            for i, s in enumerate(states):
                fh.write(s + "\t" + "\t".join(str(v) for v in Q[i]) + "\n")
        Q2, states2 = siterm.read_rate_matrix(f)
        np.testing.assert_allclose(Q2, Q)
        assert states2 == states
        model, _, _ = self._fit(prior_Q=Q2)
        assert np.isfinite(model.rate_matrices).all()

    def test_reference_lg_with_gaps_parses(self):
        import pathlib

        lg = pathlib.Path(
            "/root/reference/proteingym/baselines/SiteRM/lg_with_gaps.txt"
        )
        if not lg.exists():
            pytest.skip("reference LG file unavailable")
        Q, states = siterm.read_rate_matrix(lg)
        assert len(states) == 21 and states[-1] == "-"
        # The shipped file is in PAML order (A R N D C ...), NOT ALPHABET21
        # order — the scorer must permute before use.
        assert states[:5] == list("ARNDC")
        Qr = siterm.reorder_rate_matrix(Q, states)
        np.testing.assert_allclose(Qr.sum(1), 0.0, atol=1e-5)
        # spot-check the permutation: Q_reordered[a, b] == Q[file_a, file_b]
        for a, b in [("A", "R"), ("W", "-"), ("C", "C")]:
            ia, ib = siterm.ALPHABET21.index(a), siterm.ALPHABET21.index(b)
            assert Qr[ia, ib] == Q[states.index(a), states.index(b)]
        pi = siterm.stationary_distribution(Qr)
        assert (pi > 0).all()
        model, _, _ = self._fit(prior_Q=Qr)
        assert np.isfinite(model.rate_matrices).all()

    def test_reorder_rate_matrix_rejects_bad_states(self):
        Q = siterm.uniform_prior(21)
        with pytest.raises(ValueError):
            siterm.reorder_rate_matrix(Q, list(siterm.ALPHABET21[:-1]) + ["B"])
        # identity when already in ALPHABET21 order
        np.testing.assert_array_equal(
            siterm.reorder_rate_matrix(Q, list(siterm.ALPHABET21)), Q
        )

    def test_regularization_pulls_toward_prior(self):
        """Full regularization reproduces prior-like matrices regardless of
        the data; no regularization tracks the data (conserved sites drive
        their leaving rates toward 0)."""
        rs = np.random.RandomState(0)
        mat, consensus = _msa(rs, n=60, L=10)
        m_reg = siterm.fit_site_rate_matrices(
            mat, epochs=200, regularization_strength=1.0
        )
        m_free = siterm.fit_site_rate_matrices(
            mat, epochs=200, regularization_strength=0.0
        )
        spread_reg = np.std(m_reg.rate_matrices, axis=0).mean()
        spread_free = np.std(m_free.rate_matrices, axis=0).mean()
        assert spread_reg < spread_free
        c0 = consensus[2] - 1  # site 2 is conserved in _msa
        assert (-m_free.rate_matrices[2, c0, c0]
                < -m_reg.rate_matrices[2, c0, c0])
