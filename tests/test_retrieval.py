"""Retrieval priors + fusion: parity with the reference's per-sequence loop
semantics (trancepteve/model_pytorch.py:1090-1120, tranception msa_utils)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.models import retrieval

AA = "ACDEFGHIKLMNPQRSTVWY"


def _random_msa(rs, n, L, focus=None):
    seqs = []
    if focus is None:
        focus = "".join(AA[i] for i in rs.randint(0, 20, L))
    seqs.append(focus)
    for _ in range(n - 1):
        s = list(focus)
        for p in rs.choice(L, max(1, L // 4), replace=False):
            s[p] = AA[rs.randint(20)]
        seqs.append("".join(s))
    return seqs


class TestMsaPrior:
    def test_rows_sum_to_one_inside_window(self):
        rs = np.random.RandomState(0)
        seqs = _random_msa(rs, 20, 12)
        prior = retrieval.msa_prior(seqs, None, 3, 15, 30)
        np.testing.assert_allclose(prior[3:15].sum(axis=1), 1.0, rtol=1e-9)
        assert (prior[:3] == 0).all() and (prior[15:] == 0).all()

    def test_hamming_filter_drops_dissimilar(self):
        rs = np.random.RandomState(1)
        seqs = _random_msa(rs, 5, 20)
        junk = "".join(AA[(AA.index(c) + 7) % 20] for c in seqs[0])
        keep = retrieval.hamming_filter(seqs + [junk])
        assert len(seqs + [junk]) - 1 not in keep
        assert 0 in keep

    def test_weights_shift_prior(self):
        seqs = ["AC", "AC", "CC"]
        p_flat = retrieval.msa_prior(seqs, np.array([1.0, 1.0, 1.0]), 0, 2, 2,
                                     filter_msa=False)
        p_up = retrieval.msa_prior(seqs, np.array([1.0, 1.0, 10.0]), 0, 2, 2,
                                   filter_msa=False)
        c_idx = 5 + AA.index("C")
        assert p_up[0, c_idx] > p_flat[0, c_idx]

    def test_window_mismatch_raises(self):
        with pytest.raises(ValueError):
            retrieval.msa_prior(["ACD"], None, 0, 2, 10)


class TestDepthTables:
    def test_alpha_table(self):
        # ref trancepteve/model_pytorch.py:738-750
        assert retrieval.msa_alpha(5) == 0.0
        assert retrieval.msa_alpha(50) == 0.1
        assert retrieval.msa_alpha(500) == 0.3
        assert retrieval.msa_alpha(5000) == 0.4
        assert retrieval.msa_alpha(50000) == 0.4
        assert retrieval.msa_alpha(500000) == 0.5
        assert retrieval.msa_alpha(999, retrieval_type="Tranception") == 0.6

    def test_beta_table(self):
        # ref :751-763
        assert retrieval.eve_beta(5) == 0.0
        assert retrieval.eve_beta(50) == 0.3
        assert retrieval.eve_beta(500) == 0.6
        assert retrieval.eve_beta(5000) == 0.7
        assert retrieval.eve_beta(50000) == 0.7
        assert retrieval.eve_beta(500000) == 0.8

    def test_indel_tables(self):
        assert retrieval.msa_alpha(5, indel_mode=True) == 0.0
        assert retrieval.msa_alpha(100, indel_mode=True) == 0.5
        assert retrieval.eve_beta(100, indel_mode=True) == 0.1


class TestRecalibration:
    def test_converges_to_target_mean(self):
        rs = np.random.RandomState(0)
        logits = rs.randn(10, 20)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        target = 2.0 * logp.mean()
        out = retrieval.recalibrate_log_prior(logp, target)
        assert abs(out.mean() - target) <= 0.001
        # still normalized log-probs
        np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-6)


def _reference_fusion_loop(shift_logps, targets, starts, ends, flip,
                           msa_lp, msa_start, msa_end, alpha,
                           eve_lp=None, beta=0.0, n_special=5):
    """Direct NumPy port of the reference's per-sequence fusion loop
    (dynamic min/max_prior_slice + min/max_logits_slice arithmetic)."""
    fused = shift_logps.copy()
    B = shift_logps.shape[0]
    for s in range(B):
        if not (msa_start < ends[s] and msa_end > starts[s]):
            continue
        lo = max(starts[s], msa_start)
        hi = min(ends[s], msa_end)
        if hi <= lo:
            continue
        msa_slice = msa_lp[lo:hi]
        eve_slice = eve_lp[lo:hi] if eve_lp is not None else None
        if flip:
            msa_slice = msa_slice[::-1]
            if eve_slice is not None:
                eve_slice = eve_slice[::-1]
            mn = max(0, ends[s] - msa_end)
        else:
            mn = max(0, msa_start - starts[s])
        mx = mn + (hi - lo)
        seg = fused[s, mn:mx, n_special:]
        ar = shift_logps[s, mn:mx, n_special:]
        mixed = (1 - alpha) * ar + alpha * msa_slice[:, n_special:]
        if eve_slice is not None:
            ev = eve_slice[:, n_special:]
            finite = np.isfinite(ev)
            b_eff = np.where(finite, beta, 0.0)
            mixed = (1 - b_eff) * mixed + b_eff * np.where(finite, ev, 0.0)
        # only fuse rows whose target is a real AA (trimmed rows / EOS are
        # never inside [mn, mx) in the reference since mx-mn == slice len)
        fused[s, mn:mx, n_special:] = mixed
    return fused


class TestFusionKernel:
    def _setup(self, rs, B=4, T=12, V=25, full=40, msa_start=8, msa_end=30):
        logits = rs.randn(B, T, V).astype(np.float32)
        shift = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        msa_lp = np.log(rs.dirichlet(np.ones(V), size=full)).astype(np.float32)
        starts = np.array([0, 5, 10, 28], dtype=np.int32)
        ends = starts + (T - 2)  # rows: CLS + seq + SEP -> T-2 residues
        # targets: AA tokens for residues, SEP at the end
        targets = rs.randint(5, V, size=(B, T)).astype(np.int32)
        targets[:, T - 2] = 2  # SEP
        targets[:, T - 1] = 3  # PAD
        return shift, targets, starts, ends, msa_lp

    @pytest.mark.parametrize("flip", [False, True])
    def test_matches_reference_loop(self, flip):
        rs = np.random.RandomState(0)
        shift, targets, starts, ends, msa_lp = self._setup(rs)
        alpha = 0.4
        fuse = retrieval.make_fusion(msa_lp, 8, 30, alpha)
        got = np.asarray(fuse(jnp.asarray(shift), jnp.asarray(targets),
                              jnp.asarray(starts), jnp.asarray(ends), flip))
        want = _reference_fusion_loop(shift, targets, starts, ends, flip,
                                      msa_lp, 8, 30, alpha)
        # compare only at gathered target positions (what the NLL consumes):
        # rows whose target is not an AA are masked in our kernel by design.
        for b in range(got.shape[0]):
            for t in range(got.shape[1]):
                if targets[b, t] >= 5:
                    np.testing.assert_allclose(
                        got[b, t, targets[b, t]],
                        want[b, t, targets[b, t]],
                        rtol=1e-5,
                        err_msg=f"b={b} t={t} flip={flip}",
                    )

    @pytest.mark.parametrize("flip", [False, True])
    def test_trancepteve_with_eve_prior(self, flip):
        rs = np.random.RandomState(1)
        shift, targets, starts, ends, msa_lp = self._setup(rs)
        V, full = 25, 40
        eve_lp = np.full((full, V), -np.inf, dtype=np.float32)
        focus = np.arange(8, 30, 2)  # every other col is a focus col
        eve_lp[focus, 5:] = np.log(
            rs.dirichlet(np.ones(V - 5), size=len(focus))
        ).astype(np.float32)
        alpha, beta = 0.3, 0.6
        fuse = retrieval.make_fusion(msa_lp, 8, 30, alpha, eve_prior=eve_lp,
                                     beta=beta)
        got = np.asarray(fuse(jnp.asarray(shift), jnp.asarray(targets),
                              jnp.asarray(starts), jnp.asarray(ends), flip))
        want = _reference_fusion_loop(shift, targets, starts, ends, flip,
                                      msa_lp, 8, 30, alpha, eve_lp, beta)
        for b in range(got.shape[0]):
            for t in range(got.shape[1]):
                if targets[b, t] >= 5:
                    np.testing.assert_allclose(
                        got[b, t, targets[b, t]],
                        want[b, t, targets[b, t]],
                        rtol=1e-5,
                        err_msg=f"b={b} t={t} flip={flip}",
                    )
        assert np.isfinite(got).all()

    def test_alpha_zero_is_identity(self):
        rs = np.random.RandomState(2)
        shift, targets, starts, ends, msa_lp = self._setup(rs)
        fuse = retrieval.make_fusion(msa_lp, 8, 30, 0.0)
        got = np.asarray(fuse(jnp.asarray(shift), jnp.asarray(targets),
                              jnp.asarray(starts), jnp.asarray(ends), False))
        np.testing.assert_allclose(got, shift, rtol=1e-6)


class TestEveLogPrior:
    def test_shape_and_focus_scatter(self):
        from proteingym_tpu.models.eve import EveConfig, init_params

        L = 8
        cfg = EveConfig(
            seq_len=L, alphabet_size=20, encoder_hidden=(16,),
            decoder_hidden=(16,), z_dim=4, convolve_output=False,
            include_temperature_scaler=False,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        focus_cols = np.arange(L)
        lp = retrieval.eve_log_prior(
            [params], cfg, "ACDEFGHI", focus_cols, msa_start=2, full_len=15,
            num_samples=8, sample_chunk=4,
        )
        assert lp.shape == (15, 25)
        assert np.isfinite(lp[2:10, 5:]).all()
        assert np.isneginf(lp[0]).all() and np.isneginf(lp[12]).all()
        assert np.isneginf(lp[2:10, :5]).all()


class TestEndToEndTranceptEve:
    def test_fused_scoring_changes_scores_not_wt(self):
        from proteingym_tpu.models.tranception import (
            TranceptionConfig, init_params,
        )
        from proteingym_tpu.models.trancepteve import (
            RetrievalConfig, score_trancepteve,
        )

        rs = np.random.RandomState(0)
        target = "".join(AA[i] for i in rs.randint(0, 20, 24))
        muts = [f"{target[p]}{p + 1}{m}" for p, m in [(0, "A"), (5, "W"), (11, "C")]
                if m != target[p]]
        from proteingym_tpu.data.mutants import apply_mutant
        mseqs = [apply_mutant(target, m) for m in muts]

        cfg = TranceptionConfig(
            name="tiny", num_layers=2, embed_dim=32, num_heads=4, n_ctx=64,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        seqs = _random_msa(rs, 30, 24, focus=target)
        from proteingym_tpu.models.trancepteve import build_priors
        rcfg = RetrievalConfig(retrieval_type="Tranception", msa_start=0,
                               msa_end=24, alpha=0.6)
        msa_lp, eve_lp, alpha, beta = build_priors(seqs, None, target, rcfg)
        assert alpha == 0.6 and beta == 0.0 and eve_lp is None

        plain = score_trancepteve(params, cfg, muts, mseqs, target,
                                  scoring_mirror=False, batch_size=8)
        fused = score_trancepteve(params, cfg, muts, mseqs, target, rcfg=rcfg,
                                  msa_log_prior=msa_lp, alpha=alpha,
                                  scoring_mirror=False, batch_size=8)
        assert not np.allclose(
            plain["avg_score"].to_numpy(), fused["avg_score"].to_numpy()
        )
        assert np.isfinite(fused["avg_score"].to_numpy()).all()
