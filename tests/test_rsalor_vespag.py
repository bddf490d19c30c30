"""RSALOR (RSA x log-odds) and VespaG (distilled PLM head)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import gemme, rsalor, vespag

AA = "ACDEFGHIKLMNPQRSTVWY"


def _msa(rs, n=60, L=12):
    consensus = rs.randint(1, 21, L)
    mat = np.tile(consensus, (n, 1)).astype(np.int8)
    for r in range(1, n):
        for j in range(L):
            if rs.rand() < 0.25:
                mat[r, j] = rs.randint(1, 21)
    return mat, consensus


class TestRsalor:
    def test_rsa_proxy_range_and_burial(self):
        coords = synthetic_helix_backbone(30)
        rsa = rsalor.rsa_from_structure(coords)
        assert rsa.shape == (30,)
        assert (rsa >= 0).all() and (rsa <= 1).all()
        # chain ends are more exposed than the middle
        assert rsa[[0, -1]].mean() >= rsa[10:20].mean()

    def test_lor_and_burial_weighting(self):
        rs = np.random.RandomState(0)
        mat, consensus = _msa(rs)
        coords = synthetic_helix_backbone(12)
        model = rsalor.fit_rsalor(mat, coords=coords)
        wt = "".join(AA[c - 1] for c in consensus)
        rare = AA[(consensus[5] + 7) % 20]
        s = rsalor.score_mutants(model, wt, [f"{wt[5]}6{rare}", "WT"])
        assert s[0] < 0 and s[1] == 0.0
        # more buried position -> larger |score| for the same LOR
        buried = np.argmin(model.rsa)
        exposed = np.argmax(model.rsa)
        model_flat = rsalor.RsalorModel(
            log_freq=np.zeros_like(model.log_freq) - 1.0, rsa=model.rsa,
        )
        model_flat.log_freq[:, 0] = -3.0  # uniform LOR landscape
        mb = f"{wt[buried]}{buried + 1}A" if wt[buried] != "A" else None
        me = f"{wt[exposed]}{exposed + 1}A" if wt[exposed] != "A" else None
        if mb and me:
            sb, se = rsalor.score_mutants(model_flat, wt, [mb, me])
            assert abs(sb) >= abs(se)


class TestVespag:
    def test_distillation_recovers_teacher_ranking(self):
        rs = np.random.RandomState(1)
        L, D = 15, 32
        cfg = vespag.VespagConfig(embed_dim=D, hidden_dim=64)
        params = vespag.init_params(jax.random.PRNGKey(0), cfg)
        emb = rs.randn(L, D).astype(np.float32)
        teacher = rs.randn(L, 20).astype(np.float32)
        trained = vespag.train_from_teacher(params, emb, teacher, steps=400)
        pred = np.asarray(vespag.landscape(trained, emb))
        from scipy.stats import spearmanr

        rho = spearmanr(pred.ravel(), teacher.ravel()).statistic
        assert rho > 0.9

    def test_score_via_gemme_teacher(self):
        rs = np.random.RandomState(2)
        mat, consensus = _msa(rs, n=80)
        g = gemme.fit_gemme(mat)
        wt = "".join(AA[c - 1] for c in consensus)
        L = len(wt)
        cfg = vespag.VespagConfig(embed_dim=16, hidden_dim=32)
        params = vespag.init_params(jax.random.PRNGKey(1), cfg)
        emb = rs.randn(L, 16).astype(np.float32)
        trained = vespag.train_from_teacher(
            params, emb, g.combined(), steps=300
        )
        muts = [f"{wt[2]}3{'A' if wt[2] != 'A' else 'C'}", "WT"]
        s = vespag.score_mutants(trained, emb, wt, muts)
        assert np.isfinite(s).all() and s[1] == 0.0
