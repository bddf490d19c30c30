"""Kermut GP: kernel properties, marginal-likelihood fit, prediction."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import kermut

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def world():
    rs = np.random.RandomState(0)
    L = 20
    probs = rs.dirichlet(np.ones(20) * 2.0, size=L)
    coords = synthetic_helix_backbone(L)[:, 1]
    data = kermut.KermutData.build(probs, coords)
    seq = "".join(AA[i] for i in rs.randint(0, 20, L))
    muts = []
    for p in range(L):
        for m in AA[:4]:
            if m != seq[p]:
                muts.append(f"{seq[p]}{p + 1}{m}")
    # ground truth: smooth function of (position, AA log-prob) -> learnable
    pos, tok, valid = kermut.encode_variants(muts)
    y = np.array(
        [
            np.sin(pos[i, 0] / 3.0) + data.log_probs[pos[i, 0], tok[i, 0]] * 0.5
            for i in range(len(muts))
        ]
    )
    return data, muts, (pos, tok, valid), y


class TestHellinger:
    def test_range_and_diag(self):
        rs = np.random.RandomState(1)
        p = rs.dirichlet(np.ones(20), size=6)
        h = kermut.hellinger_distance(p, p)
        np.testing.assert_allclose(np.diag(h), 0.0, atol=1e-8)
        assert (h >= 0).all() and (h <= 1.0 + 1e-9).all()
        np.testing.assert_allclose(h, h.T, atol=1e-12)


class TestKernel:
    def test_gram_symmetric_psd(self, world):
        data, muts, enc, y = world
        hypers = kermut.init_hypers()
        sub = tuple(jnp.asarray(t[:30]) for t in enc)
        k = np.asarray(kermut.mutation_kernel(hypers, data, sub, sub))
        np.testing.assert_allclose(k, k.T, atol=1e-6)
        eig = np.linalg.eigvalsh(k + 1e-8 * np.eye(30))
        assert eig.min() > -1e-5

    def test_wt_row_zero_kernel(self, world):
        data, muts, enc, y = world
        pos, tok, valid = kermut.encode_variants(["WT", muts[0]])
        hypers = kermut.init_hypers()
        k = np.asarray(
            kermut.mutation_kernel(
                hypers, data,
                (jnp.asarray(pos), jnp.asarray(tok), jnp.asarray(valid)),
                (jnp.asarray(pos), jnp.asarray(tok), jnp.asarray(valid)),
            )
        )
        assert k[0, 0] == 0.0 and k[0, 1] == 0.0 and k[1, 1] > 0.0

    def test_multi_mutant_sums(self, world):
        data, muts, enc, y = world
        single = kermut.encode_variants([muts[0]])
        double = kermut.encode_variants([f"{muts[0]}:{muts[10]}"])
        hypers = kermut.init_hypers()

        def gram(a, b):
            return np.asarray(
                kermut.mutation_kernel(
                    hypers, data,
                    tuple(jnp.asarray(t) for t in a),
                    tuple(jnp.asarray(t) for t in b),
                )
            )

        k_dd = gram(double, double)[0, 0]
        # double-double contains the four pairwise single sums
        s1 = kermut.encode_variants([muts[0]])
        s2 = kermut.encode_variants([muts[10]])
        k_sum = (
            gram(s1, s1)[0, 0] + gram(s2, s2)[0, 0]
            + 2 * gram(s1, s2)[0, 0]
        )
        np.testing.assert_allclose(k_dd, k_sum, rtol=1e-6)


class TestGP:
    def test_fit_and_predict_beats_mean_baseline(self, world):
        data, muts, enc, y = world
        n = len(y)
        rs = np.random.RandomState(2)
        perm = rs.permutation(n)
        tr, te = perm[: n // 2], perm[n // 2 :]
        train = tuple(t[tr] for t in enc)
        test = tuple(t[te] for t in enc)
        hypers = kermut.fit(data, train, y[tr], steps=80)
        pred = kermut.predict(hypers, data, train, y[tr], test)
        mse_gp = np.mean((pred - y[te]) ** 2)
        mse_mean = np.mean((y[tr].mean() - y[te]) ** 2)
        assert mse_gp < 0.5 * mse_mean
        from scipy.stats import spearmanr

        rho = spearmanr(pred, y[te]).statistic
        assert rho > 0.6

    def test_zero_shot_mean_helps(self, world):
        data, muts, enc, y = world
        n = len(y)
        rs = np.random.RandomState(3)
        zs = y + rs.normal(0, 0.2, n)  # informative zero-shot column
        perm = rs.permutation(n)
        tr, te = perm[: n // 3], perm[n // 3 :]
        train = tuple(t[tr] for t in enc)
        test = tuple(t[te] for t in enc)
        hypers = kermut.fit(data, train, y[tr], zero_shot=zs[tr], steps=80)
        pred = kermut.predict(
            hypers, data, train, y[tr], test,
            zero_shot_train=zs[tr], zero_shot_test=zs[te],
        )
        from scipy.stats import spearmanr

        assert spearmanr(pred, y[te]).statistic > 0.8


class TestMpnnConditionals:
    def test_probs_normalized(self):
        from proteingym_tpu.models import protein_mpnn as mpnn

        cfg = mpnn.MpnnConfig(name="tiny", hidden_dim=32, edge_features=32,
                              k_neighbors=6)
        params = mpnn.init_params(jax.random.PRNGKey(0), cfg)
        coords = synthetic_helix_backbone(10)
        probs = kermut.conditional_probs_from_mpnn(
            params, cfg, coords, "ACDEFGHIKL", n_orders=2
        )
        assert probs.shape == (10, 20)
        np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-6)


class TestVendoredKernelParity:
    """Gram-matrix agreement with the vendored Kermut kernel run under a
    gpytorch stub (ref kermut/model/kernel.py:15-120) — VERDICT r2 item 5."""

    def _setup(self, seed=0, L=14):
        torch = pytest.importorskip("torch")
        from reference_torch import load_ref_kermut

        kk = load_ref_kermut()
        rs = np.random.RandomState(seed)
        probs = rs.dirichlet(np.ones(20) * 2.0, size=L).astype(np.float64)
        coords = synthetic_helix_backbone(L)[:, 1].astype(np.float64)
        seq_idx = rs.randint(0, 20, L)
        seq = "".join(AA[i] for i in seq_idx)

        wt_oh = np.zeros((L, 20), np.float32)
        wt_oh[np.arange(L), seq_idx] = 1.0
        ref_kernel = kk.Kermut(
            conditional_probs=torch.tensor(probs, dtype=torch.float32),
            wt_sequence=torch.tensor(wt_oh.reshape(-1)),
            coords=torch.tensor(coords, dtype=torch.float32),
        ).eval()
        data = kermut.KermutData.build(probs, coords)
        return torch, kk, ref_kernel, data, seq, seq_idx, wt_oh, rs

    def _onehots(self, muts, seq_idx, wt_oh):
        rows = []
        for m in muts:
            oh = wt_oh.copy()
            for t in m.split(":"):
                p = int(t[1:-1]) - 1
                oh[p] = 0.0
                oh[p, AA.index(t[-1])] = 1.0
            rows.append(oh.reshape(-1))
        return np.stack(rows)

    def test_gram_matches_vendored(self):
        torch, kk, ref_kernel, data, seq, seq_idx, wt_oh, rs = self._setup()
        muts1, muts2 = [], []
        for p in range(0, 12, 2):
            mt = AA[(seq_idx[p] + 3) % 20]
            muts1.append(f"{seq[p]}{p + 1}{mt}")
        # multi-mutants in the second batch
        for p in range(1, 9, 3):
            mt = AA[(seq_idx[p] + 5) % 20]
            mt2 = AA[(seq_idx[p + 1] + 7) % 20]
            muts2.append(f"{seq[p]}{p + 1}{mt}:{seq[p + 1]}{p + 2}{mt2}")
        x1 = self._onehots(muts1, seq_idx, wt_oh)
        x2 = self._onehots(muts2, seq_idx, wt_oh)
        with torch.no_grad():
            want_11 = ref_kernel.forward(
                torch.tensor(x1), torch.tensor(x1)).numpy()
            want_12 = ref_kernel.forward(
                torch.tensor(x1), torch.tensor(x2)).numpy()
        hypers = kermut.init_hypers()
        a = kermut.encode_variants(muts1)
        b = kermut.encode_variants(muts2)
        got_11 = np.asarray(kermut.mutation_kernel(hypers, data, a, a))
        got_12 = np.asarray(kermut.mutation_kernel(hypers, data, a, b))
        np.testing.assert_allclose(got_11, want_11, atol=1e-5)
        np.testing.assert_allclose(got_12, want_12, atol=1e-5)

    def test_gram_matches_vendored_nondefault_hypers(self):
        torch, kk, ref_kernel, data, seq, seq_idx, wt_oh, rs = self._setup(1)
        # overwrite raw hyperparameters on both sides
        raw = {"h_scale": 0.3, "h_lengthscale": 1.7, "d_lengthscale": 0.4,
               "p_lengthscale": 2.1}
        with torch.no_grad():
            ref_kernel._h_scale.copy_(torch.tensor(raw["h_scale"]))
            ref_kernel._h_lengthscale.copy_(
                torch.tensor(raw["h_lengthscale"]))
            ref_kernel._d_lengthscale.copy_(
                torch.tensor(raw["d_lengthscale"]))
            ref_kernel._p_lengthscale.copy_(
                torch.tensor(raw["p_lengthscale"]))
        hypers = kermut.init_hypers()
        for k, v in raw.items():
            hypers[k] = jnp.asarray(v)
        muts = [f"{seq[p]}{p + 1}{AA[(seq_idx[p] + 11) % 20]}"
                for p in range(10)]
        x = self._onehots(muts, seq_idx, wt_oh)
        with torch.no_grad():
            want = ref_kernel.forward(torch.tensor(x),
                                      torch.tensor(x)).numpy()
        a = kermut.encode_variants(muts)
        got = np.asarray(kermut.mutation_kernel(hypers, data, a, a))
        np.testing.assert_allclose(got, want, atol=1e-5)
