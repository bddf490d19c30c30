"""Native supervised ridge baselines + CV fold constructions."""

import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")

from proteingym_tpu.models import supervised_baselines as sb

AA = "ACDEFGHIKLMNPQRSTVWY"


def _assay(rs, L=30):
    target = "".join(AA[i] for i in rs.randint(0, 20, L))
    muts, seqs = [], []
    for p in range(L):
        for m in AA[:5]:
            if m != target[p]:
                muts.append(f"{target[p]}{p + 1}{m}")
                seqs.append(target[:p] + m + target[p + 1 :])
    # ground truth: additive position + residue effects — the residue
    # component generalizes across folds (each AA recurs at many positions),
    # which is what makes OHE ridge non-trivially predictive
    pos_eff = rs.randn(L) * 0.3
    aa_eff = rs.randn(20)
    aa_idx = {a: i for i, a in enumerate(AA)}
    y = np.array(
        [
            sum(pos_eff[j] + aa_eff[aa_idx[c]] for j, c in enumerate(s))
            for s in seqs
        ]
    ) + rs.normal(0, 0.1, len(seqs))
    frame = pd.DataFrame(
        {"mutant": muts, "mutated_sequence": seqs, "DMS_score": y}
    )
    return target, frame


class TestFolds:
    def test_modulo_and_contiguous(self):
        muts = [f"A{p}G" for p in range(1, 101)]
        mod = sb.assign_folds(muts, "fold_modulo_5")
        assert (mod == (np.arange(1, 101) % 5)).all()
        cont = sb.assign_folds(muts, "fold_contiguous_5")
        assert (np.diff(cont) >= 0).all()  # contiguous blocks
        assert len(np.unique(cont)) == 5

    def test_random_seeded(self):
        muts = [f"A{p}G" for p in range(1, 51)]
        a = sb.assign_folds(muts, "fold_random_5", seed=1)
        b = sb.assign_folds(muts, "fold_random_5", seed=1)
        c = sb.assign_folds(muts, "fold_random_5", seed=2)
        assert (a == b).all() and not (a == c).all()


class TestRidge:
    def test_recovers_linear_signal_out_of_fold(self):
        rs = np.random.RandomState(0)
        target, frame = _assay(rs)
        results = sb.run_supervised_baseline(frame, target, lam=1.0)
        from scipy.stats import spearmanr

        rhos = {}
        for scheme in sb.CV_SCHEMES:
            pred = results[scheme]
            assert len(pred) == len(frame)
            assert np.isfinite(pred["y_pred"]).all()
            rhos[scheme] = spearmanr(
                pred["y_pred"], pred["DMS_score"]
            ).statistic
        # random folds interpolate (strong); modulo/contiguous are
        # position-extrapolation splits where OHE ridge degrades by design
        # (published OHE numbers show the same gap)
        assert rhos["fold_random_5"] > 0.5
        assert rhos["fold_random_5"] > rhos["fold_modulo_5"]
        assert rhos["fold_random_5"] > rhos["fold_contiguous_5"]

    def test_published_fold_columns_take_precedence(self):
        rs = np.random.RandomState(1)
        target, frame = _assay(rs)
        frame["fold_random_5"] = np.arange(len(frame)) % 5
        results = sb.run_supervised_baseline(
            frame, target, cv_schemes=["fold_random_5"]
        )
        # deterministic given the explicit folds
        results2 = sb.run_supervised_baseline(
            frame, target, cv_schemes=["fold_random_5"], seed=999
        )
        np.testing.assert_allclose(
            results["fold_random_5"]["y_pred"],
            results2["fold_random_5"]["y_pred"],
        )

    def test_embedding_features_shape(self):
        import jax.numpy as jnp

        from proteingym_tpu.models import esm2

        cfg = esm2.EsmConfig("tiny", 2, 64, 4, dtype=jnp.float32)
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        feats = sb.esm_embedding_features(
            params, cfg, ["ACDEFG", "ACDEFW", "ACDEFGHIKL"], batch_size=2
        )
        assert feats.shape == (3, 64)
        assert np.isfinite(feats).all()


class TestProteinNpt:
    """Native ProteinNPT (the reference's 11th supervised model): axial
    row/column attention over labeled-variant batches with masked-target
    regression."""

    def _toy_assay(self, n=120, L=18, seed=0):
        import pandas as pd

        rng = np.random.RandomState(seed)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        target = "".join(AA[i] for i in rng.randint(0, 20, L))
        # restrict mutations to a 6-position x 5-AA grid so each cell
        # recurs across folds — out-of-fold prediction then requires
        # reading labels of matching context variants (the NPT mechanism)
        positions = list(range(6))
        alts = "GHKLM"
        weights = rng.randn(L, 20)
        muts, seqs, ys = [], [], []
        for _ in range(n):
            p = positions[rng.randint(len(positions))]
            m = alts[rng.randint(len(alts))]
            if m == target[p]:
                m = "W"
            muts.append(f"{target[p]}{p + 1}{m}")
            seqs.append(target[:p] + m + target[p + 1:])
            ys.append(weights[p, AA.index(m)] + rng.randn() * 0.05)
        return pd.DataFrame(
            {"mutant": muts, "mutated_sequence": seqs, "DMS_score": ys}
        ), target

    def test_learns_planted_signal(self):
        from scipy.stats import spearmanr

        from proteingym_tpu.models.protein_npt import (
            ProteinNptConfig, npt_cv_predict, residue_features,
        )

        frame, target = self._toy_assay()
        feats = residue_features(
            frame["mutated_sequence"].tolist(), len(target)
        )
        y = frame["DMS_score"].to_numpy()
        rng = np.random.RandomState(0)
        folds = rng.randint(0, 2, len(y))  # 2 folds keep the test fast
        c = ProteinNptConfig(embed_dim=32, num_layers=2, steps=500,
                             context_size=48, train_batch=48,
                             learning_rate=3e-3)
        preds = npt_cv_predict(feats, y, folds, c=c, seed=0)
        rho = spearmanr(preds, y).correlation
        assert np.isfinite(preds).all()
        assert rho > 0.3, rho

    def test_harness_integration(self):
        from proteingym_tpu.models.supervised_baselines import (
            run_supervised_baseline,
        )

        frame, target = self._toy_assay(n=60, L=12)
        results = run_supervised_baseline(
            frame.head(60), target, model="ProteinNPT",
            cv_schemes=("fold_random_5",),
        )
        out = results["fold_random_5"]
        assert {"mutant", "y_pred", "DMS_score"} <= set(out.columns)
        assert np.isfinite(out["y_pred"]).all()


class TestAugmentedRidge:
    """The 'Augmented' supervised recipes append a standardized zero-shot
    score as an extra ridge feature (ProteinNPT-repo baselines)."""

    def _uncorrelated_assay(self, rs, L=20):
        """DMS_score carried ENTIRELY by the aux column: every (pos, AA)
        one-hot cell is unique, so plain OHE ridge cannot generalize
        out-of-fold while the augmented variant can."""
        target = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts, seqs = [], []
        for p in range(L):
            m = AA[(AA.index(target[p]) + 1 + (p % 3)) % 20]
            muts.append(f"{target[p]}{p + 1}{m}")
            seqs.append(target[:p] + m + target[p + 1:])
        y = rs.randn(len(muts))
        frame = pd.DataFrame(
            {"mutant": muts, "mutated_sequence": seqs, "DMS_score": y}
        )
        return target, frame

    def test_aux_feature_rescues_unlearnable_ohe(self):
        from scipy.stats import spearmanr

        rs = np.random.RandomState(0)
        target, frame = self._uncorrelated_assay(rs)
        aux = frame["DMS_score"].to_numpy() + rs.normal(
            0, 0.05, len(frame)
        )
        plain = sb.run_supervised_baseline(
            frame, target, cv_schemes=("fold_random_5",)
        )["fold_random_5"]
        augd = sb.run_supervised_baseline(
            frame, target, cv_schemes=("fold_random_5",), aux=aux
        )["fold_random_5"]
        rho_plain = spearmanr(plain["y_pred"], frame["DMS_score"]).correlation
        rho_aug = spearmanr(augd["y_pred"], frame["DMS_score"]).correlation
        assert rho_aug > 0.8, rho_aug
        assert rho_aug > rho_plain + 0.3, (rho_aug, rho_plain)

    def test_embeddings_ridge_runs_with_feature_fn(self):
        """The Embeddings - Augmented recipe; also the indels supervised
        models (mean-pooled embeddings need no fixed length)."""
        from proteingym_tpu.models import esm2

        rs = np.random.RandomState(1)
        target, frame = self._uncorrelated_assay(rs, L=12)
        # add an INDEL row: embeddings features accept ragged sequences
        frame = pd.concat(
            [frame, pd.DataFrame([{
                "mutant": "del", "mutated_sequence": target[:-2],
                "DMS_score": 0.0,
            }])], ignore_index=True,
        )
        config = esm2.PRESETS["esm2_tiny"]
        params = esm2.init_params(jax.random.PRNGKey(0), config)
        feats = sb.esm_embedding_features(
            params, config, frame["mutated_sequence"].tolist()
        )
        assert feats.shape == (len(frame), config.embed_dim)
        out = sb.run_supervised_baseline(
            frame, target, model="embeddings_ridge",
            cv_schemes=("fold_random_5",),
            feature_fn=lambda seqs: sb.esm_embedding_features(
                params, config, seqs
            ),
            aux=frame["DMS_score"].to_numpy(),
        )["fold_random_5"]
        assert np.isfinite(out["y_pred"]).all()
