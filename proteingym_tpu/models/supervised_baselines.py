"""Native supervised baselines: one-hot / embedding ridge + CV folds.

The reference's supervised leaderboard consumes score files produced by
the external ProteinNPT repo (ref: performance_DMS_supervised_benchmarks
.py:10-13, README.md:173 — OHE ridge, embedding ridge, ProteinNPT);
Kermut is vendored (models/kermut.py here). This module makes the
supervised product self-contained: it trains the ridge baselines natively
and emits per-assay prediction files in the exact layout
``scores_root/<cv_scheme>/<location>/<DMS_id>.csv`` that
merge/supervised.py consumes.

CV schemes follow the published fold definitions when fold columns are
present in the assay CSV (fold_random_5 / fold_modulo_5 /
fold_contiguous_5, ref merge_supervised.py:40-43); otherwise they are
generated with the standard constructions:
  - fold_random_5: uniform random assignment (seeded)
  - fold_modulo_5: mutated position modulo 5
  - fold_contiguous_5: contiguous position blocks

Ridge solves (X^T X + lam I) w = X^T y in one jitted Cholesky per fold —
MXU-shaped normal equations, no iterative solver.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

AA20 = "ACDEFGHIKLMNPQRSTVWY"
CV_SCHEMES = ["fold_random_5", "fold_modulo_5", "fold_contiguous_5"]


def onehot_features(mutated_sequences: Sequence[str], seq_len: int
                    ) -> np.ndarray:
    """(N, L*20) flattened one-hots (the ProteinNPT OHE baseline input)."""
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros((len(mutated_sequences), seq_len, 20), np.float32)
    for i, s in enumerate(mutated_sequences):
        for j, c in enumerate(s[:seq_len]):
            k = aa_idx.get(c)
            if k is not None:
                out[i, j, k] = 1.0
    return out.reshape(len(mutated_sequences), -1)


def assign_folds(
    mutants: Sequence[str],
    scheme: str,
    n_folds: int = 5,
    seed: int = 42,
    seq_len: Optional[int] = None,
) -> np.ndarray:
    """Fold ids per variant for the three published CV constructions."""
    n = len(mutants)
    if scheme == "fold_random_5":
        rs = np.random.RandomState(seed)
        return rs.randint(0, n_folds, n)

    def first_pos(m):
        try:
            return int(m.split(":")[0][1:-1])
        except (ValueError, IndexError):
            return 0

    positions = np.asarray([first_pos(m) for m in mutants])
    if scheme == "fold_modulo_5":
        return positions % n_folds
    if scheme == "fold_contiguous_5":
        lo, hi = positions.min(), positions.max() + 1
        edges = np.linspace(lo, hi, n_folds + 1)
        return np.clip(np.searchsorted(edges, positions, "right") - 1, 0,
                       n_folds - 1)
    raise ValueError(f"Unknown CV scheme {scheme}")


@jax.jit
def _ridge_solve(x, y, lam):
    d = x.shape[1]
    gram = x.T @ x + lam * jnp.eye(d, dtype=x.dtype)
    rhs = x.T @ y
    chol = jnp.linalg.cholesky(gram)
    return jax.scipy.linalg.cho_solve((chol, True), rhs)


def ridge_cv_predict(
    features: np.ndarray,
    y: np.ndarray,
    folds: np.ndarray,
    lam: float = 1.0,
) -> np.ndarray:
    """Out-of-fold predictions: for each fold, train on the rest, predict
    the held-out variants (the supervised benchmark's protocol)."""
    x = jnp.asarray(features, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    y_mean = float(np.mean(y))
    out = np.zeros(len(y))
    for fold in np.unique(folds):
        test = folds == fold
        train = ~test
        w = _ridge_solve(x[np.nonzero(train)[0]],
                         yj[np.nonzero(train)[0]] - y_mean, lam)
        out[test] = np.asarray(x[np.nonzero(test)[0]] @ w) + y_mean
    return out


def esm_embedding_features(
    esm_params, esm_config, mutated_sequences: Sequence[str],
    batch_size: int = 16,
) -> np.ndarray:
    """Mean-pooled final-layer ESM embeddings (the 'embeddings ridge'
    baseline input; also Kermut's global-kernel features)."""
    from proteingym_tpu.models import esm2

    rows = [esm2.ALPHABET.tokenize(s) for s in mutated_sequences]
    T = max(len(r) for r in rows)
    feats = []

    @jax.jit
    def embed(tokens):
        _, reps = esm2.apply(
            esm_params, esm_config, tokens, return_representations=True
        )
        final = reps[max(reps)].astype(jnp.float32)
        mask = (tokens != esm2.ALPHABET.padding_idx)[..., None]
        return (final * mask).sum(1) / jnp.maximum(mask.sum(1), 1)

    for s in range(0, len(rows), batch_size):
        blk = rows[s : s + batch_size]
        toks = np.full((len(blk), T), esm2.ALPHABET.padding_idx, np.int32)
        for bi, r in enumerate(blk):
            toks[bi, : len(r)] = r
        feats.append(np.asarray(embed(jnp.asarray(toks))))
    return np.concatenate(feats, 0)


def load_aug_scores(
    frame: pd.DataFrame, scores_csv, col: Optional[str] = None
) -> np.ndarray:
    """Join a zero-shot score file onto the assay frame by mutant.

    ``col`` defaults to the last non-key column. Raises when nothing
    matches (wrong file / mutant naming); partial misses are left as NaN —
    run_supervised_baseline mean-fills them with a warning. The single
    implementation behind both the scorer's ``aug_file=`` extra and the
    CLI's ``--aug-scores-dir``."""
    scores = pd.read_csv(scores_csv)
    if col is None:
        keys = {"mutant", "mutated_sequence", "DMS_score"}
        col = [c for c in scores.columns if c not in keys][-1]
    joined = frame[["mutant"]].merge(
        scores[["mutant", col]].groupby("mutant", as_index=False).mean(),
        on="mutant", how="left",
    )
    aux = joined[col].to_numpy(np.float64)
    if np.isnan(aux).all():
        raise ValueError(
            f"aug scores {scores_csv!r}: no mutants matched the assay "
            f"(column {col!r}) — check the file and its mutant naming"
        )
    return aux


def make_embedding_feature_fn(checkpoint, batch_size: int = 16):
    """Resolve an ESM trunk (preset or converted dir) and return the
    mean-pooled embedding feature function for embeddings_ridge."""
    from proteingym_tpu.models import esm2
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    config, params = resolve_zoo_checkpoint(
        checkpoint, esm2.PRESETS, "esm2_t6_8M", esm2.init_params,
        esm2.EsmConfig,
    )
    return lambda seqs: esm_embedding_features(
        params, config, seqs, batch_size=batch_size
    )


def run_supervised_baseline(
    dms_frame: pd.DataFrame,
    target_seq: str,
    model: str = "OHE_ridge",
    cv_schemes: Sequence[str] = tuple(CV_SCHEMES),
    lam: float = 1.0,
    seed: int = 42,
    feature_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    aux: Optional[np.ndarray] = None,
    npt_config=None,
) -> Dict[str, pd.DataFrame]:
    """Train + out-of-fold predict one assay for every CV scheme.

    ``aux`` is a per-variant zero-shot score vector: the 'Augmented'
    supervised recipes (ProteinNPT-repo baselines, SURVEY.md §2.2
    supervised note) append the standardized zero-shot prediction as one
    extra ridge feature (label-free, so no CV leakage); ProteinNPT
    consumes it as its auxiliary input token.

    Returns {cv_scheme: frame with mutant, y_pred, DMS_score} matching the
    supervised score-file contract.
    """
    mutants = dms_frame["mutant"].tolist()
    seqs = dms_frame.get("mutated_sequence", dms_frame["mutant"]).tolist()
    y = dms_frame["DMS_score"].to_numpy(np.float64)
    npt = model.lower() in ("proteinnpt", "protein_npt")
    if aux is None and npt:
        for col in ("zero_shot_score", "Tranception_score"):
            if col in dms_frame.columns:
                aux = dms_frame[col].to_numpy(np.float64)
                break
    if aux is not None:
        aux = np.asarray(aux, np.float64)
        n_missing = int(np.isnan(aux).sum())
        if n_missing == len(aux):
            raise ValueError(
                "aux zero-shot scores are all-NaN — nothing to augment with"
            )
        if n_missing:
            # our own zero-shot scorers emit NaN for unmappable mutants;
            # fill with the mean so one NaN can't poison the whole column
            import warnings

            warnings.warn(
                f"aux scores: {n_missing}/{len(aux)} NaN; filling with the "
                "mean zero-shot score"
            )
            aux = np.where(np.isnan(aux), np.nanmean(aux), aux)
        aux = (aux - aux.mean()) / (aux.std() + 1e-8)
    if npt:
        from proteingym_tpu.models.protein_npt import residue_features

        features = residue_features(seqs, len(target_seq))
    elif feature_fn is not None:
        features = feature_fn(seqs)
    elif model == "OHE_ridge":
        features = onehot_features(seqs, len(target_seq))
    else:
        raise ValueError(f"Unknown baseline {model} without feature_fn")
    if aux is not None and not npt:
        features = np.concatenate(
            [np.asarray(features, np.float32),
             aux[:, None].astype(np.float32)], axis=1
        )

    out = {}
    for scheme in cv_schemes:
        if scheme in dms_frame.columns:  # published fold assignments
            folds = dms_frame[scheme].to_numpy()
        else:
            folds = assign_folds(mutants, scheme, seed=seed)
        if npt:
            from proteingym_tpu.models.protein_npt import npt_cv_predict

            preds = npt_cv_predict(
                features, y, folds, c=npt_config, aux=aux, seed=seed
            )
        else:
            preds = ridge_cv_predict(features, y, folds, lam=lam)
        out[scheme] = pd.DataFrame(
            {"mutant": mutants, "y_pred": preds, "DMS_score": y}
        )
    return out
