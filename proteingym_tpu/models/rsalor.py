"""RSALOR-class predictor: relative solvent accessibility x MSA log-odds.

The reference wraps the ``rsalor`` pip package (C++ core for weights;
ref: proteingym/baselines/RSALOR/run_rsalor.py:1-116). The method
(Tsishyn et al.) combines two signals per substitution (wt -> mt at i):

  LOR_i = log( f_i(mt) / f_i(wt) )   weighted MSA frequencies w/ pseudocounts
  RSA_i = relative solvent accessibility of position i

into an RSA-modulated log-odds: buried positions (low RSA) carry a larger
effective weight because core substitutions are more disruptive. Here:

  score = (1 + gamma * (1 - RSA_i)) * LOR_i          (gamma ~ 1)

RSA comes from a structure when given (fast neighbor-density burial proxy:
Ca count within 10 A, normalized) or defaults to 0.5 without one. The MSA
weights reuse the cluster-weight kernel (native C++/JAX)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from proteingym_tpu.data.mutants import is_wt_row

AA20 = "ACDEFGHIKLMNPQRSTVWY"


def rsa_from_structure(coords: np.ndarray, radius: float = 10.0,
                       max_neighbors: int = 24) -> np.ndarray:
    """Burial-based RSA proxy in [0, 1]: 1 - neighbor_density."""
    ca = coords[:, 1]
    d = np.linalg.norm(ca[:, None] - ca[None], axis=-1)
    counts = (d < radius).sum(1) - 1
    return np.clip(1.0 - counts / max_neighbors, 0.0, 1.0)


@dataclasses.dataclass
class RsalorModel:
    log_freq: np.ndarray  # (L, 20)
    rsa: np.ndarray  # (L,)
    gamma: float = 1.0
    alphabet: str = AA20


def fit_rsalor(
    matrix: np.ndarray,
    weights: Optional[np.ndarray] = None,
    coords: Optional[np.ndarray] = None,
    pseudocount: float = 0.5,
    gamma: float = 1.0,
) -> RsalorModel:
    n, L = matrix.shape
    if weights is None:
        weights = np.ones(n)
    onehot = np.zeros((n, L, 20))
    aa = matrix.astype(np.int64) - 1
    r, c = np.nonzero(aa >= 0)
    onehot[r, c, aa[r, c]] = 1.0
    counts = np.einsum("n,nlq->lq", weights, onehot) + pseudocount
    freq = counts / counts.sum(1, keepdims=True)
    rsa = (
        rsa_from_structure(coords)
        if coords is not None
        else np.full(L, 0.5)
    )
    return RsalorModel(log_freq=np.log(freq), rsa=rsa, gamma=gamma)


def score_mutants(
    model: RsalorModel,
    wt_focus_seq: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    aa_idx = {a: i for i, a in enumerate(model.alphabet)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if wt_focus_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            lor = (
                model.log_freq[pos, aa_idx[mt]]
                - model.log_freq[pos, aa_idx[wt]]
            )
            out[i] += (1.0 + model.gamma * (1.0 - model.rsa[pos])) * lor
    return out
