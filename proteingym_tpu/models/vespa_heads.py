"""VESPA prediction heads: ProtT5 conservation CNN + logistic SAV blend.

The reference's vespa baseline shells out to the ``vespa`` pip CLI
(ref: proteingym/baselines/vespa/compute_fitness.py:70-90), which is not
installed offline. The trunk (ProtT5) is weight-compatible in
``models/prot_t5.py``; this module adds the two small heads the CLI runs
on top of it, per Marquet et al. 2022 ("Embeddings from protein language
models predict conservation and variant effects", Hum Genet 141)
and the Rostlab/VESPA package layout:

  - **ConsCNN** — 9-class ConSurf-scale conservation prediction from
    per-residue ProtT5 embeddings. Two Conv layers over the length axis
    (1024 -> 32, k=7, ReLU, dropout, 32 -> 9, k=7) — the standard
    Rostlab prediction-head shape (same as the ProtT5 secondary-structure
    CNN). The converter ingests the package's ``prott5cons`` torch
    checkpoint (Conv2d kernels (out, in, 7, 1)) and is parity-tested
    against torch.nn.functional.conv2d.
  - **SAV blend** — VESPA's per-variant logistic regression over
    [BLOSUM62(wt, mt), conservation class probabilities (9),
    ProtT5 masked-reconstruction log-odds of mt]; VESPAl (the
    "light" variant) omits the log-odds feature. The trained
    coefficients live inside the vespa package; the converter accepts
    them as a JSON/npz sidecar, and ``DEFAULT_BLEND`` is a documented
    [reconstruction] fallback (equal-weight standardized features,
    signs from the paper: conservation and |blosum penalty| increase
    effect probability, log-odds of the mutant decreases it).

Output convention: ``vespa_table`` returns HIGHER = MORE DAMAGING
(VESPA's published 0-1 effect probability). ``score_mutants`` then
applies ProteinGym's own ingestion transform (ref
baselines/vespa/compute_fitness.py:90-108): sum of log(1 - p) over
non-synonymous singles — already HIGHER = FITTER, so scorers use it
directly without negation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

AA20 = "ACDEFGHIKLMNPQRSTVWY"

# 20x20 BLOSUM62 block in AA20 order (sliced from the canonical NCBI
# matrix that models/provean.py carries in BLOSUM_ALPHABET order)
def _blosum20() -> np.ndarray:
    from proteingym_tpu.models.provean import BLOSUM62, BLOSUM_ALPHABET

    idx = [BLOSUM_ALPHABET.index(a) for a in AA20]
    return BLOSUM62[np.ix_(idx, idx)].astype(np.float32)


# ---------------------------------------------------------------------------
# ConsCNN
# ---------------------------------------------------------------------------

N_CLASSES = 9  # ConSurf conservation scale 1..9 (class 0 = most variable)


def init_conscnn(rng: jax.Array, d_model: int = 1024, hidden: int = 32,
                 kernel: int = 7) -> Dict:
    k1, k2 = jax.random.split(rng)
    s1 = (2.0 / (d_model * kernel)) ** 0.5
    s2 = (2.0 / (hidden * kernel)) ** 0.5
    return {
        "conv1": {"w": jax.random.normal(k1, (kernel, d_model, hidden)) * s1,
                  "b": jnp.zeros((hidden,))},
        "conv2": {"w": jax.random.normal(k2, (kernel, hidden, N_CLASSES)) * s2,
                  "b": jnp.zeros((N_CLASSES,))},
    }


def conscnn_apply(params: Dict, emb: jnp.ndarray) -> jnp.ndarray:
    """(L, d_model) per-residue embeddings -> (L, 9) conservation logits.

    SAME padding over the length axis, matching the torch head's
    Conv2d(padding=(kernel//2, 0)) on a (B, C, L, 1) layout."""
    x = emb[None].astype(jnp.float32)  # (1, L, C) NWC
    for layer in ("conv1", "conv2"):
        w = params[layer]["w"].astype(jnp.float32)  # (K, Cin, Cout) WIO
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + params[layer]["b"]
        if layer == "conv1":
            x = jax.nn.relu(x)
    return x[0]


def conservation_probs(params: Dict, emb: jnp.ndarray) -> jnp.ndarray:
    """(L, 9) class probabilities."""
    return jax.nn.softmax(conscnn_apply(params, emb), axis=-1)


def convert_conscnn_state_dict(state_dict) -> Dict:
    """Torch ``prott5cons`` checkpoint -> params pytree.

    Self-describing: the two Conv2d layers are found by scanning for
    4-dim weights and ordered by their integer layer index (the package
    wraps them in an nn.Sequential with ReLU/Dropout between, so the
    indices are typically 0 and 3). Torch Conv2d weight (Cout, Cin, K, 1)
    -> our WIO (K, Cin, Cout)."""
    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    convs = []
    for key, val in state_dict.items():
        if key.endswith(".weight") and arr(val).ndim == 4:
            digits = [int(tok) for tok in key.split(".") if tok.isdigit()]
            convs.append((digits[-1] if digits else len(convs), key))
    if len(convs) != 2:
        raise ValueError(
            f"expected 2 Conv2d layers in a ConsCNN state dict, found "
            f"{len(convs)}: {sorted(k for _, k in convs)}"
        )
    convs.sort()
    params = {}
    for name, (_, wkey) in zip(("conv1", "conv2"), convs):
        w = arr(state_dict[wkey])  # (Cout, Cin, K, 1)
        if w.shape[-1] != 1:
            raise ValueError(f"{wkey}: expected trailing kernel dim 1, "
                             f"got {w.shape}")
        b = arr(state_dict[wkey[: -len("weight")] + "bias"])
        params[name] = {
            "w": jnp.asarray(w[..., 0].transpose(2, 1, 0)),  # (K, Cin, Cout)
            "b": jnp.asarray(b),
        }
    if params["conv2"]["w"].shape[-1] != N_CLASSES:
        raise ValueError(
            f"final layer has {params['conv2']['w'].shape[-1]} outputs, "
            f"expected {N_CLASSES} conservation classes"
        )
    return params


# ---------------------------------------------------------------------------
# SAV logistic blend
# ---------------------------------------------------------------------------

# feature vector per SAV: [blosum62(wt, mt), cons_probs(pos, 0..8),
# logodds(pos, mt) - logodds(pos, wt)] -> 11 features (VESPAl drops the
# last). DEFAULT_BLEND is a [reconstruction]: trained coefficients are
# inside the uninstalled vespa package; these carry the paper's signs
# with features standardized to comparable scale.
N_FEATURES = 11
DEFAULT_BLEND = {
    # blosum in [-4, 11]: favourable substitutions lower effect prob
    "w": np.concatenate([
        np.array([-0.25], np.float32),
        # conservation classes 0 (variable) .. 8 (conserved): monotone
        # increasing contribution to effect probability
        np.linspace(-1.0, 1.0, N_CLASSES).astype(np.float32),
        # masked log-odds of mt vs wt: fitter mutants lower effect prob
        np.array([-0.5], np.float32),
    ]),
    "b": np.float32(0.0),
}


def sav_features(cons_probs: np.ndarray,
                 logodds_table: Optional[np.ndarray]) -> np.ndarray:
    """(L, 20, 11) feature tensor for every possible SAV.

    ``logodds_table`` is (L, 20) masked-reconstruction log-probs in AA20
    order (prot_t5.masked_logodds sliced to AA columns); None (VESPAl)
    zeroes the log-odds feature so VESPAl blends see only the first 10.
    The log-odds difference term (mt minus wt) is completed by the caller
    via ``vespa_table``, which knows the wild-type sequence."""
    L = cons_probs.shape[0]
    feats = np.zeros((L, 20, N_FEATURES), np.float32)
    feats[:, :, 1:1 + N_CLASSES] = cons_probs[:, None, :]
    if logodds_table is not None:
        feats[:, :, -1] = logodds_table
    # the blosum feature (column 0) is wt-dependent; vespa_table fills it
    return feats


def vespa_table(wt_seq: str, cons_probs: np.ndarray,
                logodds_table: Optional[np.ndarray] = None,
                blend: Optional[Dict] = None) -> np.ndarray:
    """(L, 20) effect probabilities (higher = more damaging) for every
    SAV of ``wt_seq``; wild-type cells are 0.

    ``logodds_table``: (L, 20) log P(aa | mask at pos) in AA20 order, or
    None for the VESPAl (no-log-odds) variant.

    Positions whose wild-type residue is outside AA20 (X/B/Z/U/...) have
    no BLOSUM row or log-odds reference; their table rows are NaN so that
    ``score_mutants`` fails loudly if a mutant ever touches one, instead
    of silently scoring them through the 'A' column.
    """
    L = len(wt_seq)
    if cons_probs.shape != (L, N_CLASSES):
        raise ValueError(f"cons_probs {cons_probs.shape} != ({L}, 9)")
    blend = blend or DEFAULT_BLEND
    w = np.asarray(blend["w"], np.float32)
    b = float(blend["b"])
    # VESPAl (no log-odds trunk pass) blends 10 features; full VESPA 11.
    # An 11-weight vector is accepted in VESPAl mode too (the log-odds
    # feature is zero there, so the extra coefficient is inert).
    n_active = N_FEATURES if logodds_table is not None else N_FEATURES - 1
    if w.shape not in ((N_FEATURES,), (n_active,)):
        raise ValueError(
            f"blend weights {w.shape} != ({N_FEATURES},)"
            + (f" or ({n_active},) in VESPAl/light mode"
               if logodds_table is None else "")
        )
    feats = sav_features(np.asarray(cons_probs, np.float32),
                         None if logodds_table is None else
                         np.asarray(logodds_table, np.float32))
    blos = _blosum20()
    aa_idx = {a: i for i, a in enumerate(AA20)}
    known = np.array([a in aa_idx for a in wt_seq])
    wt_rows = np.array([aa_idx.get(a, 0) for a in wt_seq])
    feats[:, :, 0] = blos[wt_rows]  # (L, 20): blosum62[wt, mt]
    if logodds_table is not None:
        # log-odds feature is mt-minus-wt at each position
        wt_lo = np.asarray(logodds_table, np.float32)[
            np.arange(L), wt_rows]
        feats[:, :, -1] -= wt_lo[:, None]
    logits = feats[:, :, :w.shape[0]] @ w + b
    table = 1.0 / (1.0 + np.exp(-logits))
    table[np.arange(L), wt_rows] = 0.0  # WT cells carry no effect
    table[~known] = np.nan  # non-AA20 wild-type rows are unscorable
    return table


def score_mutants(table: np.ndarray, wt_seq: str, mutants) -> np.ndarray:
    """Per-mutant fitness score from a vespa_table, matching ProteinGym's
    ingestion of the vespa CLI output exactly (ref
    baselines/vespa/compute_fitness.py:90-108): score = sum of
    log(1 - p_effect) over the mutant's NON-synonymous singles (the
    probability that a multi-mutant is benign is the product of each
    single being benign); synonymous singles (wt == mt) are skipped; a
    fully-synonymous mutant scores 0. HIGHER = FITTER — callers must NOT
    negate. p is clipped away from 1 so a saturated effect probability
    yields a large-negative score instead of -inf."""
    from proteingym_tpu.data.mutants import is_wt_row

    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants), np.float32)
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        total = 0.0
        for tok in str(m).split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - 1, tok[-1]
            if wt_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            if wt == mt:  # synonymous single: skipped by the reference
                continue
            if mt not in aa_idx:
                raise ValueError(
                    f"mutant amino acid {mt!r} in {tok} is outside the "
                    f"20 standard residues; VESPA cannot score it"
                )
            p = table[pos, aa_idx[mt]]
            if not np.isfinite(p):
                raise ValueError(
                    f"position {pos + 1} has non-AA20 wild type "
                    f"{wt_seq[pos]!r}; VESPA cannot score {tok}"
                )
            total += float(np.log1p(-min(float(p), 1.0 - 1e-7)))
        out[i] = total
    return out
