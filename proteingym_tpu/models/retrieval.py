"""Inference-time retrieval: MSA pseudocount priors, EVE VAE priors, and
log-prob fusion for Tranception / TranceptEVE scoring.

Behavioral parity targets:
  - MSA prior: weighted pseudocounts with base rate 1e-5, Hamming<0.2
    filter vs the focus sequence
    (ref: tranception/tranception/utils/msa_utils.py:63-138).
  - Fusion: fused = (1-beta) * ((1-alpha) * AR + alpha * MSA) + beta * EVE
    on the AA vocabulary slice inside the (window x MSA) overlap; log-probs
    are mixed WITHOUT renormalization
    (ref: trancepteve/trancepteve/model_pytorch.py:1090-1120; the
    Tranception-only case is beta=0, ref tranception model_pytorch.py:806-830).
  - alpha/beta auto-set from processed MSA / EVE-MSA depth
    (ref: trancepteve/model_pytorch.py:722-763).
  - EVE prior: log-space average of ``num_samples`` Bayesian-decoder
    outputs of the WT-encoded latent, scattered into full-sequence
    coordinates with -inf at non-focus columns
    (ref: trancepteve/model_pytorch.py:975-1001).
  - Prior recalibration: iterative temperature matching of the prior's
    mean log-prob to the transformer's (ref :855-905).

TPU design: the reference fuses per sequence in a Python loop with dynamic
slices; here fusion is a single masked gather over (batch, time) position
indices, jit-safe for any mix of windows and flips in one batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -np.inf


# ---------------------------------------------------------------------------
# MSA pseudocount prior (Tranception retrieval)
# ---------------------------------------------------------------------------

def hamming_filter(
    sequences: Sequence[str],
    min_similarity: float = 0.2,
) -> List[int]:
    """Indices of sequences with Hamming similarity >= min_similarity to the
    first (focus) sequence (ref msa_utils.py:80-90: dot of one-hots over
    dot(ref, ref); gaps/invalid chars contribute 0)."""
    focus = sequences[0]
    denom = sum(1 for c in focus if c in _AA_SET)
    keep = []
    for i, seq in enumerate(sequences):
        matches = sum(
            1
            for a, b in zip(focus, seq)
            if a in _AA_SET and a == b
        )
        if denom and matches / denom >= min_similarity:
            keep.append(i)
    return keep


_AA_ORDER = "ACDEFGHIKLMNPQRSTVWY"
_AA_SET = set(_AA_ORDER)


def msa_prior(
    sequences: Sequence[str],
    weights: Optional[np.ndarray],
    msa_start: int,
    msa_end: int,
    full_len: int,
    n_special: int = 5,
    base_rate: float = 1e-5,
    filter_msa: bool = True,
) -> np.ndarray:
    """Weighted-pseudocount AA prior over a 25-token Tranception-style vocab.

    sequences: aligned rows (same length, focus columns only, focus first).
    Returns (full_len, n_special+20) probabilities; rows outside
    [msa_start, msa_end) are zero (the log prior is only consulted inside
    the overlap). msa_start/msa_end are 0-indexed full-sequence coords.
    """
    if weights is None:
        weights = np.ones(len(sequences))
    weights = np.asarray(weights, dtype=np.float64)
    if filter_msa:
        keep = hamming_filter(sequences)
        sequences = [sequences[i] for i in keep]
        weights = weights[keep]

    vocab_size = n_special + len(_AA_ORDER)
    L = len(sequences[0])
    if msa_end - msa_start != L:
        raise ValueError(
            f"MSA window [{msa_start},{msa_end}) does not match alignment "
            f"width {L}"
        )
    aa_idx = {a: n_special + i for i, a in enumerate(_AA_ORDER)}
    # one-hots: (N, L, V); non-AA chars (gaps etc.) are all-zero rows,
    # exactly as the reference's vocab-keyed one-hot.
    onehots = np.zeros((len(sequences), L, vocab_size), dtype=np.float64)
    for n, seq in enumerate(sequences):
        for j, c in enumerate(seq.upper()):
            k = aa_idx.get(c)
            if k is not None:
                onehots[n, j, k] = 1.0
    weighted = (onehots + base_rate) * weights[:, None, None]
    norm = weighted.sum(axis=-1).sum(axis=0)  # (L,)
    avg = weighted.sum(axis=0) / norm[:, None]

    prior = np.zeros((full_len, vocab_size), dtype=np.float64)
    prior[msa_start:msa_end, :] = avg
    return prior


def log_msa_prior(*args, **kwargs) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return np.log(msa_prior(*args, **kwargs))


# ---------------------------------------------------------------------------
# EVE ensemble prior (TranceptEVE)
# ---------------------------------------------------------------------------

def eve_log_prior(
    eve_params_list,
    eve_config,
    focus_seq: str,
    focus_cols: np.ndarray,
    msa_start: int,
    full_len: int,
    num_samples: int = 200_000,
    rng: Optional[jax.Array] = None,
    n_special: int = 5,
    sample_chunk: int = 512,
) -> np.ndarray:
    """Ensemble-averaged EVE log prior in full-sequence coordinates.

    For each VAE: encode the WT focus sequence, draw ``num_samples`` latents,
    average the decoder's log-softmax outputs in log space
    (ref trancepteve/model_pytorch.py:988-1001), then average over models.
    Non-focus columns and special-token columns are -inf
    (ref :996-999).

    Returns (full_len, n_special+20) float32.
    """
    from proteingym_tpu.models import eve as eve_mod

    if rng is None:
        rng = jax.random.PRNGKey(42)
    aa_idx = {a: i for i, a in enumerate(_AA_ORDER)}
    onehot = np.zeros((1, len(focus_seq), len(_AA_ORDER)), dtype=np.float32)
    for j, c in enumerate(focus_seq):
        k = aa_idx.get(c.upper())
        if k is not None:
            onehot[0, j, k] = 1.0
    x = jnp.asarray(onehot)

    @jax.jit
    def prior_one_model(params, key):
        mu, logvar = eve_mod.encode(params, eve_config, x)

        def chunk(carry, key):
            ks = jax.random.split(key, sample_chunk + 1)
            z = jax.vmap(
                lambda k: eve_mod._sample(k, mu, logvar)
            )(ks[1:])  # (chunk, 1, z)
            recon = jax.vmap(
                lambda zz, kk: eve_mod.decode(params, eve_config, zz, kk)
            )(z, jax.random.split(ks[0], sample_chunk))
            return carry + recon.sum(axis=0), None

        n_chunks = max(1, num_samples // sample_chunk)
        keys = jax.random.split(key, n_chunks)
        total, _ = jax.lax.scan(
            chunk, jnp.zeros((1, len(focus_seq), len(_AA_ORDER))), keys
        )
        return (total / (n_chunks * sample_chunk))[0]  # (L, 20)

    acc = 0.0
    for i, params in enumerate(eve_params_list):
        acc = acc + np.asarray(prior_one_model(params, jax.random.fold_in(rng, i)))
    recon_log = acc / len(eve_params_list)

    vocab_size = n_special + len(_AA_ORDER)
    prior = np.full((full_len, vocab_size), NEG_INF, dtype=np.float32)
    cols = msa_start + np.asarray(focus_cols)
    prior[cols, n_special:] = recon_log
    return prior


def update_msa_prior_indel(
    msa_log_prior: np.ndarray,
    msa_start: int,
    msa_end: int,
    reference_region: str,
    mutated_sequence: str,
):
    """Re-align an indel-mutated sequence to the MSA coordinate system and
    rebuild the prior rows (the Clustal Omega role,
    ref tranception/utils/msa_utils.py:141-192, via the native Gotoh
    aligner):
      - deletion (query gap at a reference column): drop the prior row
      - insertion (reference gap at a query column): insert an all-ZERO
        log-prior row (detected by the fusion kernel -> AR-only there)

    Returns (new_log_prior (full query frame), new_msa_start, new_msa_end).
    ``reference_region`` is the WT sequence over [msa_start, msa_end).
    """
    from proteingym_tpu import native

    codes = {c: i + 1 for i, c in enumerate(_AA_ORDER)}

    def enc(s):
        return np.asarray([codes.get(c.upper(), 0) for c in s], np.int8)

    region = msa_log_prior[msa_start:msa_end]
    query_part = mutated_sequence[msa_start:] if msa_start else mutated_sequence
    a = enc(reference_region)
    b = enc(query_part)
    _, a_cols, b_cols = native.affine_align(a, b)

    vocab = msa_log_prior.shape[1]
    col_to_ref = {int(c): i for i, c in enumerate(a_cols) if c >= 0}
    rows = []
    for qi, col in enumerate(b_cols):
        if col < 0:
            continue  # query residue consumed inside a reference gap run? no: b_cols always set
        if col in col_to_ref:
            rows.append(region[col_to_ref[col]])
        else:
            rows.append(np.zeros(vocab))  # insertion: AR-only row
    new_region = np.stack(rows) if rows else np.zeros((0, vocab))
    new_end = msa_start + len(new_region)
    out = np.zeros((msa_start + len(query_part), vocab))
    out[:msa_start] = msa_log_prior[:msa_start]
    out[msa_start:new_end] = new_region
    return out[: new_end], msa_start, new_end


# ---------------------------------------------------------------------------
# Depth-based aggregation weights (ref trancepteve/model_pytorch.py:722-763)
# ---------------------------------------------------------------------------

def msa_alpha(msa_depth: int, indel_mode: bool = False,
              retrieval_type: str = "TranceptEVE") -> float:
    if retrieval_type == "Tranception":
        return 0.6
    if indel_mode:
        return 0.0 if msa_depth < 10 else 0.5
    if msa_depth < 10:
        return 0.0
    if msa_depth < 10**2:
        return 0.1
    if msa_depth < 10**3:
        return 0.3
    if msa_depth < 10**5:
        return 0.4
    return 0.5


def eve_beta(eve_depth: int, indel_mode: bool = False,
             retrieval_type: str = "TranceptEVE") -> float:
    if retrieval_type == "Tranception":
        return 0.0
    if indel_mode:
        return 0.0 if eve_depth < 10 else 0.1
    if eve_depth < 10:
        return 0.0
    if eve_depth < 10**2:
        return 0.3
    if eve_depth < 10**3:
        return 0.6
    if eve_depth < 10**5:
        return 0.7
    return 0.8


# ---------------------------------------------------------------------------
# Prior recalibration (ref trancepteve/model_pytorch.py:870-905)
# ---------------------------------------------------------------------------

def recalibrate_log_prior(
    log_prior_slice: np.ndarray,
    target_mean: float,
    distance_stop_criterion: float = 0.001,
    max_steps: int = 1000,
) -> np.ndarray:
    """Iteratively temperature-scale a log-prob table so its mean matches
    ``target_mean`` (the transformer's mean WT log-prob)."""
    out = np.asarray(log_prior_slice, dtype=np.float64)
    loss = abs(out.mean() - target_mean)
    step = 0
    while loss > distance_stop_criterion:
        t = out.mean() / target_mean
        shifted = out / t
        out = shifted - _logsumexp_rows(shifted)
        loss = abs(out.mean() - target_mean)
        step += 1
        if step > max_steps:
            break
    return out


def _logsumexp_rows(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


# ---------------------------------------------------------------------------
# Fusion kernel (jit-safe, batched over mixed windows/flips)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Fusion:
    """A jit-friendly fusion: a STABLE function + a pytree of prior args.

    ``fn(args, shift_logps, targets, starts, ends, reverse)`` — the prior
    tables and mixture weights live in ``args`` and flow through jit as
    ARGUMENTS, so scoring 217 assays with 217 different MSA/EVE priors
    shares ONE compiled program per input shape (closing over the priors
    would recompile the transformer per assay).

    ``per_row=True`` marks an indel-mode fusion whose prior is a STACK of
    per-sequence realigned tables; the AR harness then threads a per-row
    table index into ``fn(args, ..., reverse, table_ids)``."""

    fn: Callable
    args: Dict[str, Any]
    per_row: bool = False

    def __call__(self, shift_logps, targets, starts, ends, reverse,
                 table_ids=None):
        if self.per_row:
            return self.fn(self.args, shift_logps, targets, starts, ends,
                           reverse, table_ids)
        return self.fn(self.args, shift_logps, targets, starts, ends, reverse)


def _fuse(args, shift_logps, targets, starts, ends, reverse):
    """Masked prior mixing over (batch, time) position indices.

    Position of shift index t in full-sequence coordinates is start+t
    (L->R) or end-1-t (R->L); fusion applies only where that position lies
    inside [msa_start, msa_end) and the target token is a real amino acid —
    which reproduces the reference's min/max_logits_slice arithmetic
    without a per-sequence loop.

    Non-focus columns (EVE prior rows of -inf) fall back to the MSA-only
    mixture, matching ref trancepteve/model_pytorch.py:1121-1131.
    """
    msa_lp = args["msa_lp"]
    eve_lp = args.get("eve_lp")
    alpha, beta = args["alpha"], args.get("beta", 0.0)
    msa_start, msa_end = args["msa_start"], args["msa_end"]
    n_special = args["n_special"]
    vocab = msa_lp.shape[-1]

    T = shift_logps.shape[1]
    t_idx = jnp.arange(T)[None, :]  # (1, T)
    if reverse:
        pos = ends[:, None] - 1 - t_idx
    else:
        pos = starts[:, None] + t_idx
    in_range = (pos >= msa_start) & (pos < msa_end)
    is_aa = targets >= n_special
    mask = (in_range & is_aa)[..., None]  # (B, T, 1)
    pos_c = jnp.clip(pos, 0, msa_lp.shape[0] - 1)
    msa_rows = msa_lp[pos_c]  # (B, T, V)

    aa_cols = (jnp.arange(vocab) >= n_special)[None, None, :]
    # indel realignment inserts all-zero log-prior rows for inserted
    # positions; those fall back to pure AR predictions
    # (ref tranception model_pytorch.py:834-838)
    live = jnp.any(msa_rows != 0.0, axis=-1, keepdims=True)
    mask = mask & live
    mixed = (1.0 - alpha) * shift_logps + alpha * msa_rows
    if eve_lp is not None:
        eve_rows = eve_lp[pos_c]
        finite = jnp.isfinite(eve_rows)
        beta_eff = jnp.where(finite, beta, 0.0)
        safe_eve = jnp.where(finite, eve_rows, 0.0)
        mixed = (1.0 - beta_eff) * mixed + beta_eff * safe_eve
    return jnp.where(mask & aa_cols, mixed, shift_logps)


def _fuse_per_row(args, shift_logps, targets, starts, ends, reverse,
                  table_ids):
    """Indel-mode fusion: each row fuses against ITS OWN realigned prior
    (the Clustal-role realignment, ref tranception msa_utils.py:141-192) —
    positions are mutant-frame, so a shared WT-frame table would misalign
    everything after the first indel."""
    msa_lp = args["msa_lp"]  # (n_tables, Lp, V)
    eve_lp = args.get("eve_lp")
    alpha, beta = args["alpha"], args.get("beta", 0.0)
    n_special = args["n_special"]
    vocab = msa_lp.shape[-1]

    T = shift_logps.shape[1]
    t_idx = jnp.arange(T)[None, :]
    if reverse:
        pos = ends[:, None] - 1 - t_idx
    else:
        pos = starts[:, None] + t_idx
    row_start = args["msa_start"][table_ids][:, None]
    row_end = args["msa_end"][table_ids][:, None]
    in_range = (pos >= row_start) & (pos < row_end)
    is_aa = targets >= n_special
    mask = (in_range & is_aa)[..., None]
    pos_c = jnp.clip(pos, 0, msa_lp.shape[1] - 1)
    tables = msa_lp[table_ids]  # (B, Lp, V)
    msa_rows = jnp.take_along_axis(tables, pos_c[..., None], axis=1)

    aa_cols = (jnp.arange(vocab) >= n_special)[None, None, :]
    live = jnp.any(msa_rows != 0.0, axis=-1, keepdims=True)
    mask = mask & live
    mixed = (1.0 - alpha) * shift_logps + alpha * msa_rows
    if eve_lp is not None:
        eve_rows = jnp.take_along_axis(
            eve_lp[table_ids], pos_c[..., None], axis=1
        )
        finite = jnp.isfinite(eve_rows)
        beta_eff = jnp.where(finite, beta, 0.0)
        safe_eve = jnp.where(finite, eve_rows, 0.0)
        mixed = (1.0 - beta_eff) * mixed + beta_eff * safe_eve
    return jnp.where(mask & aa_cols, mixed, shift_logps)


def make_indel_fusion(
    msa_log_prior: np.ndarray,
    msa_start: int,
    msa_end: int,
    alpha: float,
    target_seq: str,
    sequences: Sequence[str],
    eve_prior: Optional[np.ndarray] = None,
    beta: float = 0.0,
    n_special: int = 5,
):
    """Per-sequence realigned indel fusion.

    Realigns the WT-frame prior(s) to every unique mutated sequence via
    the native Gotoh aligner (deletions drop prior rows, insertions get
    AR-only rows), stacks them padded to a shared bucket, and returns
    (Fusion(per_row=True), {sequence: table_id}).
    """
    ref_region = target_seq[msa_start:msa_end]
    uniq = list(dict.fromkeys(list(sequences) + [target_seq]))
    msa_tabs, eve_tabs, starts_v, ends_v = [], [], [], []
    for seq in uniq:
        lp, s0, e0 = update_msa_prior_indel(
            msa_log_prior, msa_start, msa_end, ref_region, seq
        )
        msa_tabs.append(lp)
        starts_v.append(s0)
        ends_v.append(e0)
        if eve_prior is not None:
            ev, _, _ = update_msa_prior_indel(
                eve_prior, msa_start, msa_end, ref_region, seq
            )
            # inserted rows must be EVE-excluded (-inf -> beta masked),
            # not zero (zero is a valid log-prob row for EVE)
            ev = ev.copy()
            ev[~np.any(msa_tabs[-1] != 0.0, axis=-1)] = -np.inf
            eve_tabs.append(ev)
    L_pad = 64 * ((max(t.shape[0] for t in msa_tabs) + 63) // 64)
    vocab = msa_log_prior.shape[1]

    def stack(tabs, fill=0.0):
        out = np.full((len(tabs), L_pad, vocab), fill)
        for i, t in enumerate(tabs):
            out[i, : t.shape[0]] = t
        return out

    args = {
        "msa_lp": jnp.asarray(stack(msa_tabs), jnp.float32),
        "msa_start": jnp.asarray(starts_v, jnp.int32),
        "msa_end": jnp.asarray(ends_v, jnp.int32),
        "alpha": jnp.asarray(alpha, jnp.float32),
        "n_special": jnp.asarray(n_special, jnp.int32),
    }
    if eve_prior is not None:
        args["eve_lp"] = jnp.asarray(stack(eve_tabs, fill=-np.inf),
                                     jnp.float32)
        args["beta"] = jnp.asarray(beta, jnp.float32)
    table_of = {seq: i for i, seq in enumerate(uniq)}
    return Fusion(fn=_fuse_per_row, args=args, per_row=True), table_of


def make_fusion(
    msa_log_prior: np.ndarray,
    msa_start: int,
    msa_end: int,
    alpha: float,
    eve_prior: Optional[np.ndarray] = None,
    beta: float = 0.0,
    n_special: int = 5,
) -> Fusion:
    """Build a Fusion for ar_scoring.batched_ar_loglik (also directly
    callable as f(shift_logps, targets, starts, ends, reverse)).

    The prior's length dim is padded up to a multiple of 64 so assays of
    similar protein length share ONE compiled block program (token rows
    are already bucketed; an unpadded (full_len, V) arg would force a
    recompile per distinct protein length). Padded rows sit outside
    [msa_start, msa_end) and are masked by in_range, never read."""
    msa_log_prior = np.asarray(msa_log_prior)
    pad = (-msa_log_prior.shape[0]) % 64
    if pad:
        msa_log_prior = np.pad(msa_log_prior, [(0, pad), (0, 0)])
        if eve_prior is not None:
            eve_prior = np.pad(np.asarray(eve_prior), [(0, pad), (0, 0)])
    args = {
        "msa_lp": jnp.asarray(msa_log_prior, dtype=jnp.float32),
        "msa_start": jnp.asarray(msa_start, jnp.int32),
        "msa_end": jnp.asarray(msa_end, jnp.int32),
        "alpha": jnp.asarray(alpha, jnp.float32),
        "n_special": jnp.asarray(n_special, jnp.int32),
    }
    if eve_prior is not None:
        args["eve_lp"] = jnp.asarray(eve_prior, jnp.float32)
        args["beta"] = jnp.asarray(beta, jnp.float32)
    return Fusion(fn=_fuse, args=args)
