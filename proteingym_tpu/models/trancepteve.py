"""TranceptEVE / retrieval-augmented Tranception scorer.

Ties together the Tranception AR model (models/tranception.py), the MSA
pseudocount prior and EVE VAE prior (models/retrieval.py), and the generic
AR harness (models/ar_scoring.py).

Pipeline parity (ref: trancepteve/score_trancepteve.py:15-209 and
trancepteve/trancepteve/model_pytorch.py:666-1190):

  1. build the MSA log prior from the assay's MSA (weighted pseudocounts,
     Hamming>=0.2 filter);
  2. build the EVE log prior from an ensemble of trained EVE VAEs (log-space
     MC average of decoder outputs at the WT latent);
  3. pick alpha (MSA weight) / beta (EVE weight) from processed depths;
  4. optionally recalibrate both priors to the transformer's WT mean
     log-prob temperature;
  5. score mutants with mirrored teacher-forced AR passes whose shifted
     log-probs are fused with the priors inside the MSA overlap.

The Tranception-only retrieval mode is the special case beta=0, alpha=0.6.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from proteingym_tpu.models import retrieval
from proteingym_tpu.models.ar_scoring import score_mutants_ar
from proteingym_tpu.models.tranception import VOCAB, TranceptionConfig, apply


@dataclasses.dataclass
class RetrievalConfig:
    retrieval_type: str = "TranceptEVE"  # or "Tranception" or None
    msa_start: int = 0  # 0-indexed full-sequence coords
    msa_end: int = 0
    indel_mode: bool = False
    alpha: Optional[float] = None  # override depth tables when set
    beta: Optional[float] = None
    recalibrate: bool = False


def transformer_wt_mean_logprob(
    logits_fn: Callable,
    target_seq: str,
    msa_start: int,
    msa_end: int,
    n_special: int = 5,
) -> float:
    """Mean WT log-prob over the MSA overlap, averaged over both reading
    directions (ref trancepteve/model_pytorch.py:889-892). Used as the
    recalibration target. In the reversed pass, shift-frame position t
    predicts residue L-1-t, so the overlap [s, e) maps to [L-e, L-s)."""
    L = len(target_seq)
    means = []
    for seq, region in (
        (target_seq, slice(msa_start, msa_end)),
        (target_seq[::-1], slice(L - msa_end, L - msa_start)),
    ):
        tokens = jnp.asarray(VOCAB.tokenize(seq)[None, :])
        logps = jax.nn.log_softmax(
            logits_fn(tokens).astype(jnp.float32), axis=-1
        )[0, :-1]
        means.append(float(jnp.mean(logps[region, n_special:])))
    return float(np.mean(means))


def build_priors(
    msa_sequences: Sequence[str],
    msa_weights: Optional[np.ndarray],
    target_seq: str,
    rcfg: RetrievalConfig,
    eve_params_list: Optional[List] = None,
    eve_config=None,
    eve_focus_cols: Optional[np.ndarray] = None,
    eve_focus_seq: Optional[str] = None,
    eve_num_samples: int = 20_000,
    logits_fn: Optional[Callable] = None,
):
    """Compute (msa_log_prior, eve_log_prior, alpha, beta) for an assay.

    msa_sequences are focus-column rows (focus sequence first) spanning
    [rcfg.msa_start, rcfg.msa_end) of the target sequence.
    """
    full_len = len(target_seq)
    # filter ONCE; the filtered depth also drives the alpha/beta tables
    # (ref uses the processed-MSA depth for both weights)
    keep = retrieval.hamming_filter(msa_sequences)
    msa_sequences = [msa_sequences[i] for i in keep]
    if msa_weights is not None:
        msa_weights = np.asarray(msa_weights)[keep]
    msa_lp = retrieval.log_msa_prior(
        msa_sequences, msa_weights, rcfg.msa_start, rcfg.msa_end, full_len,
        filter_msa=False,
    )
    msa_depth = len(msa_sequences)
    alpha = (
        rcfg.alpha
        if rcfg.alpha is not None
        else retrieval.msa_alpha(msa_depth, rcfg.indel_mode, rcfg.retrieval_type)
    )

    eve_lp = None
    beta = 0.0
    if rcfg.retrieval_type == "TranceptEVE" and eve_params_list:
        eve_lp = retrieval.eve_log_prior(
            eve_params_list,
            eve_config,
            eve_focus_seq,
            eve_focus_cols,
            rcfg.msa_start,
            full_len,
            num_samples=eve_num_samples,
        )
        eve_depth = len(msa_sequences)  # Hamming-filtered above
        beta = (
            rcfg.beta
            if rcfg.beta is not None
            else retrieval.eve_beta(eve_depth, rcfg.indel_mode, rcfg.retrieval_type)
        )

    if rcfg.recalibrate and logits_fn is not None:
        region = slice(rcfg.msa_start, rcfg.msa_end)
        target = transformer_wt_mean_logprob(
            logits_fn, target_seq, rcfg.msa_start, rcfg.msa_end
        )
        msa_lp = msa_lp.copy()
        msa_lp[region, 5:] = retrieval.recalibrate_log_prior(
            msa_lp[region, 5:], target
        )
        if eve_lp is not None:
            cols = rcfg.msa_start + np.asarray(eve_focus_cols)
            eve_lp = eve_lp.copy()
            eve_lp[cols, 5:] = retrieval.recalibrate_log_prior(
                eve_lp[cols, 5:], target
            )
    return msa_lp, eve_lp, alpha, beta


def score_trancepteve(
    params,
    config: TranceptionConfig,
    mutants: Sequence[str],
    mutated_sequences: Sequence[str],
    target_seq: str,
    rcfg: Optional[RetrievalConfig] = None,
    msa_log_prior: Optional[np.ndarray] = None,
    eve_log_prior: Optional[np.ndarray] = None,
    alpha: float = 0.0,
    beta: float = 0.0,
    scoring_mirror: bool = True,
    batch_size: int = 32,
    indel_mode: bool = False,
) -> pd.DataFrame:
    """Score an assay with (optionally retrieval-fused) Tranception."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn

    logits_fn = stable_params_fn(apply, config)

    fusion, table_of = None, None
    if msa_log_prior is not None and rcfg is not None:
        if indel_mode:
            # realign the prior(s) to EACH mutated sequence (the Clustal
            # Omega role, ref tranception msa_utils.py:141-192): indels
            # shift mutant-frame positions away from the WT-frame table
            fusion, table_of = retrieval.make_indel_fusion(
                msa_log_prior,
                rcfg.msa_start,
                rcfg.msa_end,
                alpha,
                target_seq,
                mutated_sequences,
                eve_prior=eve_log_prior,
                beta=beta,
            )
        else:
            fusion = retrieval.make_fusion(
                msa_log_prior,
                rcfg.msa_start,
                rcfg.msa_end,
                alpha,
                eve_prior=eve_log_prior,
                beta=beta,
            )

    return score_mutants_ar(
        logits_fn,
        VOCAB.tokenize,
        VOCAB.PAD,
        mutants,
        mutated_sequences,
        target_seq,
        model_context_len=config.n_ctx - 2,
        scoring_mirror=scoring_mirror,
        batch_size=batch_size,
        indel_mode=indel_mode,
        fusion=fusion,
        params=params,
        fusion_table_of=table_of,
    )
