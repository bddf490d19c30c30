"""xTrimoPGLM-class: GLM backbone scoring in both MLM and AR modes.

The reference (ref: proteingym/baselines/xtrimopglm/compute_fitness.py:
1-1325, HF trust_remote_code) scores with either the masked (MLM) branch
(score_mutations_mlm, :14) or the autoregressive (GLM generation) branch
of xTrimoPGLM (1B-100B). The GLM objective unifies both: bidirectional
attention over the context, causal over generated spans.

Native trunk: rotary attention + SwiGLU blocks (the ESM-C block family,
models/esmc.py) with a configurable attention mode:
  - mode="mlm": fully bidirectional, [MASK]-token marginal scoring
  - mode="ar" : causal, teacher-forced log-likelihood scoring
This reproduces both published scoring contracts with one parameter set.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.models import esmc
from proteingym_tpu.models.esmc import ALPHABET, EsmcConfig, init_params  # noqa: F401 (shared trunk)


@dataclasses.dataclass(frozen=True)
class XtrimoConfig(EsmcConfig):
    name: str = "xtrimopglm_1b"


PRESETS = {
    "xtrimopglm_tiny": XtrimoConfig("xtrimopglm_tiny", 2, 64, 4),
    "xtrimopglm_1b": XtrimoConfig("xtrimopglm_1b", 24, 2048, 16),
    "xtrimopglm_3b": XtrimoConfig("xtrimopglm_3b", 30, 2560, 20),
}


def apply(params, c: EsmcConfig, tokens: jnp.ndarray, mode: str = "mlm"
          ) -> jnp.ndarray:
    """GLM trunk forward; mode selects bidirectional vs causal attention."""
    if mode == "mlm":
        return esmc.apply(params, c, tokens)
    # causal: reuse the trunk with a causal flash attention
    from proteingym_tpu.ops.flash_attention import mha
    from proteingym_tpu.ops.rotary import apply_rotary

    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    pad_mask = tokens == ALPHABET.padding_idx
    x = params["embed"].astype(c.dtype)[tokens]
    for layer in params["layers"]:
        y = esmc._ln(x, layer["attn_ln"])
        qkv = jnp.dot(y, layer["qkv"].astype(y.dtype),
                      preferred_element_type=jnp.float32).astype(c.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = esmc._ln(q, layer["q_ln"])
        k = esmc._ln(k, layer["k_ln"])
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        q, k = apply_rotary(q, k)
        ctx = mha(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), key_mask=~pad_mask, causal=True,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        x = x + jnp.dot(
            ctx.astype(c.dtype), layer["out"].astype(c.dtype),
            preferred_element_type=jnp.float32,
        ).astype(c.dtype) / c.residue_scaling
        y = esmc._ln(x, layer["ffn_ln"])
        hidden = jnp.dot(y, layer["ffn_in"].astype(y.dtype),
                         preferred_element_type=jnp.float32)
        h1, h2 = jnp.split(hidden, 2, axis=-1)
        x = x + jnp.dot(
            (jax.nn.silu(h1) * h2).astype(c.dtype),
            layer["ffn_out"].astype(c.dtype),
            preferred_element_type=jnp.float32,
        ).astype(c.dtype) / c.residue_scaling
    x = esmc._ln(x, params["final_ln"])
    return jnp.dot(x.astype(jnp.float32), params["head"],
                   preferred_element_type=jnp.float32)


def score_assay(
    params,
    c: EsmcConfig,
    sequence: str,
    mutants: Sequence[str],
    mutated_sequences: Sequence[str],
    mode: str = "mlm",
    chunk: int = 16,
    batch_size: int = 16,
) -> np.ndarray:
    """MLM: masked marginals (ref score_mutations_mlm); AR: mirrored
    teacher-forced log-lik delta vs WT."""
    if mode == "mlm":
        return esmc.score_assay(params, c, sequence, mutants, chunk=chunk)
    from proteingym_tpu.models.ar_scoring import score_mutants_ar, stable_params_fn

    frame = score_mutants_ar(
        stable_params_fn(apply, c, (("mode", "ar"),)),
        ALPHABET.tokenize,
        ALPHABET.padding_idx,
        mutants,
        mutated_sequences,
        sequence,
        model_context_len=1024,
        scoring_mirror=False,  # GLM is L->R only
        batch_size=batch_size,
        params=params,
    )
    # map back by sequence: the AR harness dedups identical
    # mutated_sequences, so positional alignment would shift every score
    # after a duplicate row
    score_of = dict(zip(frame["mutated_sequence"], frame["avg_score"]))
    return np.asarray([score_of[s] for s in mutated_sequences])
