"""ProSST-class: masked LM with a quantized structure-token stream.

The reference (ref: proteingym/baselines/prosst/compute_fitness.py:15-120,
prosst/ vendored quantizer) scores with ProSST checkpoints (structure
vocabularies K = 20 ... 4096): each residue carries both an AA token and a
quantized structure token; attention disentangles the two streams.

Native rebuild: the ESM2 trunk (models/esm2.py) with an ADDITIVE structure
-token embedding at the input (the disentangled-attention content/structure
split collapses to additive conditioning for scoring purposes — the same
simplification MULAN uses for angles), and the structure tokens come from
the native 3Di-style quantizer (ops/tridi.py) with a K-state codebook
(K configurable, matching ProSST's vocabulary sweep). Scoring is
masked-marginals over the AA stream with the structure stream fixed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def prosst_init(rng: jax.Array, esm_config, k_structure: int = 2048
                ) -> Dict[str, Any]:
    from proteingym_tpu.models import esm2

    k1, k2 = jax.random.split(rng)
    params = esm2.init_params(k1, esm_config)
    params["structure_embed"] = (
        jax.random.normal(
            k2, (k_structure + 1, esm_config.embed_dim), jnp.float32
        ) * 0.02  # +1: "no structure" token for CLS/EOS slots
    )
    return params


def structure_token_ids(
    coords: np.ndarray, k_structure: int, seed: int = 0
) -> np.ndarray:
    """Quantize the backbone into K structure states (ProSST's quantizer
    role) via the 3Di descriptor space + a K-means codebook."""
    from proteingym_tpu.ops.tridi import tridi_descriptors, train_codebook

    desc, _ = tridi_descriptors(coords)
    k = min(k_structure, len(desc))
    codebook = train_codebook(desc, k=k, seed=seed)
    d = ((desc[:, None] - codebook[None]) ** 2).sum(-1)
    return d.argmin(1).astype(np.int32)


def score_assay_prosst(
    params,
    esm_config,
    coords: np.ndarray,
    sequence: str,
    mutants: Sequence[str],
    k_structure: int = 2048,
    struct_tokens: Optional[np.ndarray] = None,
    chunk: int = 16,
) -> np.ndarray:
    """Masked marginals conditioned on the frozen structure-token stream."""
    from proteingym_tpu.models import esm2
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_mutants_from_table,
    )

    if struct_tokens is None:
        struct_tokens = structure_token_ids(coords, k_structure)
    L = len(sequence)
    # structure embedding per token-grid slot (CLS/EOS -> the null state)
    null = params["structure_embed"].shape[0] - 1
    grid = np.full(L + 2, null, np.int32)
    grid[1 : 1 + L] = struct_tokens[:L]
    cond = params["structure_embed"][jnp.asarray(grid)]

    from proteingym_tpu.models.structure_plms import _conditioned_esm_apply_fn

    tokens = esm2.ALPHABET.tokenize(sequence)
    table = masked_marginal_table(
        _conditioned_esm_apply_fn(esm_config),
        tokens,
        mask_idx=esm2.ALPHABET.mask_idx,
        chunk=chunk,
        params=(params, cond),
        # full-length window: sliced rows would misalign the structure
        # conditioning, which apply() always adds from position 0
        window=len(tokens),
    )
    return score_mutants_from_table(table, mutants, sequence)
