"""ProSST: masked LM with a quantized structure-token stream and
sequence-structure disentangled attention.

The reference (ref: proteingym/baselines/prosst/compute_fitness.py:15-120)
loads AI4Protein/ProSST-{20..4096} from HuggingFace (trust_remote_code;
the modeling file is NOT vendored) plus the vendored structure quantizer
(prosst/structure/quantizer.py). Scoring: log-softmax over the residue
stream with the structure stream fixed; score = logp[mt] - logp[wt] at
mutated positions (compute_fitness.py:31-63).

This module provides TWO paths:

1. ``ProSSTConfig`` + ``apply`` — the REAL architecture per the ProSST
   paper (NeurIPS 2024): a DeBERTa-v1-style encoder whose attention sums
   five disentangled terms — content-content, content-to-position,
   position-to-content (exact DeBERTa v1 bucketing/gather, validated
   against transformers' DisentangledSelfAttention in
   tests/test_prosst_real.py), content-to-structure and
   structure-to-content (per-position structure-token embeddings) — scaled
   by 1/sqrt(5*d_head). ``convert_hf_state_dict`` maps HF checkpoints with
   either split q/k/v or DeBERTa's fused in_proj layout. Since the HF
   modeling file is unreachable in this environment, the converter's key
   names follow the paper + DeBERTa conventions and fail loudly on
   mismatch rather than guessing.

2. the original additive-conditioning "-class" scorer (kept below) using
   the native 3Di-style quantizer for environments with no published
   structure-token sequences.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.data.mutants import is_wt_row


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


# ---------------------------------------------------------------------------
# Real ProSST: DeBERTa-style sequence-structure disentangled attention
# ---------------------------------------------------------------------------

# residue tokenizer (ProSST AA vocab, 25 tokens: 4 specials + 20 AAs + X)
PROSST_TOKENS = (
    ["[PAD]", "[CLS]", "[SEP]", "[UNK]"]
    + list("ACDEFGHIKLMNPQRSTVWY") + ["X"]
)
PROSST_IDX = {t: i for i, t in enumerate(PROSST_TOKENS)}
P_PAD, P_CLS, P_SEP, P_UNK = 0, 1, 2, 3


def tokenize_prosst(seq: str) -> np.ndarray:
    return np.asarray(
        [P_CLS] + [PROSST_IDX.get(c, P_UNK) for c in seq] + [P_SEP], np.int32
    )


def tokenize_structure_sequence(tokens) -> np.ndarray:
    """[1] + (t+3 for t in tokens) + [2] (ref compute_fitness.py:20-28)."""
    return np.asarray([1] + [int(t) + 3 for t in tokens] + [2], np.int32)


@dataclasses.dataclass(frozen=True)
class ProSSTConfig:
    name: str = "prosst_2048"
    vocab_size: int = 25
    ss_vocab_size: int = 2048 + 3
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate: int = 3072
    max_relative_positions: int = 1024
    # 1 (content) + c2p + p2c + c2ss + ss2c
    scale_factor: int = 5

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


PROSST_PRESETS = {
    f"prosst_{k}": ProSSTConfig(name=f"prosst_{k}", ss_vocab_size=k + 3)
    for k in (20, 128, 512, 1024, 2048, 4096)
} | {
    "prosst_tiny": ProSSTConfig(
        name="prosst_tiny", ss_vocab_size=16 + 3, hidden=48, num_layers=2,
        num_heads=4, intermediate=96, max_relative_positions=16,
    ),
}


def prosst_init_params(rng: jax.Array, c: ProSSTConfig):
    keys = iter(jax.random.split(rng, 16 + 12 * c.num_layers))

    def lin(n_in, n_out, bias=True):
        p = {"w": jax.random.normal(next(keys), (n_in, n_out)) * 0.02}
        if bias:
            p["b"] = jnp.zeros(n_out)
        return p

    def ln(d):
        return {"g": jnp.ones(d), "b": jnp.zeros(d)}

    def emb(n, d):
        return jax.random.normal(next(keys), (n, d)) * 0.02

    d = c.hidden
    params = {
        "word_embeddings": emb(c.vocab_size, d),
        "ss_embeddings": emb(c.ss_vocab_size, d),
        "emb_ln": ln(d),
        "rel_embeddings": emb(2 * c.max_relative_positions, d),
        "layers": [],
        "mlm": {"dense": lin(d, d), "ln": ln(d),
                "decoder": lin(d, c.vocab_size)},
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                "pos_key": lin(d, d, bias=False),   # DeBERTa pos_proj
                "pos_query": lin(d, d),             # DeBERTa pos_q_proj
                "ss_key": lin(d, d, bias=False),
                "ss_query": lin(d, d),
                "attn_out": lin(d, d),
                "attn_ln": ln(d),
                "inter": lin(d, c.intermediate),
                "out": lin(c.intermediate, d),
                "out_ln": ln(d),
            }
        )
    return params


def _p_ln(x, p, eps=1e-7):
    # DeBERTa layer_norm_eps default 1e-7
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _p_lin(x, p):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _heads(x, h):
    return x.reshape(x.shape[:-1] + (h, -1)).swapaxes(-3, -2)


def prosst_attention(layer, c: ProSSTConfig, x, ss, rel_emb, key_mask):
    """Five-term disentangled attention (paper eq. 3; DeBERTa v1 gathers
    for the positional terms, validated vs transformers)."""
    B, T, d = x.shape
    H, hd = c.num_heads, c.head_dim
    scale = np.sqrt(hd * c.scale_factor)
    q = _heads(_p_lin(x, layer["q"]), H) / scale
    k = _heads(_p_lin(x, layer["k"]), H)
    v = _heads(_p_lin(x, layer["v"]), H)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)

    # content <-> position (c2p + p2c)
    att_span = min(T, c.max_relative_positions)
    rel = rel_emb[
        c.max_relative_positions - att_span
        : c.max_relative_positions + att_span
    ]
    rel_pos = (jnp.arange(T)[:, None] - jnp.arange(T)[None, :])  # q - k
    pos_key = _heads(_p_lin(rel[None], layer["pos_key"]), H)    # (1,H,2s,hd)
    c2p = jnp.einsum("bhqd,xhkd->bhqk", q, pos_key)             # over 2s
    c2p_pos = jnp.clip(rel_pos + att_span, 0, 2 * att_span - 1)
    c2p = jnp.take_along_axis(
        c2p, jnp.broadcast_to(c2p_pos[None, None], (B, H, T, T)), axis=-1
    )
    pos_query = _heads(_p_lin(rel[None], layer["pos_query"]), H) / scale
    p2c = jnp.einsum("bhkd,xhqd->bhkq", k, pos_query)
    p2c_pos = jnp.clip(-rel_pos + att_span, 0, 2 * att_span - 1)
    p2c = jnp.take_along_axis(
        p2c, jnp.broadcast_to(p2c_pos[None, None], (B, H, T, T)), axis=-1
    ).swapaxes(-1, -2)

    # content <-> structure (aligned per-position ss embeddings)
    ss_key = _heads(_p_lin(ss, layer["ss_key"]), H)              # (B,H,T,hd)
    c2ss = jnp.einsum("bhqd,bhkd->bhqk", q, ss_key)
    ss_query = _heads(_p_lin(ss, layer["ss_query"]), H) / scale
    ss2c = jnp.einsum("bhqd,bhkd->bhqk", ss_query, k)

    scores = scores + c2p + p2c + c2ss + ss2c
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
    w = jax.nn.softmax(scores, -1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    ctx = ctx.swapaxes(-3, -2).reshape(B, T, d)
    return _p_lin(ctx, layer["attn_out"])


def prosst_apply(params, c: ProSSTConfig, tokens, ss_tokens,
                 key_mask=None) -> jnp.ndarray:
    """(B, T) residue + structure token grids -> (B, T, vocab) logits."""
    x = params["word_embeddings"][tokens]
    x = _p_ln(x, params["emb_ln"])
    ss = params["ss_embeddings"][ss_tokens]
    rel_emb = params["rel_embeddings"]
    for layer in params["layers"]:
        a = prosst_attention(layer, c, x, ss, rel_emb, key_mask)
        x = _p_ln(x + a, layer["attn_ln"])
        h = jax.nn.gelu(_p_lin(x, layer["inter"]), approximate=False)
        x = _p_ln(x + _p_lin(h, layer["out"]), layer["out_ln"])
    h = _p_lin(x, params["mlm"]["dense"])
    h = jax.nn.gelu(h, approximate=False)
    h = _p_ln(h, params["mlm"]["ln"])
    return _p_lin(h, params["mlm"]["decoder"])


def score_assay_prosst_real(
    params, c: ProSSTConfig, sequence: str, structure_tokens,
    mutants: Sequence[str], offset_idx: int = 1,
) -> np.ndarray:
    """WT-marginals over the residue stream with the structure stream fixed
    (ref compute_fitness.py:31-63: one unmasked forward, logp differences)."""
    tokens = tokenize_prosst(sequence)[None]
    ss = tokenize_structure_sequence(structure_tokens)[None]
    if tokens.shape != ss.shape:
        raise ValueError(
            f"structure token count {ss.shape[1] - 2} != sequence length "
            f"{tokens.shape[1] - 2}"
        )
    logits = prosst_apply(params, c, jnp.asarray(tokens), jnp.asarray(ss))
    logp = np.asarray(jax.nn.log_softmax(logits[0, 1:-1], -1))
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += (logp[pos, PROSST_IDX[mt]]
                       - logp[pos, PROSST_IDX[wt]])
    return out


def read_structure_sequence_fasta(path) -> np.ndarray:
    """Comma-separated int token FASTA (the format ProSST distributes for
    ProteinGym assays; ref compute_fitness.py:33-36)."""
    seq = []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith(">"):
            continue
        seq.extend(int(t) for t in line.split(","))
    return np.asarray(seq, np.int32)


def convert_hf_state_dict(sd, c: ProSSTConfig, allow_missing_ss=False):
    """Best-effort mapping of an AI4Protein/ProSST HF checkpoint.

    Handles split query/key/value projections or DeBERTa v1's fused
    in_proj (+ q_bias/v_bias). Raises KeyError listing the unmatched
    parameter rather than silently mis-assigning. ``allow_missing_ss``
    zero-fills the structure-stream projections (used to cross-check the
    positional machinery against plain DeBERTa checkpoints)."""
    import numpy as _np

    def g(key):
        v = sd[key]
        return _np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            _np.float32,
        )

    def first(*cands):
        for k in cands:
            if k in sd:
                return k
        raise KeyError(f"none of {cands} in checkpoint")

    def lin(*cands, bias=True):
        k = first(*cands)
        p = {"w": jnp.asarray(g(k).T)}
        bk = k.replace(".weight", ".bias")
        if bias and bk in sd:
            p["b"] = jnp.asarray(g(bk))
        return p

    def lnp(*cands):
        k = first(*cands)
        return {"g": jnp.asarray(g(k)),
                "b": jnp.asarray(g(k.replace(".weight", ".bias")))}

    pre = "prosst." if any(k.startswith("prosst.") for k in sd) else (
        "deberta." if any(k.startswith("deberta.") for k in sd) else ""
    )
    params = {
        "word_embeddings": jnp.asarray(
            g(first(f"{pre}embeddings.word_embeddings.weight"))),
        "ss_embeddings": (
            jnp.asarray(g(f"{pre}embeddings.ss_embeddings.weight"))
            if f"{pre}embeddings.ss_embeddings.weight" in sd
            else (jnp.zeros((c.ss_vocab_size, c.hidden))
                  if allow_missing_ss
                  else jnp.asarray(
                      g(first(f"{pre}embeddings.ss_embeddings.weight"))))),
        "emb_ln": lnp(f"{pre}embeddings.LayerNorm.weight"),
        "rel_embeddings": jnp.asarray(
            g(first(f"{pre}encoder.rel_embeddings.weight"))),
        "layers": [],
        "mlm": {
            "dense": lin("cls.predictions.transform.dense.weight",
                         "lm_head.dense.weight"),
            "ln": lnp("cls.predictions.transform.LayerNorm.weight",
                      "lm_head.layer_norm.weight"),
            "decoder": lin("cls.predictions.decoder.weight",
                           "lm_head.decoder.weight"),
        },
    }
    for i in range(c.num_layers):
        b = f"{pre}encoder.layer.{i}"
        a = f"{b}.attention.self"
        layer = {}
        if f"{a}.in_proj.weight" in sd:
            # DeBERTa v1 packs in_proj rows PER HEAD as (q_h, k_h, v_h)
            # blocks of head_dim (modeling_deberta transpose_for_scores +
            # chunk(3, dim=-1) on the head-split tensor)
            w = g(f"{a}.in_proj.weight")  # (3d, d)
            hd = c.head_dim
            per_head = w.reshape(c.num_heads, 3, hd, c.hidden)
            qw = per_head[:, 0].reshape(c.hidden, c.hidden)
            kw = per_head[:, 1].reshape(c.hidden, c.hidden)
            vw = per_head[:, 2].reshape(c.hidden, c.hidden)
            layer["q"] = {"w": jnp.asarray(qw.T),
                          "b": jnp.asarray(g(f"{a}.q_bias"))}
            layer["k"] = {"w": jnp.asarray(kw.T)}
            layer["v"] = {"w": jnp.asarray(vw.T),
                          "b": jnp.asarray(g(f"{a}.v_bias"))}
        else:
            layer["q"] = lin(f"{a}.query_proj.weight", f"{a}.query.weight")
            layer["k"] = lin(f"{a}.key_proj.weight", f"{a}.key.weight")
            layer["v"] = lin(f"{a}.value_proj.weight", f"{a}.value.weight")
        layer["pos_key"] = lin(f"{a}.pos_proj.weight",
                               f"{a}.pos_key_proj.weight", bias=False)
        layer["pos_query"] = lin(f"{a}.pos_q_proj.weight",
                                 f"{a}.pos_query_proj.weight")
        try:
            layer["ss_key"] = lin(f"{a}.ss_proj.weight",
                                  f"{a}.ss_key_proj.weight", bias=False)
            layer["ss_query"] = lin(f"{a}.ss_q_proj.weight",
                                    f"{a}.ss_query_proj.weight")
        except KeyError:
            if not allow_missing_ss:
                raise
            d = c.hidden
            layer["ss_key"] = {"w": jnp.zeros((d, d))}
            layer["ss_query"] = {"w": jnp.zeros((d, d)),
                                 "b": jnp.zeros(d)}
        layer["attn_out"] = lin(f"{b}.attention.output.dense.weight")
        layer["attn_ln"] = lnp(f"{b}.attention.output.LayerNorm.weight")
        layer["inter"] = lin(f"{b}.intermediate.dense.weight")
        layer["out"] = lin(f"{b}.output.dense.weight")
        layer["out_ln"] = lnp(f"{b}.output.LayerNorm.weight")
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# VenusREM: ProSST-2048 logits blended with alignment count matrices
# (ref venusrem/compute_fitness.py — model_name defaults to
# AI4Protein/ProSST-2048; logits' = (1-alpha)*logp + alpha*
# log_softmax(column count distribution), applied over the alignment
# window, alpha=0.8)
# ---------------------------------------------------------------------------

def read_alignment_fasta(path):
    """read_multi_fasta semantics (venusrem/compute_fitness.py:39-60):
    uppercase + '-'/'.' -> pad markers. NOTE the reference leaves the LAST
    sequence untransformed (missing-transform quirk); we normalize all rows
    — the single-row difference only perturbs one count."""
    headers, seqs = [], []
    cur = ""
    header = None
    for line in open(path):
        line = line.strip()
        if line.startswith(">"):
            if cur:
                headers.append(header)
                seqs.append(cur)
                cur = ""
            header = line
        elif line:
            cur += line
    if cur:
        headers.append(header)
        seqs.append(cur)
    return headers, seqs


def alignment_count_log_softmax(seqs, vocab_size: int = 25) -> np.ndarray:
    """Per-column token count distribution -> log_softmax (the reference
    applies log_softmax to PROBABILITIES, not log-probs — preserved)."""
    L = max(len(s) for s in seqs)
    counts = np.zeros((L, vocab_size), np.float64)
    for s in seqs:
        s = s.upper()
        for i, ch in enumerate(s):
            if ch in ("-", "."):
                counts[i, P_PAD] += 1
            else:
                counts[i, PROSST_IDX.get(ch, P_UNK)] += 1
        for i in range(len(s), L):  # HF padding of ragged rows
            counts[i, P_PAD] += 1
    probs = counts / np.maximum(counts.sum(1, keepdims=True), 1)
    # log_softmax of the probability vector
    z = probs - probs.max(1, keepdims=True)
    return z - np.log(np.exp(z).sum(1, keepdims=True))


def parse_alignment_range(header: str, aln_len: int):
    """'>name/start-end' -> 0-based [start-1, end) (compute_fitness:68-72)."""
    try:
        start, end = header.split("/")[-1].split("-")
        return int(start) - 1, int(end)
    except Exception:
        return 0, aln_len


def venusrem_score_assay_real(
    params, c: ProSSTConfig, sequence: str, structure_tokens,
    mutants: Sequence[str], aa_alignment=None, struct_alignment=None,
    alpha: float = 0.8, offset_idx: int = 1,
) -> np.ndarray:
    """ProSST logits + alignment-retrieval blending
    (venusrem/compute_fitness.py:127-226)."""
    tokens = tokenize_prosst(sequence)[None]
    ss = tokenize_structure_sequence(structure_tokens)[None]
    logits = prosst_apply(params, c, jnp.asarray(tokens), jnp.asarray(ss))
    logp = np.array(jax.nn.log_softmax(logits[0, 1:-1], -1))

    if struct_alignment and struct_alignment[1]:
        headers, seqs = struct_alignment
        cm = alignment_count_log_softmax(seqs, c.vocab_size)
        n = min(len(cm), len(logp))
        logp[:n] = (1 - alpha) * logp[:n] + alpha * cm[:n]
    if aa_alignment and aa_alignment[1]:
        headers, seqs = aa_alignment
        cm = alignment_count_log_softmax(seqs, c.vocab_size)
        start, end = parse_alignment_range(headers[0], len(cm))
        end = min(end, len(logp), start + len(cm))
        logp[start:end] = (
            (1 - alpha) * logp[start:end] + alpha * cm[: end - start]
        )

    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += logp[pos, PROSST_IDX[mt]] - logp[pos, PROSST_IDX[wt]]
    return out
