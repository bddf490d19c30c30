"""Structure-conditioned PLM variants: MIF, MULAN, VenusREM, AIDO-class.

Four reference baselines share one pattern — a sequence LM whose
predictions are conditioned on (or blended with) structure/retrieval
signals. Each gets a compact native implementation over existing trunks:

  - MIF / MIF-ST (ref carp_mif/compute_fitness.py:31-48): masked inverse
    folding = CARP ByteNet trunk + structure conditioning. Here the
    ProteinMPNN edge featurization is aggregated per node, projected, and
    ADDED to the token embeddings before the conv stack.
  - MULAN (ref mulan/, foldseek angles adapter): ESM2 trunk + a small
    adapter that injects backbone dihedral features (sin/cos phi/psi/omega
    from ops/gvp.backbone_node_features) at the embedding layer.
  - VenusREM (ref venusrem/compute_fitness.py:39-200): masked-marginal
    logits blended with retrieval count matrices from residue alignments
    (MSA columns) and structure alignments (3Di strings of homolog
    structures): final = logits + alpha*log f_seq + beta*log f_struct.
  - AIDO-class (ref AIDO/compute_fitness.py:32-113): MoE masked LM with
    MSA-retrieval-augmented sliding-window logits — ESM-C-style trunk with
    the ProGen3 MoE FFN + the Tranception-style MSA prior fusion on the
    marginal table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

AA20 = "ACDEFGHIKLMNPQRSTVWY"


def _conditioned_esm_apply(bundle, config, tokens):
    """(params, per-position conditioning) -> ESM logits; the bundle flows
    as a jit argument so per-assay conditioning never bakes into the
    compiled program (see ar_scoring.stable_params_fn)."""
    from proteingym_tpu.models import esm2

    params, cond = bundle
    return esm2.apply(params, config, tokens, extra_embedding=cond)


def _conditioned_esm_apply_fn(config):
    from proteingym_tpu.models.ar_scoring import stable_params_fn

    return stable_params_fn(_conditioned_esm_apply, config)


# ---------------------------------------------------------------------------
# MIF: CARP trunk + structure features
# ---------------------------------------------------------------------------

def mif_structure_features(coords: np.ndarray, num_rbf: int = 16,
                           k_neighbors: int = 16) -> np.ndarray:
    """Per-node structure features: mean of neighbor RBF distance profiles
    + dihedral sin/cos (the reference builds dist/omega/theta/phi tensors,
    ref process_coords at carp_mif/compute_fitness.py:33-40)."""
    from proteingym_tpu.ops.gnn import knn_graph
    from proteingym_tpu.ops.gvp import backbone_edge_features, backbone_node_features

    e_idx = np.asarray(knn_graph(jnp.asarray(coords[:, 1]), k_neighbors))
    edge_s, _ = backbone_edge_features(coords, e_idx, num_rbf)
    node_s, _ = backbone_node_features(coords)
    return np.concatenate([edge_s.mean(1), node_s], -1).astype(np.float32)


def mif_init(rng: jax.Array, carp_config, feat_dim: int = 25) -> Dict[str, Any]:
    from proteingym_tpu.models import carp

    k1, k2 = jax.random.split(rng)
    params = carp.init_params(k1, carp_config)
    params["struct_proj"] = {
        "w": jax.random.normal(
            k2, (feat_dim, carp_config.embed_dim), jnp.float32
        ) * 0.02,
        "b": jnp.zeros(carp_config.embed_dim, jnp.float32),
    }
    return params


def mif_apply(params, carp_config, tokens: jnp.ndarray,
              struct_feats: jnp.ndarray) -> jnp.ndarray:
    """tokens (B, T), struct_feats (T, F) -> (B, T, V) logits."""
    from proteingym_tpu.models import carp

    cond = (
        struct_feats @ params["struct_proj"]["w"] + params["struct_proj"]["b"]
    )

    x = params["embed"].astype(carp_config.dtype)[tokens]
    x = x + cond[None].astype(x.dtype)
    gelu = jax.nn.gelu
    for layer, dilation in zip(params["layers"],
                               carp._dilation_schedule(carp_config)):
        y = gelu(carp._ln(x, layer["ln1"]))
        y = carp._dense(y, layer["down"])
        y = gelu(carp._ln(y, layer["ln2"]))
        y = carp._dilated_conv(y, layer["conv"], dilation)
        y = gelu(carp._ln(y, layer["ln3"]))
        y = carp._dense(y, layer["up"])
        x = x + y
    x = carp._ln(x, params["final_ln"])
    return carp._dense(x.astype(jnp.float32), params["head"])


def mif_score_assay(params, carp_config, coords: np.ndarray, sequence: str,
                    mutants: Sequence[str], offset_idx: int = 1) -> np.ndarray:
    """WT-forward marginals conditioned on structure (ref label_row)."""
    from proteingym_tpu.models.carp import CarpTokenizer

    tok = CarpTokenizer()
    feats = jnp.asarray(mif_structure_features(coords))
    tokens = jnp.asarray(tok.encode(sequence)[None])
    logps = np.asarray(
        jax.nn.log_softmax(
            mif_apply(params, carp_config, tokens, feats).astype(jnp.float32),
            -1,
        )
    )[0]
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        toks = m.split(":")
        for t in toks:
            wt, pos, mt = t[0], int(t[1:-1]) - offset_idx, t[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {t}")
            out[i] += logps[pos, tok.get_idx(mt)] - logps[pos, tok.get_idx(wt)]
        out[i] /= len(toks)
    return out


# ---------------------------------------------------------------------------
# MULAN: ESM2 + dihedral adapter
# ---------------------------------------------------------------------------

def mulan_init(rng: jax.Array, esm_config) -> Dict[str, Any]:
    from proteingym_tpu.models import esm2

    k1, k2 = jax.random.split(rng)
    params = esm2.init_params(k1, esm_config)
    params["angle_adapter"] = {
        "w": jax.random.normal(k2, (6, esm_config.embed_dim), jnp.float32)
        * 0.02,
        "b": jnp.zeros(esm_config.embed_dim, jnp.float32),
    }
    return params


def mulan_score_assay(params, esm_config, coords: np.ndarray, sequence: str,
                      mutants: Sequence[str], chunk: int = 16) -> np.ndarray:
    """Masked marginals with dihedral features injected at the embedding
    (the adapter modifies the embedding table output additively)."""
    from proteingym_tpu.models import esm2
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_mutants_from_table,
    )
    from proteingym_tpu.ops.gvp import backbone_node_features

    node_s, _ = backbone_node_features(coords)
    cond = jnp.asarray(node_s) @ params["angle_adapter"]["w"] + params[
        "angle_adapter"
    ]["b"]
    # pad to token grid: CLS + seq + EOS
    cond_full = jnp.zeros((len(sequence) + 2, esm_config.embed_dim))
    cond_full = cond_full.at[1 : 1 + len(sequence)].set(cond)

    tokens = esm2.ALPHABET.tokenize(sequence)
    table = masked_marginal_table(
        _conditioned_esm_apply_fn(esm_config),
        tokens,
        mask_idx=esm2.ALPHABET.mask_idx,
        chunk=chunk,
        params=(params, cond_full),
        # full-length window: the trunk is rotary (no position table) and
        # sliced windows would misalign the per-position conditioning,
        # which apply() always adds from position 0
        window=len(tokens),
    )
    return score_mutants_from_table(table, mutants, sequence)


# ---------------------------------------------------------------------------
# VenusREM: logits + retrieval count matrices
# ---------------------------------------------------------------------------

def alignment_count_logits(
    sequences: Sequence[str],
    weights: Optional[np.ndarray] = None,
    pseudocount: float = 0.5,
) -> np.ndarray:
    """(L, 20) log-frequency table from aligned homolog strings (the
    residue/structure alignment count matrices, ref venusrem :67-118)."""
    L = len(sequences[0])
    aa_idx = {a: i for i, a in enumerate(AA20)}
    if weights is None:
        weights = np.ones(len(sequences))
    counts = np.full((L, 20), pseudocount)
    for w, s in zip(weights, sequences):
        for j, ch in enumerate(s.upper()):
            k = aa_idx.get(ch)
            if k is not None:
                counts[j, k] += w
    freq = counts / counts.sum(1, keepdims=True)
    return np.log(freq)


def venusrem_score_assay(
    esm_params,
    esm_config,
    sequence: str,
    mutants: Sequence[str],
    seq_alignment: Optional[Sequence[str]] = None,
    struct_alignment: Optional[Sequence[str]] = None,
    alpha: float = 0.8,
    beta: float = 0.2,
    chunk: int = 16,
) -> np.ndarray:
    """Blend PLM masked-marginal table with retrieval tables:
    final(pos, aa) = logits + alpha*log f_seq + beta*log f_struct."""
    from proteingym_tpu.models import esm2
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_mutants_from_table,
    )

    tokens = esm2.ALPHABET.tokenize(sequence)
    table = np.array(
        masked_marginal_table(
            esm2.make_apply_fn(esm_config),
            tokens, mask_idx=esm2.ALPHABET.mask_idx, chunk=chunk,
            params=esm_params,
        )
    )
    L = len(sequence)
    aa_cols = np.asarray([esm2.ALPHABET.get_idx(a) for a in AA20])
    rows = np.arange(1, 1 + L)
    if seq_alignment:
        table[np.ix_(rows, aa_cols)] += alpha * alignment_count_logits(
            seq_alignment
        )
    if struct_alignment:
        table[np.ix_(rows, aa_cols)] += beta * alignment_count_logits(
            struct_alignment
        )
    return score_mutants_from_table(jnp.asarray(table), mutants, sequence)


# ---------------------------------------------------------------------------
# AIDO-class: MoE masked LM + MSA retrieval fusion
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AidoConfig:
    name: str = "aido_rag_moe"
    num_layers: int = 8
    embed_dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 1024  # per expert
    num_experts: int = 8
    top_k: int = 2
    alphabet_size: int = 33
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads


def aido_init(rng: jax.Array, c: AidoConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 + 7 * c.num_layers))

    def mat(n_in, n_out):
        return jax.random.normal(next(keys), (n_in, n_out), jnp.float32) * 0.02

    def ln(d):
        return {"g": jnp.ones(d, jnp.float32), "b": jnp.zeros(d, jnp.float32)}

    params: Dict[str, Any] = {
        "embed": mat(c.alphabet_size, c.embed_dim),
        "final_ln": ln(c.embed_dim),
        "head": mat(c.embed_dim, c.alphabet_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "attn_ln": ln(c.embed_dim),
                "qkv": mat(c.embed_dim, 3 * c.embed_dim),
                "out": mat(c.embed_dim, c.embed_dim),
                "ffn_ln": ln(c.embed_dim),
                "router": mat(c.embed_dim, c.num_experts),
                # gated-MLP experts in progen3.moe_ffn's stacked layout
                "w1": jax.random.normal(
                    next(keys), (c.num_experts, c.embed_dim, c.ffn_dim),
                    jnp.float32,
                ) * 0.02,
                "w3": jax.random.normal(
                    next(keys), (c.num_experts, c.embed_dim, c.ffn_dim),
                    jnp.float32,
                ) * 0.02,
                "w2": jax.random.normal(
                    next(keys), (c.num_experts, c.ffn_dim, c.embed_dim),
                    jnp.float32,
                ) * 0.02,
            }
        )
    return params


def aido_apply(params, c: AidoConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional MoE masked LM forward (ESM alphabet)."""
    from proteingym_tpu.models.esm2 import ALPHABET
    from proteingym_tpu.models.progen3 import ProGen3Config, moe_ffn
    from proteingym_tpu.ops.flash_attention import mha
    from proteingym_tpu.ops.rotary import apply_rotary

    b, t = tokens.shape
    h, hd = c.num_heads, c.head_dim
    pad_mask = tokens == ALPHABET.padding_idx
    x = params["embed"].astype(c.dtype)[tokens]
    moe_cfg = ProGen3Config(
        num_experts=c.num_experts, top_k=c.top_k, hidden_dim=c.embed_dim,
        ffn_dim=c.ffn_dim, gated_mlp=True,
    )

    def _ln(z, p, eps=1e-5):
        z32 = z.astype(jnp.float32)
        mu = z32.mean(-1, keepdims=True)
        var = z32.var(-1, keepdims=True)
        return ((z32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(
            z.dtype
        )

    for layer in params["layers"]:
        y = _ln(x, layer["attn_ln"])
        qkv = jnp.dot(y, layer["qkv"].astype(y.dtype),
                      preferred_element_type=jnp.float32).astype(c.dtype)
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        q, k = apply_rotary(q, k)
        ctx = mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                  v.transpose(0, 2, 1, 3), key_mask=~pad_mask)
        x = x + jnp.dot(
            ctx.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim).astype(c.dtype),
            layer["out"].astype(c.dtype), preferred_element_type=jnp.float32,
        ).astype(c.dtype)
        y = _ln(x, layer["ffn_ln"])
        x = x + moe_ffn(y, layer, moe_cfg)

    x = _ln(x, params["final_ln"])
    return jnp.dot(x.astype(jnp.float32), params["head"],
                   preferred_element_type=jnp.float32)


def aido_sliding_starts(seq_len: int, window: int = 768,
                        step_size: int = 768) -> list:
    """Window starts exactly as the reference's sliding loop (ref AIDO
    utils/misc.py get_logits_table_sliding:298-306): non-overlapping
    steps; when a step would overrun (strict >) AND the sequence is
    longer than the window, the LAST window snaps to the sequence end.
    Parity-asserted against the imported reference loop in
    tests/test_reference_recipe_parity.py."""
    starts = []
    is_last = False
    for f_start in range(0, seq_len, step_size):
        if is_last:
            break
        if f_start + window > seq_len and seq_len > window:
            f_start = seq_len - window
            is_last = True
        starts.append(f_start)
    return starts


def aido_logits_table_sliding(
    logits_fn,
    res_tokens: np.ndarray,
    vocab_size: int,
    mask_id: int,
    window: int = 768,
    step_size: int = 768,
    chunk: int = 8,
    positions=None,
) -> np.ndarray:
    """(T, V) masked-logits table in RESIDUE coordinates — the exact
    reference recipe (ref AIDO utils/misc.py
    get_logits_table_sliding:276-345): per sliding window, each selected
    position is masked (one grid per position, ``chunk`` grids batched
    per call) and its own raw logits recorded; positions covered by
    several windows (the snapped last window overlaps) AVERAGE their
    logits. ``logits_fn`` takes (B, W) int32 masked windows and returns
    (B, W, V) logits; ``positions`` defaults to every residue (the
    reference tables only the mutated positions — identical values,
    more rows here)."""
    res_tokens = np.asarray(res_tokens, np.int32)
    T = len(res_tokens)
    positions = sorted(range(T) if positions is None else set(positions))
    table = np.zeros((T, vocab_size), np.float64)
    counts = np.zeros(T, np.int64)
    for f_start in aido_sliding_starts(T, window, step_size):
        f_end = min(f_start + window, T)
        win = res_tokens[f_start:f_end]
        pos_in = [p for p in positions if f_start <= p < f_end]
        for blk in range(0, len(pos_in), chunk):
            idx = pos_in[blk:blk + chunk]
            grids = np.tile(win, (chunk, 1))
            for bi, p in enumerate(idx):
                grids[bi, p - f_start] = mask_id
            logits = np.asarray(logits_fn(grids))
            for bi, p in enumerate(idx):
                table[p] += logits[bi, p - f_start]
                counts[p] += 1
    return table / np.maximum(counts, 1)[:, None]


def aido_scores_from_table(
    sequence: str,
    table: np.ndarray,
    mutants: Sequence[str],
    aa_to_idx,
    start: int = 1,
    temp_mt: float = 1.0,
    temp_wt: float = 1.5,
) -> np.ndarray:
    """Exact reference score assembly (ref AIDO utils/misc.py
    get_scores_from_table:347-382): the MEANED logits table goes through
    log-softmax at TWO temperatures, score = sum over sub-mutants of
    table_mt[pos, mt] - table_wt[pos, wt]. ``table`` rows are residue
    coordinates; ``start`` is the 1-based offset of the first residue."""

    def log_softmax(z, temp):
        z = np.asarray(z, np.float64) / temp
        z = z - z.max(-1, keepdims=True)
        return z - np.log(np.exp(z).sum(-1, keepdims=True))

    table_mt = log_softmax(table, temp_mt)
    table_wt = log_softmax(table, temp_wt)
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        for tok in str(m).split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - start, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table_mt[pos, aa_to_idx[mt]] - table_wt[pos, aa_to_idx[wt]]
    return out


def _aido_raw_logits_table(params, c: AidoConfig, tokens: np.ndarray,
                           chunk: int, window: int) -> np.ndarray:
    """Residue-coordinate masked-logits table over the native MoE trunk:
    the reference recipe (aido_logits_table_sliding) with a jitted
    logits_fn that adds CLS/EOS around each residue window on device."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn
    from proteingym_tpu.models import esm2
    from proteingym_tpu.models.esm_scoring import _cached_jit

    al = esm2.ALPHABET
    step = _cached_jit(stable_params_fn(aido_apply, c), "fwd_params")

    def logits_fn(grids: np.ndarray) -> np.ndarray:
        b, w = grids.shape
        full = np.full((b, w + 2), al.eos_idx, np.int32)
        full[:, 0] = al.cls_idx
        full[:, 1:-1] = grids
        return np.asarray(step(params, jnp.asarray(full)))[:, 1:-1]

    return aido_logits_table_sliding(
        logits_fn, tokens, c.alphabet_size, al.mask_idx,
        window=window, chunk=chunk,
    )


def aido_score_assay(
    params,
    c: AidoConfig,
    sequence: str,
    mutants: Sequence[str],
    msa_sequences: Optional[Sequence[str]] = None,
    msa_weights: Optional[np.ndarray] = None,
    retrieval_alpha: float = 0.3,
    chunk: int = 8,
    window: int = 768,
    temp_mt: float = 1.0,
    temp_wt: float = 1.5,
) -> np.ndarray:
    """The reference's sliding-table recipe + asymmetric-temperature
    scoring — table rows averaged per 768-residue sliding window
    (aido_logits_table_sliding, ref AIDO utils/misc.py:276-345), score =
    log_softmax(logits/temp_mt)[mt] - log_softmax(logits/temp_wt)[wt]
    (aido_scores_from_table, ref :347-382, temp_wt=1.5 at
    compute_fitness.py:96) — plus the MSA count-prior fusion standing in
    for the 16B model's in-context MSA retrieval."""
    from proteingym_tpu.models import esm2

    res_tokens = np.asarray(
        [esm2.ALPHABET.get_idx(a) for a in sequence], np.int32)
    table = _aido_raw_logits_table(params, c, res_tokens, chunk, window)
    if msa_sequences:
        L = len(sequence)
        aa_cols = np.asarray([esm2.ALPHABET.get_idx(a) for a in AA20])
        rows = np.arange(L)
        prior = alignment_count_logits(msa_sequences, msa_weights)
        table[np.ix_(rows, aa_cols)] = (
            (1 - retrieval_alpha) * table[np.ix_(rows, aa_cols)]
            + retrieval_alpha * prior
        )
    aa_to_idx = {a: esm2.ALPHABET.get_idx(a) for a in AA20}
    return aido_scores_from_table(
        sequence, table, mutants, aa_to_idx,
        temp_mt=temp_mt, temp_wt=temp_wt,
    )
