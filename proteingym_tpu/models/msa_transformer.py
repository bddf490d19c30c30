"""MSA Transformer (ESM-MSA-1b): axial attention over (rows, columns).

Architecture semantics match the reference vendored model
(ref: proteingym/baselines/esm/esm/model/msa_transformer.py:21-238,
esm/axial_attention.py:37-297):

  - embedding: token embed + learned column positions (per row) +
    learned per-row MSA position embedding (1, 1024, 1, D)
  - tied row attention: scores summed over rows, scaled by
    head_dim^-0.5 / sqrt(num_rows); one softmax over columns shared by
    every row (axial_attention.py:77-79, einsum "rinhd,rjnhd->hnij")
  - column attention: per-column attention over rows
    (einsum "icnhd,jcnhd->hcnij")
  - layer order: row attention, column attention, FFN, each pre-LN
    residual; emb LN before and after; Roberta LM head tied to embeddings
  - rows are [CLS] + aligned sequence, no EOS (alphabet prepend_bos=True,
    append_eos=False)

Scoring (ref esm/compute_fitness.py:373-396): mask position i of the FIRST
row (the query/wild-type), read log-softmax at [row 0, pos i]; per-seed
weighted MSA subsample with the WT always kept (:26-73). The reference's
per-position Python loop becomes a batched chunked forward: the mask
position varies over the batch axis.

TPU design: pure functional apply; both attentions are einsums that lower
onto the MXU; the (R*C) token grid stays resident in HBM once per chunk.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.models.esm2 import ALPHABET, EsmAlphabet


@dataclasses.dataclass(frozen=True)
class MsaTransformerConfig:
    name: str = "esm_msa1b_t12_100M"
    num_layers: int = 12
    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    alphabet_size: int = 33
    max_positions: int = 1024
    max_rows: int = 1024
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


PRESETS = {
    "esm_msa1b_t12_100M": MsaTransformerConfig(),
    "msa_tiny": MsaTransformerConfig(
        name="msa_tiny", num_layers=2, embed_dim=64, num_heads=4, ffn_dim=128,
    ),
}


def init_params(rng: jax.Array, config: MsaTransformerConfig) -> Dict[str, Any]:
    c = config
    keys = jax.random.split(rng, 4 + 10 * c.num_layers)
    kit = iter(keys)

    def dense(key, n_in, n_out):
        return {
            "w": jax.random.normal(key, (n_in, n_out), jnp.float32) * 0.02,
            "b": jnp.zeros(n_out, jnp.float32),
        }

    def ln():
        return {"g": jnp.ones(c.embed_dim, jnp.float32),
                "b": jnp.zeros(c.embed_dim, jnp.float32)}

    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(
            next(kit), (c.alphabet_size, c.embed_dim), jnp.float32
        ) * 0.02,
        "embed_positions": jax.random.normal(
            next(kit), (c.max_positions + 2, c.embed_dim), jnp.float32
        ) * 0.02,
        "msa_position_embedding": 0.01 * jax.random.normal(
            next(kit), (c.max_rows, 1, c.embed_dim), jnp.float32
        ),
        "emb_ln_before": ln(),
        "emb_ln_after": ln(),
        "layers": [],
        "lm_head": {
            "dense": dense(next(kit), c.embed_dim, c.embed_dim),
            "ln": ln(),
            "bias": jnp.zeros(c.alphabet_size, jnp.float32),
        },
    }
    for _ in range(c.num_layers):
        layer = {}
        for attn in ("row_attn", "col_attn"):
            layer[attn] = {
                "q": dense(next(kit), c.embed_dim, c.embed_dim),
                "k": dense(next(kit), c.embed_dim, c.embed_dim),
                "v": dense(next(kit), c.embed_dim, c.embed_dim),
                "o": dense(next(kit), c.embed_dim, c.embed_dim),
                "ln": ln(),
            }
        layer["ffn"] = {
            "fc1": dense(next(kit), c.embed_dim, c.ffn_dim),
            "fc2": dense(next(kit), c.ffn_dim, c.embed_dim),
            "ln": ln(),
        }
        params["layers"].append(layer)
    return params


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    return (
        jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        + p["b"]
    ).astype(x.dtype)


def _gelu(x):
    x32 = x.astype(jnp.float32)
    return (x32 * 0.5 * (1.0 + jax.lax.erf(x32 / np.sqrt(2.0)))).astype(x.dtype)


def _heads(z, b, r, cdim, h, hd):
    return z.reshape(b, r, cdim, h, hd)


def _row_attention(x, p, config, pad_mask):
    """Tied row attention. x: (B, R, C, D); pad_mask: (B, R, C) bool."""
    c = config
    b, r, cols, _ = x.shape
    q = _heads(_dense(x, p["q"]), b, r, cols, c.num_heads, c.head_dim)
    k = _heads(_dense(x, p["k"]), b, r, cols, c.num_heads, c.head_dim)
    v = _heads(_dense(x, p["v"]), b, r, cols, c.num_heads, c.head_dim)
    scaling = c.head_dim ** -0.5 / np.sqrt(r)
    q = q * scaling
    # zero out padded positions so the row-sum is unaffected (ref :123-126)
    q = q * (1.0 - pad_mask[..., None, None].astype(q.dtype))
    scores = jnp.einsum(
        "brihd,brjhd->bhij", q, k, preferred_element_type=jnp.float32
    )  # summed over rows (tied)
    col_pad = pad_mask[:, 0]  # (B, C): key-side mask from the first row
    scores = jnp.where(col_pad[:, None, None, :], -10000.0, scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum(
        "bhij,brjhd->brihd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return _dense(ctx.reshape(b, r, cols, c.embed_dim), p["o"])


def _col_attention(x, p, config, pad_mask):
    """Per-column attention over rows. x: (B, R, C, D)."""
    c = config
    b, r, cols, _ = x.shape
    if r == 1:
        # softmax over a single row is identity on V (ref axial_attention
        # ColumnSelfAttention num_rows==1 shortcut)
        v = _dense(x, p["v"])
        return _dense(v, p["o"])
    q = _heads(_dense(x, p["q"]), b, r, cols, c.num_heads, c.head_dim)
    k = _heads(_dense(x, p["k"]), b, r, cols, c.num_heads, c.head_dim)
    v = _heads(_dense(x, p["v"]), b, r, cols, c.num_heads, c.head_dim)

    # Column attention is standard MHA with T = rows, batched over
    # (batch, column): route through the shared dispatcher so the TPU path
    # takes the grouped Pallas kernel — the einsum form materializes a
    # (B, H, C, R, R) f32 score tensor in HBM (3.6 GB at R=385, C=253,
    # B=2), which OOM-crashes a 16 GB chip at production MSA depth; the
    # kernel keeps scores in VMEM. Masking semantics: an MSA's rows all
    # share one column pad pattern, so a column's keys are either all
    # masked (uniform softmax, same as the reference's -10000 fill,
    # ref esm/axial_attention.py:272) or all live.
    from proteingym_tpu.ops.flash_attention import mha

    def to_bhtd(z):  # (B, R, C, H, Dh) -> (B*C, H, R, Dh)
        return z.transpose(0, 2, 3, 1, 4).reshape(
            b * cols, c.num_heads, r, c.head_dim
        )

    key_mask = ~pad_mask.transpose(0, 2, 1).reshape(b * cols, r)
    o = mha(
        to_bhtd(q), to_bhtd(k), to_bhtd(v), key_mask=key_mask,
        sm_scale=c.head_dim ** -0.5,
    )  # (B*C, H, R, Dh)
    ctx = o.reshape(b, cols, c.num_heads, r, c.head_dim).transpose(
        0, 3, 1, 2, 4
    ).astype(x.dtype)
    return _dense(ctx.reshape(b, r, cols, c.embed_dim), p["o"])


def apply(
    params: Dict[str, Any],
    config: MsaTransformerConfig,
    tokens: jnp.ndarray,
) -> jnp.ndarray:
    """tokens: (B, R, C) int32 -> (B, R, C, V) f32 logits."""
    c = config
    b, r, cols = tokens.shape
    pad_mask = tokens == ALPHABET.padding_idx

    x = params["embed_tokens"].astype(c.dtype)[tokens]
    # learned positions over columns (ESM-1b convention: cumsum of non-pad
    # plus padding_idx offset)
    positions = (
        jnp.cumsum((~pad_mask).astype(jnp.int32), axis=-1) * (~pad_mask)
        + ALPHABET.padding_idx
    )
    x = x + params["embed_positions"].astype(c.dtype)[positions]
    x = x + params["msa_position_embedding"][:r].astype(c.dtype)[None]
    x = _ln(x, params["emb_ln_before"])
    x = x * (1.0 - pad_mask[..., None].astype(x.dtype))

    for layer in params["layers"]:
        x = x + _row_attention(
            _ln(x, layer["row_attn"]["ln"]), layer["row_attn"], c, pad_mask
        )
        x = x + _col_attention(
            _ln(x, layer["col_attn"]["ln"]), layer["col_attn"], c, pad_mask
        )
        y = _ln(x, layer["ffn"]["ln"])
        y = _dense(_gelu(_dense(y, layer["ffn"]["fc1"])), layer["ffn"]["fc2"])
        x = x + y

    x = _ln(x, params["emb_ln_after"])
    h = params["lm_head"]
    y = _gelu(_dense(x, h["dense"]))
    y = _ln(y, h["ln"])
    logits = jnp.dot(
        y,
        params["embed_tokens"].astype(y.dtype).T,
        preferred_element_type=jnp.float32,
    ) + h["bias"]
    return logits


# ---------------------------------------------------------------------------
# Weighted MSA subsampling (ref esm/compute_fitness.py:26-73)
# ---------------------------------------------------------------------------

def sample_msa_weighted(
    sequences: Sequence[str],
    weights: np.ndarray,
    nseq: int,
    seed: int,
    focus_index: int = 0,
) -> List[str]:
    """WT always kept first; remaining rows drawn with replacement with
    probability proportional to their cluster weights."""
    import random as pyrandom

    rng = pyrandom.Random(seed)
    others = [i for i in range(len(sequences)) if i != focus_index]
    out = [sequences[focus_index]]
    if others:
        w = np.asarray([weights[i] for i in others], dtype=np.float64)
        w = w / w.sum()
        picks = rng.choices(others, weights=w.tolist(), k=nseq - 1)
        out.extend(sequences[i] for i in picks)
    return [s.upper() for s in out]


def tokenize_msa(
    sequences: Sequence[str], alphabet: EsmAlphabet = ALPHABET
) -> np.ndarray:
    """(R, C+1) tokens: each row is [CLS] + sequence (no EOS)."""
    rows = []
    for seq in sequences:
        ids = [alphabet.cls_idx] + [alphabet.get_idx(ch) for ch in seq]
        rows.append(ids)
    return np.asarray(rows, dtype=np.int32)


# ---------------------------------------------------------------------------
# Masked-marginal scoring (batched over masked positions)
# ---------------------------------------------------------------------------

# bounded LRU — the jitted value closes over its key (see esm_scoring)
_MSA_STEP_CACHE_MAX = 8
_MSA_STEP_CACHE: "OrderedDict" = OrderedDict()


def _msa_step(logits_fn, params_mode: bool):
    key = (logits_fn, params_mode)
    if key in _MSA_STEP_CACHE:
        _MSA_STEP_CACHE.move_to_end(key)
        return _MSA_STEP_CACHE[key]

    def gather(logits, n, offs):
        logps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logps[jnp.arange(n), 0, offs]  # (chunk, V)

    if params_mode == "build":
        # grids BUILT ON DEVICE from one (R, C) upload per seed: each grid
        # is the base MSA with k first-row tokens masked (k=1 reproduces
        # the reference exactly), so shipping `total` host-built copies
        # (GBs for deep MSAs) is pure waste. lax.map over the whole
        # (n_chunks, chunk, k) offset grid -> ONE dispatch per table
        # (same shape trick as esm_scoring table_build_params).
        @jax.jit
        def step(p, base, offs3d, mask_val):
            chunk_, k_ = offs3d.shape[1], offs3d.shape[2]
            rows = jnp.arange(chunk_)[:, None]

            def body(offs):  # (chunk, k)
                grids = jnp.broadcast_to(
                    base, (chunk_, base.shape[0], base.shape[1])
                )
                grids = grids.at[rows, 0, offs].set(mask_val)
                logps = jax.nn.log_softmax(
                    logits_fn(p, grids).astype(jnp.float32), axis=-1)
                return logps[rows, 0, offs]  # (chunk, k, V)

            out = jax.lax.map(body, offs3d)
            return out.reshape(-1, out.shape[-1])

    elif params_mode:

        @jax.jit
        def step(p, toks, offs):
            return gather(logits_fn(p, toks), toks.shape[0], offs)

    else:

        @jax.jit
        def step(toks, offs):
            return gather(logits_fn(toks), toks.shape[0], offs)

    _MSA_STEP_CACHE[key] = step
    while len(_MSA_STEP_CACHE) > _MSA_STEP_CACHE_MAX:
        _MSA_STEP_CACHE.popitem(last=False)
    return step


def masked_marginal_table_msa(
    logits_fn,
    msa_tokens: np.ndarray,
    mask_idx: Optional[int] = None,
    chunk: int = 4,
    window: int = 1024,
    params=None,
    super_chunks: int = 32,
    cols_per_forward: int = 1,
) -> jnp.ndarray:
    """(C, V) log-prob table; row i from a forward with first-row position i
    masked (ref :381-396 batched over the mask position). Long MSAs use the
    optimal window around each masked position (ref :386-390).

    ``cols_per_forward`` (k) masks k first-row columns per forward and
    reads each masked column's own logits, cutting the table to C/k
    forwards (VERDICT r4 item 4). k=1 is the reference's exact
    one-column-per-forward protocol; k>1 is an opt-in approximation
    whose only deviation is that each masked column's context contains
    k-1 other masked columns — columns are assigned to grids with
    MAXIMUM STRIDE (grid g masks positions g, g+C/k, g+2C/k, ...) so
    co-masked columns sit ~C/k apart, far outside the local context
    that dominates a column's reconstruction. Agreement vs k=1 is
    asserted in tests/test_msa_transformer.py; only the short-MSA
    device-build path supports k>1 (the windowed long path stays k=1).
    """
    from proteingym_tpu.data.windows import get_optimal_window

    mask_idx = ALPHABET.mask_idx if mask_idx is None else mask_idx
    msa_tokens = np.asarray(msa_tokens)
    r, total = msa_tokens.shape

    if params is not None and total <= window:
        # fast path: one (R, C) upload, masked grids built on device.
        # The work grid is dispatched in fixed-shape (K, chunk, k) pieces
        # with a power-of-two tail rather than as one giant program: a
        # deep-MSA table is minutes of device time, and a single dispatch
        # that long trips the TPU runtime's execution watchdog (observed
        # as a worker crash at R=385, C=252 on v5e — ~110 s in one
        # program; ~50 s dispatches survive). K decomposes as powers of
        # two so compile keys stay bounded.
        k_cols = max(1, min(int(cols_per_forward), total))
        n_grids = (total + k_cols - 1) // k_cols
        n_flat = n_grids * k_cols
        # pad with position 0 repeats; `valid` masks them out at scatter
        offs_flat = np.concatenate(
            [np.arange(total, dtype=np.int32),
             np.zeros(n_flat - total, np.int32)]
        )
        valid_flat = np.arange(n_flat) < total
        # max-stride assignment: reshape(k, n_grids).T puts consecutive
        # positions in DIFFERENT grids, so one grid's k masked columns
        # are spaced n_grids ~ C/k apart
        offs_grids = offs_flat.reshape(k_cols, n_grids).T  # (n_grids, k)
        valid_grids = valid_flat.reshape(k_cols, n_grids).T
        # pad slots duplicate the GRID'S OWN first column (always valid):
        # re-masking a masked column is a no-op, so tail grids never mask
        # an extra unrelated column (position-0 repeats did)
        offs_grids = np.where(valid_grids, offs_grids, offs_grids[:, :1])
        n_pad = ((n_grids + chunk - 1) // chunk) * chunk
        if n_pad != n_grids:
            offs_grids = np.concatenate(
                [offs_grids, np.zeros((n_pad - n_grids, k_cols), np.int32)])
            valid_grids = np.concatenate(
                [valid_grids, np.zeros((n_pad - n_grids, k_cols), bool)])
        offsets = offs_grids.reshape(n_pad // chunk, chunk, k_cols)
        step = _msa_step(logits_fn, "build")
        base = jnp.asarray(msa_tokens)
        mval = jnp.asarray(mask_idx, msa_tokens.dtype)
        n_rows = offsets.shape[0]
        outs = []
        c = 0
        while c < n_rows:
            k = super_chunks
            while k > n_rows - c:
                k //= 2
            outs.append(step(params, base, jnp.asarray(offsets[c:c + k]),
                             mval))
            c += k
        flat = np.concatenate([np.asarray(o) for o in outs], axis=0)
        if k_cols == 1:
            return jnp.asarray(flat[:total])
        # scatter rows back by their masked position, dropping padding
        table = np.zeros((total, flat.shape[-1]), flat.dtype)
        sel = valid_grids.reshape(-1)
        table[offs_grids.reshape(-1)[sel]] = flat[sel]
        return jnp.asarray(table)

    if total > window:
        grids = np.zeros((total, r, window), dtype=msa_tokens.dtype)
        offsets = np.zeros(total, dtype=np.int32)
        for i in range(total):
            start, end = get_optimal_window(i, total, window)
            grids[i] = msa_tokens[:, start:end]
            grids[i, 0, i - start] = mask_idx
            offsets[i] = i - start
        eff = window
    else:
        grids = np.tile(msa_tokens[None], (total, 1, 1))
        grids[np.arange(total), 0, np.arange(total)] = mask_idx
        offsets = np.arange(total, dtype=np.int32)
        eff = total

    n_pad = ((total + chunk - 1) // chunk) * chunk
    if n_pad != total:
        grids = np.concatenate(
            [grids, np.tile(msa_tokens[None, :, :eff], (n_pad - total, 1, 1))]
        )
        offsets = np.concatenate([offsets, np.zeros(n_pad - total, np.int32)])

    grids = grids.reshape(n_pad // chunk, chunk, r, eff)
    offsets = offsets.reshape(n_pad // chunk, chunk)

    # one jitted step reused across chunks AND calls (cached per logits_fn
    # object like esm_scoring; lax.map would inline + recompile the full
    # axial model per call site). With ``params``, logits_fn is
    # (params, grid_tokens) -> logits and weights flow as jit arguments.
    step = _msa_step(logits_fn, params is not None)
    if params is not None:
        parts = [
            step(params, jnp.asarray(grids[i]), jnp.asarray(offsets[i]))
            for i in range(grids.shape[0])
        ]
    else:
        parts = [
            step(jnp.asarray(grids[i]), jnp.asarray(offsets[i]))
            for i in range(grids.shape[0])
        ]
    return jnp.concatenate(parts, axis=0)[:total]


def score_assay_msa_transformer(
    params,
    config: MsaTransformerConfig,
    sequence: str,
    mutants: Sequence[str],
    msa_sequences: Sequence[str],
    msa_weights: np.ndarray,
    nseq: int = 384,
    seeds: Sequence[int] = (1, 2, 3, 4, 5),
    offset_idx: int = 1,
    chunk: int = 4,
    cols_per_forward: int = 1,
) -> np.ndarray:
    """Ensemble masked-marginal scores over MSA subsample seeds
    (ref :530-542 averages the per-seed columns). ``cols_per_forward``
    > 1 opts into multi-column masking (see masked_marginal_table_msa)."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn
    from proteingym_tpu.models.esm_scoring import score_mutants_from_table

    logits_fn = stable_params_fn(apply, config)

    per_seed = []
    for seed in seeds:
        sampled = sample_msa_weighted(msa_sequences, msa_weights, nseq, seed)
        tokens = tokenize_msa(sampled)
        table = masked_marginal_table_msa(
            logits_fn, tokens, chunk=chunk, params=params,
            cols_per_forward=cols_per_forward,
        )
        per_seed.append(
            score_mutants_from_table(
                table, mutants, sequence, offset_idx=offset_idx
            )
        )
    return np.mean(np.stack(per_seed), axis=0)


# ---------------------------------------------------------------------------
# Checkpoint conversion (fairseq esm_msa1b state_dict -> pytree)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(
    state_dict, config: MsaTransformerConfig
) -> Dict[str, Any]:
    import numpy as onp

    def get(key):
        v = state_dict[key]
        return onp.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            dtype=onp.float32,
        )

    def dense(prefix):
        return {"w": jnp.asarray(get(f"{prefix}.weight").T),
                "b": jnp.asarray(get(f"{prefix}.bias"))}

    def ln(prefix):
        return {"g": jnp.asarray(get(f"{prefix}.weight")),
                "b": jnp.asarray(get(f"{prefix}.bias"))}

    pfx = ""
    if any(k.startswith("encoder.") for k in state_dict):
        pfx = "encoder."
    params: Dict[str, Any] = {
        "embed_tokens": jnp.asarray(get(f"{pfx}embed_tokens.weight")),
        "embed_positions": jnp.asarray(get(f"{pfx}embed_positions.weight")),
        "msa_position_embedding": jnp.asarray(
            get(f"{pfx}msa_position_embedding")[0]
        ),
        "emb_ln_before": ln(f"{pfx}emb_layer_norm_before"),
        "emb_ln_after": ln(f"{pfx}emb_layer_norm_after"),
        "lm_head": {
            "dense": dense(f"{pfx}lm_head.dense"),
            "ln": ln(f"{pfx}lm_head.layer_norm"),
            "bias": jnp.asarray(get(f"{pfx}lm_head.bias")),
        },
        "layers": [],
    }
    for i in range(config.num_layers):
        lp = f"{pfx}layers.{i}"
        layer = {}
        for attn, mod in (
            ("row_attn", "row_self_attention"),
            ("col_attn", "column_self_attention"),
        ):
            layer[attn] = {
                "q": dense(f"{lp}.{mod}.layer.q_proj"),
                "k": dense(f"{lp}.{mod}.layer.k_proj"),
                "v": dense(f"{lp}.{mod}.layer.v_proj"),
                "o": dense(f"{lp}.{mod}.layer.out_proj"),
                "ln": ln(f"{lp}.{mod}.layer_norm"),
            }
        layer["ffn"] = {
            "fc1": dense(f"{lp}.feed_forward_layer.layer.fc1"),
            "fc2": dense(f"{lp}.feed_forward_layer.layer.fc2"),
            "ln": ln(f"{lp}.feed_forward_layer.layer_norm"),
        }
        params["layers"].append(layer)
    return params
