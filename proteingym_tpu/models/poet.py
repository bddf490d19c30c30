"""PoET: tiered autoregressive transformer over sequences-of-sequences.

Architecture parity with the reference
(ref: proteingym/baselines/PoET/poet/models/poet.py:687-1485,
poet/models/modules/transformer.py:532-720, transformer_rotary.py:71-131):

  input  [$ seq1 * $ seq2 * ... $ query *]   (one flattened token row)
  each layer (pre-LN):
    x += self_attn(norm1(x))   — WITHIN-segment causal attention, rotary
                                  positions reset per segment
    x += multi_attn(norm2(x))  — causal attention over the WHOLE
                                  sequence-of-sequences (also rotary with
                                  per-segment positions; use_multi_rotary)
    x += linear2(gelu(linear1(norm3(x))))   (linear2 zero-init)
  final LayerNorm (norm=True models) -> untied vocab head.

Alphabet (ref poet/alphabets.py Uniprot21(include_gap, include_startstop,
distinct_startstop)): 'ARNDCQEGHILKMFPSTWYV'(0-19), '-'=20, '*'=21 (start),
'$'=22 (stop), X/mask=23; O/U/B/Z map to K/C/N/Q synonyms. n_vocab=24.

Scoring (ref PoET/scripts/score.py:130-349): fitness = log p(query |
sampled family context), ensembled over weighted context samples; family
members are weight-sampled into a token budget (NeighborsSampler role).

TPU design: the reference packs variable-length segments with flash-attn
varlen CUDA kernels; here segments are described by (segment_ids,
positions) arrays and both attention tiers are dense masked attentions on
padded rows — static shapes for jit, MXU-shaped einsums, and the Pallas
fused kernel applies on the multi tier.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

POET_CHARS = "ARNDCQEGHILKMFPSTWYV"
GAP, START, STOP, MASK_X = 20, 21, 22, 23
_SYNONYM = {"O": 11, "U": 4}  # O->K, U->C; B/Z fall through to mask
# (ref alphabets.py:81-87: encoding for 'OUBZ' is [11, 4, mask, mask])


class PoetAlphabet:
    n_vocab = 24
    start_token = START
    stop_token = STOP
    pad = MASK_X  # padding reuses mask id; masked out via positions anyway

    def __init__(self):
        self.aa_to_idx = {c: i for i, c in enumerate(POET_CHARS)}

    def encode(self, seq: str) -> np.ndarray:
        out = []
        for ch in seq.upper():
            if ch in self.aa_to_idx:
                out.append(self.aa_to_idx[ch])
            elif ch == "-":
                out.append(GAP)
            else:
                out.append(_SYNONYM.get(ch, MASK_X))
        return np.asarray(out, dtype=np.int32)


ALPHABET = PoetAlphabet()

POET_PRESETS = {}  # populated below PoetConfig


@dataclasses.dataclass(frozen=True)
class PoetConfig:
    name: str = "poet_200m"
    num_layers: int = 12
    hidden_dim: int = 1024
    num_heads: int = 16
    ffn_dim: int = 4096
    n_vocab: int = 24
    final_norm: bool = True
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_dim // self.num_heads


POET_PRESETS.update({
    "poet_tiny": PoetConfig("poet_tiny", 2, 64, 4, 128),
    "poet_200m": PoetConfig("poet_200m", 12, 1024, 16, 4096),
})


def init_params(rng: jax.Array, c: PoetConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 2 + 10 * c.num_layers))

    def dense(n_in, n_out, zero=False):
        w = (
            jnp.zeros((n_in, n_out), jnp.float32)
            if zero
            else jax.random.normal(next(keys), (n_in, n_out), jnp.float32)
            * 0.02
        )
        return {"w": w, "b": jnp.zeros(n_out, jnp.float32)}

    def ln():
        return {"g": jnp.ones(c.hidden_dim, jnp.float32),
                "b": jnp.zeros(c.hidden_dim, jnp.float32)}

    params: Dict[str, Any] = {
        "token_embed": jax.random.normal(
            next(keys), (c.n_vocab, c.hidden_dim), jnp.float32
        ) * 0.02,
        "final_norm": ln() if c.final_norm else None,
        "head": dense(c.hidden_dim, c.n_vocab),
        "layers": [],
    }
    for _ in range(c.num_layers):
        layer = {
            "norm1": ln(), "norm2": ln(), "norm3": ln(),
            "self": {k: dense(c.hidden_dim, c.hidden_dim) for k in "qkvo"},
            "multi": {k: dense(c.hidden_dim, c.hidden_dim) for k in "qkvo"},
            "fc1": dense(c.hidden_dim, c.ffn_dim),
            "fc2": dense(c.ffn_dim, c.hidden_dim, zero=True),  # ref :585
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


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rope_by_positions(x, positions, base=10000.0):
    """x: (B, T, H, hd); positions: (B, T) per-segment position ids."""
    hd = x.shape[-1]
    inv = 1.0 / (base ** (np.arange(0, hd, 2) / hd))
    freqs = positions[..., None].astype(jnp.float32) * inv[None, None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, T, hd)
    cos = jnp.cos(emb)[:, :, None, :].astype(x.dtype)
    sin = jnp.sin(emb)[:, :, None, :].astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


def _masked_attention(x, p, c, positions, segment_ids=None, key_mask=None):
    """x: (B, T, D); causal attention through the shared mha dispatcher
    (grouped Pallas kernel on TPU, XLA reference elsewhere).

    With ``segment_ids`` (0 = padding): block-diagonal per-segment
    causal attention (the SELF layers). Rotary then applies INSIDE the
    kernel at global row positions — equivalent to the reference's
    per-segment positions because rotary attention only sees position
    differences and cross-segment pairs are masked
    (R(a)^T R(b) = R(b-a); ref poet/models/modules/attention.py).

    With ``key_mask`` instead (the MULTI layers, attending across
    segments), q/k are pre-rotated by the per-segment ``positions`` —
    cross-segment pairs genuinely see the tiered position scheme, so
    the rotation cannot move into the kernel."""
    b, t, d = x.shape
    h, hd = c.num_heads, c.head_dim
    q = _dense(x, p["q"]).reshape(b, t, h, hd)
    k = _dense(x, p["k"]).reshape(b, t, h, hd)
    v = _dense(x, p["v"]).reshape(b, t, h, hd)
    from proteingym_tpu.ops.flash_attention import mha

    tr = lambda z: z.transpose(0, 2, 1, 3)
    if segment_ids is not None:
        ctx = mha(
            tr(q), tr(k), tr(v), causal=True,
            segment_ids=segment_ids, rope_base=10000.0,
        )
    else:
        q = _rope_by_positions(q, positions)
        k = _rope_by_positions(k, positions)
        ctx = mha(tr(q), tr(k), tr(v), causal=True, key_mask=key_mask)
    ctx = tr(ctx).astype(x.dtype)
    return _dense(ctx.reshape(b, t, d), p["o"])


def apply(
    params,
    c: PoetConfig,
    tokens: jnp.ndarray,
    segment_ids: jnp.ndarray,
    positions: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """tokens/segment_ids/positions/valid: (B, T) -> (B, T, V) f32 logits."""
    b, t = tokens.shape
    x = params["token_embed"].astype(c.dtype)[tokens]

    # self layers: block-diagonal per-segment causal; 0 marks padding
    # (build_rows numbers segments from 0, so shift by one)
    seg_nonzero = (segment_ids.astype(jnp.int32) + 1) * valid.astype(
        jnp.int32
    )

    for layer in params["layers"]:
        x = x + _masked_attention(
            _ln(x, layer["norm1"]), layer["self"], c, positions,
            segment_ids=seg_nonzero,
        )
        x = x + _masked_attention(
            _ln(x, layer["norm2"]), layer["multi"], c, positions,
            key_mask=valid,
        )
        y = _ln(x, layer["norm3"])
        y32 = jax.nn.gelu(_dense(y, layer["fc1"]).astype(jnp.float32))
        x = x + _dense(y32.astype(x.dtype), layer["fc2"])

    if params["final_norm"] is not None:
        x = _ln(x, params["final_norm"])
    return _dense(x.astype(jnp.float32), params["head"])


# ---------------------------------------------------------------------------
# Context building + scoring
# ---------------------------------------------------------------------------

def sample_context(
    sequences: Sequence[str],
    weights: Optional[np.ndarray],
    max_tokens: int,
    seed: int,
) -> List[str]:
    """Weight-proportional family sampling into a token budget (the
    reference's NeighborsSampler role, ref poet/msa/sampling.py). Gaps are
    stripped (PoET consumes unaligned sequences)."""
    rng = np.random.default_rng(seed)
    seqs = [s.replace("-", "").replace(".", "").upper() for s in sequences]
    if weights is None:
        weights = np.ones(len(seqs))
    p = np.asarray(weights, np.float64)
    p = p / p.sum()
    order = rng.choice(len(seqs), size=len(seqs), replace=False, p=p)
    picked, used = [], 0
    for i in order:
        need = len(seqs[i]) + 2
        if used + need > max_tokens:
            continue
        picked.append(seqs[i])
        used += need
    return picked


def build_rows(
    context: Sequence[str], queries: Sequence[str]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One row per query: [start ctx1 stop | start ctx2 stop | ... |
    start query stop]. Returns (tokens, segment_ids, positions, valid,
    query_token_mask) padded to a common length."""
    ctx_toks, ctx_segs, ctx_pos = [], [], []
    for si, seq in enumerate(context):
        enc = ALPHABET.encode(seq)
        seg = np.concatenate([[START], enc, [STOP]])
        ctx_toks.append(seg)
        ctx_segs.append(np.full(len(seg), si, np.int32))
        ctx_pos.append(np.arange(len(seg), dtype=np.int32))
    base_toks = (
        np.concatenate(ctx_toks) if ctx_toks else np.zeros(0, np.int32)
    )
    base_segs = (
        np.concatenate(ctx_segs) if ctx_segs else np.zeros(0, np.int32)
    )
    base_pos = np.concatenate(ctx_pos) if ctx_pos else np.zeros(0, np.int32)

    rows, segs, poss, valids, qmasks = [], [], [], [], []
    qseg = len(context)
    for q in queries:
        enc = ALPHABET.encode(q.replace("-", ""))
        seg = np.concatenate([[START], enc, [STOP]])
        rows.append(np.concatenate([base_toks, seg]).astype(np.int32))
        segs.append(
            np.concatenate([base_segs, np.full(len(seg), qseg, np.int32)])
        )
        poss.append(
            np.concatenate([base_pos, np.arange(len(seg), dtype=np.int32)])
        )
        v = np.ones(len(rows[-1]), bool)
        valids.append(v)
        qm = np.zeros(len(rows[-1]), bool)
        qm[len(base_toks) + 1 :] = True  # predicted: residues + stop
        qmasks.append(qm)

    t = max(len(r) for r in rows)
    n = len(rows)
    tokens = np.full((n, t), MASK_X, np.int32)
    segments = np.zeros((n, t), np.int32)
    positions = np.zeros((n, t), np.int32)
    valid = np.zeros((n, t), bool)
    qmask = np.zeros((n, t), bool)
    for i in range(n):
        ln_i = len(rows[i])
        tokens[i, :ln_i] = rows[i]
        segments[i, :ln_i] = segs[i]
        positions[i, :ln_i] = poss[i]
        valid[i, :ln_i] = valids[i]
        qmask[i, :ln_i] = qmasks[i]
    return tokens, segments, positions, valid, qmask


def score_queries(
    params,
    c: PoetConfig,
    context: Sequence[str],
    queries: Sequence[str],
    batch_size: int = 8,
) -> np.ndarray:
    """log p(query | context) summed over query tokens (incl. stop)."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn
    from proteingym_tpu.models.esm_scoring import _cached_jit

    tokens, segments, positions, valid, qmask = build_rows(context, queries)
    # compile-once convention: weights flow as jit ARGUMENTS through a
    # cached block keyed on the stable per-config callable (a nested
    # @jax.jit would recompile the full PoET stack per call with the
    # weights baked in as constants)
    apply_fn = stable_params_fn(_score_apply, c)
    block = _cached_jit(apply_fn, "fwd_params")

    out = np.zeros(len(queries))
    # pad the final partial batch so every block shares one compiled shape
    for s in range(0, len(queries), batch_size):
        e = min(s + batch_size, len(queries))
        pad = batch_size - (e - s)

        def pick(arr):
            blk = arr[s:e]
            if pad:
                blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
            return jnp.asarray(blk)

        lls = block(
            params,
            (pick(tokens), pick(segments), pick(positions), pick(valid),
             pick(qmask)),
        )
        out[s:e] = np.asarray(lls)[: e - s]
    return out


def _score_apply(params, c: PoetConfig, batch):
    tok, seg, pos, val, qm = batch
    logits = apply(params, c, tok, seg, pos, val)
    logps = jax.nn.log_softmax(logits, axis=-1)
    targets = tok[:, 1:]
    ll = jnp.take_along_axis(logps[:, :-1], targets[..., None], -1)[..., 0]
    return jnp.sum(jnp.where(qm[:, 1:], ll, 0.0), axis=1)


def score_assay_poet(
    params,
    c: PoetConfig,
    mutated_sequences: Sequence[str],
    msa_sequences: Sequence[str],
    msa_weights: Optional[np.ndarray] = None,
    max_context_tokens: int = 4096,
    n_context_samples: int = 2,
    seed: int = 0,
    batch_size: int = 8,
) -> np.ndarray:
    """Ensemble over weighted context samples (ref scripts/score.py)."""
    acc = np.zeros(len(mutated_sequences))
    for s in range(n_context_samples):
        ctx = sample_context(
            msa_sequences, msa_weights, max_context_tokens, seed + s
        )
        acc += score_queries(params, c, ctx, mutated_sequences,
                             batch_size=batch_size)
    return acc / n_context_samples


def convert_torch_state_dict(state_dict, c: PoetConfig):
    """PoET checkpoint -> pytree (ref poet/models/poet.py module names:
    token_embed, decoder.layers.N.{self_attn, multihead_attn, linear1/2,
    norm1/2/3}, norm, linear)."""
    def get(key):
        v = state_dict[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32,
        )

    def dense(prefix):
        p = {"w": jnp.asarray(get(f"{prefix}.weight").T)}
        bias_key = f"{prefix}.bias"
        p["b"] = (
            jnp.asarray(get(bias_key))
            if bias_key in state_dict
            else jnp.zeros(p["w"].shape[1], jnp.float32)
        )
        return p

    def ln(prefix):
        return {"g": jnp.asarray(get(f"{prefix}.weight")),
                "b": jnp.asarray(get(f"{prefix}.bias"))}

    def attn(prefix):
        # fused in_proj or separate q/k/v projections depending on export
        if f"{prefix}.in_proj_weight" in state_dict:
            w = get(f"{prefix}.in_proj_weight")
            qw, kw, vw = np.split(w, 3, axis=0)
            bias = (
                get(f"{prefix}.in_proj_bias")
                if f"{prefix}.in_proj_bias" in state_dict
                else np.zeros(w.shape[0], np.float32)
            )
            qb, kb, vb = np.split(bias, 3)
            out = dense(f"{prefix}.out_proj")
            return {
                "q": {"w": jnp.asarray(qw.T), "b": jnp.asarray(qb)},
                "k": {"w": jnp.asarray(kw.T), "b": jnp.asarray(kb)},
                "v": {"w": jnp.asarray(vw.T), "b": jnp.asarray(vb)},
                "o": out,
            }
        return {
            "q": dense(f"{prefix}.q_proj"),
            "k": dense(f"{prefix}.k_proj"),
            "v": dense(f"{prefix}.v_proj"),
            "o": dense(f"{prefix}.out_proj"),
        }

    params = {
        "token_embed": jnp.asarray(get("token_embed.weight")),
        "final_norm": (
            ln("norm") if "norm.weight" in state_dict else None
        ),
        "head": dense("linear"),
        "layers": [],
    }
    for i in range(c.num_layers):
        lp = f"decoder.layers.{i}"
        params["layers"].append(
            {
                "norm1": ln(f"{lp}.norm1"),
                "norm2": ln(f"{lp}.norm2"),
                "norm3": ln(f"{lp}.norm3"),
                "self": attn(f"{lp}.self_attn"),
                "multi": attn(f"{lp}.multihead_attn"),
                "fc1": dense(f"{lp}.linear1"),
                "fc2": dense(f"{lp}.linear2"),
            }
        )
    return params
