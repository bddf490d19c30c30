"""CARP: ByteNet-style dilated-convolution masked protein LM.

The reference (ref: proteingym/baselines/carp_mif/compute_fitness.py, via
the external ``sequence_models`` package) scores with CARP checkpoints
(600k - 640M params) using ESM-style marginals: log p(mt) - log p(wt) at
mutated positions from either a wild-type forward or per-position masked
forwards (label_row at compute_fitness.py:13-29).

Architecture (ByteNet LM, Microsoft ByteNet adapted to proteins):
  token embedding -> N residual blocks, each
    LN -> GELU -> 1x1 conv (d -> d/2) -> LN -> GELU ->
    dilated conv k=5 (d/2 -> d/2) -> LN -> GELU -> 1x1 conv (d/2 -> d)
  with dilations cycling 1,2,4,...,128; final LN -> vocab head.
  Convolutions are NON-causal (CARP is a masked LM, not AR).

TPU design: dilated 1-D convs lower to lax.conv_general_dilated with
rhs_dilation — MXU-friendly; the masked-marginal table batches the mask
position over the batch axis as with ESM (models/esm_scoring.py).

Alphabet: sequence_models PROTEIN_ALPHABET ordering —
'ACDEFGHIKLMNPQRSTVWYBZXJOU' + specials ('-', gap; '*', mask; '#'/'@').
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# sequence_models.constants: CAN_AAS + AMB_AAS + OTHER_AAS + specials
CARP_ALPHABET = list("ACDEFGHIKLMNPQRSTVWYBZXJOU") + ["-", "*", "#", "@"]
CARP_MASK_IDX = CARP_ALPHABET.index("#")
CARP_PAD_IDX = CARP_ALPHABET.index("-")


class CarpTokenizer:
    mask_idx = CARP_MASK_IDX
    pad_idx = CARP_PAD_IDX

    def __init__(self):
        self.tok_to_idx = {t: i for i, t in enumerate(CARP_ALPHABET)}

    def get_idx(self, c: str) -> int:
        return self.tok_to_idx.get(c, self.tok_to_idx["X"])

    def encode(self, seq: str) -> np.ndarray:
        return np.asarray([self.get_idx(c) for c in seq], dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class CarpConfig:
    name: str = "carp_640M"
    num_layers: int = 56
    embed_dim: int = 1280
    kernel_size: int = 5
    max_dilation: int = 128
    vocab_size: int = 30
    dtype: Any = jnp.bfloat16


CARP_PRESETS = {
    "carp_600k": CarpConfig("carp_600k", 16, 128),
    "carp_38M": CarpConfig("carp_38M", 16, 1024),
    "carp_76M": CarpConfig("carp_76M", 32, 1024),
    "carp_640M": CarpConfig("carp_640M", 56, 1280),
}


def _dilation_schedule(c: CarpConfig):
    out = []
    d = 1
    for _ in range(c.num_layers):
        out.append(d)
        d *= 2
        if d > c.max_dilation:
            d = 1
    return out


def init_params(rng: jax.Array, c: CarpConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 2 + 3 * c.num_layers))
    d, dh = c.embed_dim, c.embed_dim // 2

    def dense(key, n_in, n_out):
        return {
            "w": jax.random.normal(key, (n_in, n_out), jnp.float32)
            * np.sqrt(2.0 / n_in),
            "b": jnp.zeros(n_out, jnp.float32),
        }

    def conv(key):
        return {
            "w": jax.random.normal(key, (c.kernel_size, dh, dh), jnp.float32)
            * np.sqrt(2.0 / (c.kernel_size * dh)),
            "b": jnp.zeros(dh, jnp.float32),
        }

    def ln(dim):
        return {"g": jnp.ones(dim, jnp.float32), "b": jnp.zeros(dim, jnp.float32)}

    params: Dict[str, Any] = {
        "embed": jax.random.normal(next(keys), (c.vocab_size, d), jnp.float32)
        * 0.02,
        "final_ln": ln(d),
        "head": dense(next(keys), d, c.vocab_size),
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "ln1": ln(d), "down": dense(next(keys), d, dh),
                "ln2": ln(dh), "conv": conv(next(keys)),
                "ln3": ln(dh), "up": dense(next(keys), dh, d),
            }
        )
    return params


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    return (x @ p["w"].astype(x.dtype) + p["b"]).astype(x.dtype)


def _dilated_conv(x, p, dilation: int):
    """(B, T, C) non-causal dilated conv, SAME padding."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        p["w"].astype(jnp.float32),
        window_strides=(1,),
        padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return (y + p.get("b", 0.0)).astype(x.dtype)


def apply(params, c: CarpConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, T, V) f32 logits."""
    x = params["embed"].astype(c.dtype)[tokens]
    gelu = jax.nn.gelu
    for layer, dilation in zip(params["layers"], _dilation_schedule(c)):
        y = gelu(_ln(x, layer["ln1"]))
        y = _dense(y, layer["down"])
        y = gelu(_ln(y, layer["ln2"]))
        y = _dilated_conv(y, layer["conv"], dilation)
        y = gelu(_ln(y, layer["ln3"]))
        y = _dense(y, layer["up"])
        x = x + y
    x = _ln(x, params["final_ln"])
    return _dense(x.astype(jnp.float32), params["head"])


def score_assay(
    params,
    c: CarpConfig,
    sequence: str,
    mutants: Sequence[str],
    strategy: str = "masked-marginals",
    chunk: int = 16,
    offset_idx: int = 1,
) -> np.ndarray:
    """Marginal scoring (ref compute_fitness.py label_row; note the
    reference DIVIDES by the number of mutated positions, unlike ESM)."""
    from proteingym_tpu.models.ar_scoring import stable_params_fn
    from proteingym_tpu.models.esm_scoring import _cached_jit

    tok = CarpTokenizer()
    tokens = tok.encode(sequence)
    # converted zenodo checkpoints carry an op program ("blocks")
    base_apply = apply_converted if "blocks" in params else apply
    apply_fn = stable_params_fn(base_apply, c)

    if strategy == "wt-marginals":
        logits = _cached_jit(apply_fn, "fwd_params")(
            params, jnp.asarray(tokens[None])
        )
        table = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), -1)[0]
        )
    else:
        total = len(tokens)
        rows = np.tile(tokens[None], (total, 1))
        rows[np.arange(total), np.arange(total)] = tok.mask_idx
        n_pad = ((total + chunk - 1) // chunk) * chunk
        if n_pad != total:
            rows = np.concatenate([rows, np.tile(tokens[None], (n_pad - total, 1))])
        rows_j = rows.reshape(n_pad // chunk, chunk, total)
        offs = np.concatenate(
            [np.arange(total), np.zeros(n_pad - total)]
        ).astype(np.int32).reshape(n_pad // chunk, chunk)

        step = _cached_jit(apply_fn, "step_params")
        parts = [
            step(params, jnp.asarray(rows_j[i]), jnp.asarray(offs[i]))
            for i in range(rows_j.shape[0])
        ]
        table = np.asarray(jnp.concatenate(parts, 0)[:total])

    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        toks = m.split(":")
        for t in toks:
            wt, pos, mt = t[0], int(t[1:-1]) - offset_idx, t[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {t}")
            out[i] += table[pos, tok.get_idx(mt)] - table[pos, tok.get_idx(wt)]
        out[i] /= len(toks)  # ref label_row averages over positions
    return out


# ---------------------------------------------------------------------------
# Converter for published zenodo carp_*.pt checkpoints (sequence_models
# ByteNetLM layout: embedder.embedder -> embedder.up_embedder ->
# embedder.layers.N.{sequence1, conv, sequence2} -> last_norm -> decoder).
#
# sequence_models is not installed and not vendored, so instead of
# hard-coding the Sequential composition the converter RECONSTRUCTS the op
# program per block from the checkpoint's own parameter shapes: 1-D
# weights are LayerNorms (followed by the activation), 3-D (out,in,1)
# weights are position feed-forwards, 3-D (out,in,k>1) weights are the
# dilated convolution. `apply_converted` then executes that program, so a
# layout variant changes the program, not silently the math.
# ---------------------------------------------------------------------------

def _seq_ops(sd, prefix):
    """Rebuild a nn.Sequential's op list from parameter shapes. Each op is
    a dict whose KEYS encode the kind (pytree-static, jit-safe): an "ln"
    entry is a LayerNorm (the Sequential's activation follows it), a 2-D
    "w" entry is a position feed-forward."""
    import re as _re

    idxs = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := _re.match(rf"{_re.escape(prefix)}\.(\d+)\.", k))
        }
    )
    ops = []
    for j in idxs:
        wk = None
        for cand in (f"{prefix}.{j}.weight", f"{prefix}.{j}.conv.weight"):
            if cand in sd:
                wk = cand
                break
        if wk is None:
            continue
        w = np.asarray(sd[wk], np.float32)
        bk = wk.replace("weight", "bias")
        b = np.asarray(sd[bk], np.float32) if bk in sd else None
        if w.ndim == 1:  # LayerNorm (+ activation after it)
            ln = {"g": jnp.asarray(w),
                  "b": jnp.asarray(b) if b is not None
                  else jnp.zeros_like(jnp.asarray(w))}
            ops.append({"ln": ln})
        elif w.ndim == 3 and w.shape[-1] == 1:  # PositionFeedForward (1x1)
            p = {"w": jnp.asarray(w[..., 0].T)}
            if b is not None:
                p["b"] = jnp.asarray(b)
            ops.append(p)
        elif w.ndim == 2:  # plain Linear PFF variant
            p = {"w": jnp.asarray(w.T)}
            if b is not None:
                p["b"] = jnp.asarray(b)
            ops.append(p)
        else:
            raise ValueError(
                f"unexpected parameter shape {w.shape} at {wk}"
            )
    return ops


def convert_torch_state_dict(sd, c: CarpConfig):
    """zenodo carp_*.pt `model_state_dict` -> op-program pytree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def arr(k):
        v = sd[k]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32,
        )

    params: Dict[str, Any] = {
        "embed": jnp.asarray(arr("embedder.embedder.weight")),
        "blocks": [],
    }
    for cand in ("embedder.up_embedder.conv.weight",
                 "embedder.up_embedder.weight"):
        if cand in sd:
            w = arr(cand)
            params["up"] = {
                "w": jnp.asarray(w[..., 0].T if w.ndim == 3 else w.T)
            }
            bk = cand.replace("weight", "bias")
            if bk in sd:
                params["up"]["b"] = jnp.asarray(arr(bk))
            break
    import re as _re

    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := _re.match(r"embedder\.layers\.(\d+)\.", k))
    )
    for i in range(n_layers):
        base = f"embedder.layers.{i}"
        block = {
            "pre": _seq_ops(sd, f"{base}.sequence1"),
            "conv": None,
            "post": _seq_ops(sd, f"{base}.sequence2"),
        }
        for cand in (f"{base}.conv.conv.weight", f"{base}.conv.weight"):
            if cand in sd:
                w = arr(cand)
                block["conv"] = {
                    "w": jnp.asarray(np.transpose(w, (2, 1, 0)))
                }
                bk = cand.replace("weight", "bias")
                if bk in sd:
                    block["conv"]["b"] = jnp.asarray(arr(bk))
                break
        if block["conv"] is None:
            raise KeyError(f"no conv weight under {base}")
        params["blocks"].append(block)
    if "last_norm.weight" in sd:
        params["final_ln"] = {"g": jnp.asarray(arr("last_norm.weight")),
                              "b": jnp.asarray(arr("last_norm.bias"))}
    for cand in ("decoder.conv.weight", "decoder.weight"):
        if cand in sd:
            w = arr(cand)
            params["head"] = {
                "w": jnp.asarray(w[..., 0].T if w.ndim == 3 else w.T)
            }
            bk = cand.replace("weight", "bias")
            if bk in sd:
                params["head"]["b"] = jnp.asarray(arr(bk))
            break
    return params


def _run_ops(x, ops):
    for op in ops:
        if "ln" in op:  # LayerNorm followed by the block activation (gelu)
            x = _ln(x, op["ln"])
            x = jax.nn.gelu(x.astype(jnp.float32)).astype(x.dtype)
        else:  # position feed-forward
            x = x @ op["w"].astype(x.dtype) + op.get("b", 0.0)
    return x


def apply_converted(params, c: CarpConfig, tokens: jnp.ndarray
                    ) -> jnp.ndarray:
    """Run a converted ByteNetLM op program: (B, T) -> (B, T, V) logits."""
    x = params["embed"].astype(c.dtype)[tokens]
    if "up" in params:
        x = x @ params["up"]["w"].astype(x.dtype) + params["up"].get(
            "b", 0.0)
    # Schedule depth follows the CHECKPOINT's block count, not the preset's
    # num_layers — a mismatched preset would otherwise silently truncate.
    sched = _dilation_schedule(
        dataclasses.replace(c, num_layers=len(params["blocks"]))
    )
    for block, dilation in zip(params["blocks"], sched):
        y = _run_ops(x, block["pre"])
        y = _dilated_conv(y, block["conv"], dilation)
        y = _run_ops(y, block["post"])
        x = x + y
    if "final_ln" in params:
        x = _ln(x, params["final_ln"])
    x = x.astype(jnp.float32)
    return x @ params["head"]["w"] + params["head"].get("b", 0.0)
