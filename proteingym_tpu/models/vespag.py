"""VespaG: per-residue substitution-landscape heads over PLM embeddings.

Weight-compatible JAX ports of the reference's vendored VespaG models
(ref: proteingym/baselines/vespag/vespag/models/fnn.py:26-51,
cnn.py:33-131, models/utils.py:6-36 construct_fnn):

  - ``FNN``        Linear stack with LeakyReLU between layers (the
                   published VespaG checkpoint: hidden [256], ESM2-3B
                   2560-d embeddings, ref utils/utils.py:17-21
                   DEFAULT_MODEL_PARAMETERS)
  - ``MinimalCNN`` Conv1d(k=7, pad=3) -> LeakyReLU -> dense stack
  - ``CombinedCNN`` parallel MinimalCNN + FNN branches concatenated into a
                   shared dense stack

Scoring follows the reference predict path exactly
(ref vespag/runner/predict.py:177-186, utils/mutations.py:69-80,95-115):
the (L, 20) landscape has wild-type entries zeroed (mask_non_mutations),
a mutant's score is the SUM over its SAVs of y[pos][to_aa], and the
default pipeline applies a sigmoid (normalize=True).

A distillation trainer is kept for the no-checkpoint path: the head can
be trained against any teacher landscape (the native GEMME implementation
supplies one), which is how VespaG itself was trained (GEMME-annotated
UniProt sequences).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.data.mutants import is_wt_row

AA20 = "ACDEFGHIKLMNPQRSTVWY"
LEAKY_SLOPE = 0.01  # torch.nn.LeakyReLU default negative_slope


@dataclasses.dataclass(frozen=True)
class VespagArchConfig:
    """Sidecar config for converted checkpoints (params pytrees are saved
    without the 'arch' string leaf; it rides in config.json)."""

    arch: str = "fnn"


# ---------------------------------------------------------------------------
# Weight-compatible architectures
# ---------------------------------------------------------------------------

def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _dense_stack(layers: List[Dict], x, final_activation: bool):
    """construct_fnn semantics (ref models/utils.py:6-36): LeakyReLU
    between layers; trailing activation only when the torch module was
    built with an output_activation_function."""
    for i, lyr in enumerate(layers):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(layers) - 1 or final_activation:
            x = _leaky(x)
    return x


def fnn_apply(params: Dict, emb: jnp.ndarray) -> jnp.ndarray:
    """(L, D) embeddings -> (L, 20) landscape (ref models/fnn.py:46-51)."""
    return _dense_stack(params["net"], emb, final_activation=False)


def _conv1d(w, b, x):
    """torch Conv1d over a (L, D) sequence; w: (O, I, K) torch layout."""
    k = w.shape[-1]
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x[None],  # (1, L, D)
        jnp.transpose(w, (2, 1, 0)),  # (K, I, O)
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    return out + b


def minimal_cnn_apply(params: Dict, emb: jnp.ndarray,
                      final_activation: bool = False) -> jnp.ndarray:
    """(L, D) -> (L, out) (ref models/cnn.py:69-75): Conv1d + LeakyReLU,
    then the dense stack."""
    x = _leaky(_conv1d(params["conv"]["w"], params["conv"]["b"], emb))
    return _dense_stack(params["fnn"], x, final_activation=final_activation)


def combined_cnn_apply(params: Dict, emb: jnp.ndarray) -> jnp.ndarray:
    """Parallel conv + dense branches -> shared stack
    (ref models/cnn.py:127-131). Both branches end in a LeakyReLU
    (output_activation_function=activation_function, :105-121)."""
    conv_out = minimal_cnn_apply(params["conv"], emb, final_activation=True)
    fnn_out = _dense_stack(params["fnn"], emb, final_activation=True)
    x = jnp.concatenate([conv_out, fnn_out], axis=-1)
    return _dense_stack(params["combined"], x, final_activation=False)


def apply(params: Dict, emb: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on converted-params architecture."""
    arch = params.get("arch", "fnn") if isinstance(params, dict) else "fnn"
    if arch == "fnn":
        return fnn_apply(params, emb)
    if arch == "cnn":
        return minimal_cnn_apply(params, emb)
    if arch == "combined":
        return combined_cnn_apply(params, emb)
    raise ValueError(f"Unknown VespaG architecture {arch!r}")


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict) -> Dict:
    """Convert a VespaG torch state_dict (FNN / MinimalCNN / CombinedCNN)
    to our params pytree, detecting the architecture from key layout
    (``net.N.*`` / ``conv.0.*`` + ``fnn.N.*`` / ``conv.conv.0.*``)."""

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    keys = set(state_dict)

    def stack(prefix):
        idx = sorted(
            {int(k[len(prefix) + 1:].split(".")[0])
             for k in keys if k.startswith(prefix + ".")}
        )
        return [
            {"w": arr(state_dict[f"{prefix}.{i}.weight"]).T,
             "b": arr(state_dict[f"{prefix}.{i}.bias"])}
            for i in idx
        ]

    if any(k.startswith("net.") for k in keys):
        return {"arch": "fnn", "net": stack("net")}
    if any(k.startswith("conv.conv.") for k in keys):
        return {
            "arch": "combined",
            "conv": {
                "conv": {"w": arr(state_dict["conv.conv.0.weight"]),
                         "b": arr(state_dict["conv.conv.0.bias"])},
                "fnn": stack("conv.fnn"),
            },
            "fnn": stack("fnn"),
            "combined": stack("combined"),
        }
    if any(k.startswith("conv.") for k in keys):
        return {
            "arch": "cnn",
            "conv": {"w": arr(state_dict["conv.0.weight"]),
                     "b": arr(state_dict["conv.0.bias"])},
            "fnn": stack("fnn"),
        }
    raise ValueError(
        f"Unrecognized VespaG state_dict layout: {sorted(keys)[:5]}..."
    )


# ---------------------------------------------------------------------------
# Reference scoring semantics
# ---------------------------------------------------------------------------

def mask_non_mutations(landscape: np.ndarray, wt_seq: str) -> np.ndarray:
    """Zero the wild-type entry at every position
    (ref utils/mutations.py:69-80)."""
    out = np.asarray(landscape, np.float32).copy()
    idx = [AA20.index(a) for a in wt_seq]
    out[np.arange(len(wt_seq)), idx] = 0.0
    return out


def score_mutants_reference(
    landscape: np.ndarray,
    wt_seq: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
    normalize: bool = True,
) -> np.ndarray:
    """Reference scoring: masked landscape, score = sum over SAVs of
    y[pos][to_aa], sigmoid when normalize (ref predict.py:181-186,
    mutations.py:95-115; the ProteinGym eval runs normalize=True)."""
    y = mask_non_mutations(landscape, wt_seq)
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            s = 0.0
        else:
            s = 0.0
            for tok in m.split(":"):
                wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
                if wt_seq[pos] != wt:
                    raise ValueError(f"WT mismatch in {tok}")
                s += y[pos, aa_idx[mt]]
        out[i] = 1.0 / (1.0 + np.exp(-s)) if normalize else s
    return out


# ---------------------------------------------------------------------------
# Distillation path (no-checkpoint fallback) — legacy API kept
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VespagConfig:
    embed_dim: int = 1280  # ESM2-650M
    hidden_dim: int = 256


def init_params(rng: jax.Array, c: VespagConfig) -> Dict:
    """Random FNN params in the weight-compatible layout (hidden [256],
    kaiming a=1e-2 like ref fnn.py:44-46)."""
    k1, k2 = jax.random.split(rng)
    gain = np.sqrt(2.0 / (1 + 1e-2 ** 2))
    return {
        "arch": "fnn",
        "net": [
            {"w": jax.random.normal(k1, (c.embed_dim, c.hidden_dim),
                                    jnp.float32)
             * gain / np.sqrt(c.embed_dim),
             "b": jnp.zeros(c.hidden_dim, jnp.float32)},
            {"w": jax.random.normal(k2, (c.hidden_dim, 20), jnp.float32)
             * gain / np.sqrt(c.hidden_dim),
             "b": jnp.zeros(20, jnp.float32)},
        ],
    }


def landscape(params, embeddings: jnp.ndarray) -> jnp.ndarray:
    """(L, D) embeddings -> (L, 20) predicted substitution landscape."""
    return apply(params, embeddings)


def train_from_teacher(
    params,
    embeddings: np.ndarray,
    teacher: np.ndarray,
    steps: int = 300,
    learning_rate: float = 1e-3,
):
    """Distill a teacher landscape (e.g. GEMME's combined table)."""
    import optax

    emb = jnp.asarray(embeddings, jnp.float32)
    target = jnp.asarray(teacher, jnp.float32)
    optimizer = optax.adam(learning_rate)
    # don't mutate the caller's dict; train whichever architecture the
    # params carry (apply dispatches on 'arch')
    arch = params.get("arch", "fnn")
    net = {k: v for k, v in params.items() if k != "arch"}
    opt_state = optimizer.init(net)

    def step(net, opt_state):
        def loss_fn(p):
            return jnp.mean((apply({**p, "arch": arch}, emb) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    @jax.jit
    def run(net, opt_state):  # all steps in one dispatch (one lax.scan)
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o)
            return (p, o), loss

        (net, opt_state), _ = jax.lax.scan(
            body, (net, opt_state), None, length=steps
        )
        return net

    out = dict(run(net, opt_state))
    out["arch"] = arch
    return out


def score_mutants(
    params,
    embeddings: np.ndarray,
    wt_seq: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    """Delta-landscape scoring used by the distilled (teacher) path:
    score = sum of table[pos, mt] - table[pos, wt]. With wild-type
    entries masked this equals the reference's summed y[pos][to_aa]."""
    table = np.asarray(apply(params, jnp.asarray(embeddings, jnp.float32)))
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        if is_wt_row(m):
            continue
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if wt_seq[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out
