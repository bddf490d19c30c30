"""Device meshes and parameter sharding rules.

The reference has no intra-model distribution beyond naive GPT-2 layer-to-
GPU pipelining (ref: tranception/model_pytorch.py:393-423) and shards work
across assays with SLURM arrays.  The TPU-native equivalents (SURVEY.md §2.4):

  - data axis:  mutant batches / masked-position chunks (vmap + pjit)
  - model axis: tensor parallelism over attention heads + FFN hidden dim,
    for >=3B models (ESM2-3B/15B, ProGen-XL class)

Shardings are expressed as PartitionSpec trees over a named Mesh; XLA
inserts the all-reduce/all-gather collectives over ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"Need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(grid, axis_names)


def default_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """All devices on the data axis (inference-scale default)."""
    devices = list(devices if devices is not None else jax.devices())
    return make_mesh(data=len(devices), model=1, devices=devices)


def esm_param_sharding(params, mesh: Mesh) -> Dict:
    """Tensor-parallel PartitionSpecs for an ESM params pytree.

    Megatron-style: q/k/v and fc1 shard their output (head/hidden) dim over
    'model'; out and fc2 shard their input dim; embeddings shard the hidden
    dim; layernorms and biases of sharded-input layers are replicated.
    """

    def layer_spec():
        return {
            "attn_ln": {"scale": P(), "bias": P()},
            "q": {"kernel": P(None, "model"), "bias": P("model")},
            "k": {"kernel": P(None, "model"), "bias": P("model")},
            "v": {"kernel": P(None, "model"), "bias": P("model")},
            "out": {"kernel": P("model", None), "bias": P()},
            "ffn_ln": {"scale": P(), "bias": P()},
            "fc1": {"kernel": P(None, "model"), "bias": P("model")},
            "fc2": {"kernel": P("model", None), "bias": P()},
        }

    spec = {
        "embed_tokens": P(None, "model"),
        "layers": [layer_spec() for _ in params["layers"]],
        "final_ln": {"scale": P(), "bias": P()},
        "lm_head": {
            "dense": {"kernel": P(None, "model"), "bias": P("model")},
            "ln": {"scale": P(), "bias": P()},
            "bias": P(),
        },
    }
    if "embed_positions" in params:
        spec["embed_positions"] = P(None, "model")
    if "emb_ln_before" in params:
        spec["emb_ln_before"] = {"scale": P(), "bias": P()}

    def checked(param, s):
        # fall back to replication when a sharded dim isn't divisible by the
        # mesh axis size (e.g. 33-entry vocab head on a model axis of 2)
        shape = getattr(param, "shape", ())
        for dim, axis in zip(shape, s):
            if axis is None:
                continue
            if dim % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map(
        checked,
        params,
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params, shardings):
    """Place a params pytree onto the mesh according to shardings."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, s), params, shardings
    )


def generic_tp_sharding(params, mesh: Mesh, min_size: int = 1 << 16):
    """Heuristic tensor-parallel shardings for any params pytree.

    2-D+ weight matrices above ``min_size`` elements shard their LARGEST
    axis over the "model" mesh axis (when divisible); everything else is
    replicated. This covers the AR zoo / Tranception / ESM-C trunks without
    per-model spec tables — the sharded dims are exactly the ffn/vocab/head
    fan-outs where TP pays (scaling-book recipe: shard the big matmul dim,
    let XLA insert the all-reduces).
    """
    tp = mesh.shape.get("model", 1)

    def spec_for(x):
        shape = getattr(x, "shape", ())
        if tp <= 1 or len(shape) < 2 or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        axis = int(np.argmax(shape))
        if shape[axis] % tp != 0:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[axis] = "model"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, params)


def mesh_from_spec(spec: str) -> Mesh:
    """Build a mesh from a CLI spec like "data=4,model=2".

    Unknown axes raise; missing axes default to 1. The product must fit the
    available devices (make_mesh validates).
    """
    axes = {"data": 1, "model": 1}
    for part in spec.split(","):
        if not part:
            continue
        key, _, val = part.partition("=")
        key = key.strip()
        if key not in axes:
            raise ValueError(
                f"Unknown mesh axis {key!r} (expected data/model)"
            )
        axes[key] = int(val)
    return make_mesh(data=axes["data"], model=axes["model"])
