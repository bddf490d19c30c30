"""ProtSSN-style structure-sequence model: PLM embeddings + EGNN readout.

The reference (ref: proteingym/baselines/protssn/compute_fitness.py,
src/models.py, src/module/egnn/) feeds frozen ESM2-650M residue embeddings
through an EGNN over a k-NN Ca graph (k in {10,20,30}, hidden in
{512,768,1280}) and reads out per-position 20-way amino-acid logits;
fitness = sum over mutated positions of log p(mt) - log p(wt), ensembled
over (k, hidden) variants.

TPU rebuild: the PLM embedding pass reuses models/esm2.py; the EGNN is the
dense-gather implementation in ops/gnn.py (no torch_geometric CUDA
scatter). Training utilities are provided so denoising-style pretraining
(ProtSSN's objective: recover the native AA at noised nodes) can run
natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.ops.gnn import (
    EgnnConfig, egnn_apply, egnn_init, egnn_readout, knn_graph,
)

AA20 = "ACDEFGHIKLMNPQRSTVWY"


@dataclasses.dataclass(frozen=True)
class ProtssnConfig:
    node_dim: int = 1280  # ESM2-650M embedding width
    hidden_dim: int = 512
    num_layers: int = 6
    k_neighbors: int = 20

    def egnn(self) -> EgnnConfig:
        return EgnnConfig(
            node_dim=self.node_dim,
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            k_neighbors=self.k_neighbors,
            update_coords=False,
            out_dim=len(AA20),
        )


def init_params(rng: jax.Array, c: ProtssnConfig) -> Dict[str, Any]:
    return egnn_init(rng, c.egnn())


def logits(
    params, c: ProtssnConfig, embeddings: jnp.ndarray, ca_coords: jnp.ndarray
) -> jnp.ndarray:
    """(L, node_dim) embeddings + (L, 3) Ca coords -> (L, 20) log-probs."""
    cfg = c.egnn()
    neighbors = knn_graph(ca_coords, cfg.k_neighbors)
    h, _ = egnn_apply(params, cfg, embeddings, ca_coords, neighbors)
    return jax.nn.log_softmax(egnn_readout(params, cfg, h), axis=-1)


def esm_embeddings(esm_params, esm_config, sequence: str) -> jnp.ndarray:
    """Final-layer residue embeddings from the ESM2 trunk (BOS/EOS trimmed)."""
    from proteingym_tpu.models import esm2

    tokens = jnp.asarray(esm2.ALPHABET.tokenize(sequence)[None])
    _, reps = esm2.apply(
        esm_params, esm_config, tokens, return_representations=True
    )
    final = reps[max(reps)]
    return final[0, 1 : 1 + len(sequence)].astype(jnp.float32)


def score_mutants(
    params,
    c: ProtssnConfig,
    embeddings: jnp.ndarray,
    ca_coords: jnp.ndarray,
    sequence: str,
    mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    """sum over mutated positions of logp[mt] - logp[wt] (MM-style readout,
    ref protssn/compute_fitness.py)."""
    table = np.asarray(logits(params, c, embeddings, ca_coords))
    aa_idx = {a: i for i, a in enumerate(AA20)}
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        for tok in m.split(":"):
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out


# ---------------------------------------------------------------------------
# Weight-compatible ProtSSN (published protssn_k{10,20,30}_h{512,768,1280}.pt)
#
# Exact rebuild of the reference pipeline: cutoff/k-NN graph with the
# 93-dim edge features (ref src/dataset/mutant_dataset.py:335-482),
# dataset-statistics normalization (ref src/utils/dataset_utils.py:161-187),
# and the EGNN_Sparse stack (ref src/module/egnn/egnn_pytorch_geometric.py:
# 98-299, config src/config/egnn.yaml: embedding=False, residual=False,
# mlp_num=2, aggr=add, update_coors=False).
# ---------------------------------------------------------------------------

AA_PROTSSN = "ARNDCQEGHILKMFPSTWYV"  # amino_acids_type order


@dataclasses.dataclass(frozen=True)
class ProtssnEgnnConfig:
    name: str = "protssn_k20_h512"
    input_dim: int = 1280        # PLM hidden size (ESM2-650M)
    m_dim: int = 512             # hidden_channels h
    n_layers: int = 6
    edge_attr_dim: int = 93
    k_neighbors: int = 20        # c_alpha_max_neighbors
    cutoff: float = 30.0
    seq_dist_cut: int = 64
    out_dim: int = 20


PROTSSN_PRESETS = {
    f"protssn_k{k}_h{h}": ProtssnEgnnConfig(
        name=f"protssn_k{k}_h{h}", m_dim=h, k_neighbors=k
    )
    for k in (10, 20, 30)
    for h in (512, 768, 1280)
}


def build_calpha_graph(
    coords: np.ndarray, k: int, cutoff: float = 30.0, seq_dist_cut: int = 64
):
    """(L, >=3, 3) N/CA/C coords -> (src, dst, edge_attr(93), pos) exactly as
    the reference builder (mutant_dataset.py:335-460): cutoff graph capped at
    k nearest (self excluded, >=1 neighbor), edge features
    [seq-dist one-hot(65), RBF(15), contact(1), local-frame orientation(12)].
    """
    n, ca, c = (coords[:, 0].astype(np.float64),
                coords[:, 1].astype(np.float64),
                coords[:, 2].astype(np.float64))
    L = len(ca)
    diff = ca[:, None] - ca[None, :]
    D = np.sqrt((diff ** 2).sum(-1))
    src_list, dst_list, dist_list = [], [], []
    for i in range(L):
        dst = list(np.where(D[i] < cutoff)[0])
        dst.remove(i)
        if k is not None and len(dst) > k:
            dst = list(np.argsort(D[i]))[1 : k + 1]
        if len(dst) == 0:
            dst = list(np.argsort(D[i]))[1:2]
        src_list.extend([i] * len(dst))
        dst_list.extend(dst)
        dist_list.extend(list(D[i, dst]))
    src = np.asarray(src_list, np.int32)
    dst = np.asarray(dst_list, np.int32)
    dist = np.asarray(dist_list)

    # local frames (u_i = N-CA, t_i = C-CA, n_i = u x t, v_i = n x u)
    def _norm(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    u_i = _norm(n - ca)
    t_i = _norm(c - ca)
    n_i = _norm(np.cross(u_i, t_i))
    v_i = np.cross(n_i, u_i)

    # seq-distance one-hot
    seq_d = np.minimum(np.abs(src - dst), seq_dist_cut)
    seq_edge = np.eye(seq_dist_cut + 1, dtype=np.float32)[seq_d]
    # 15 RBF bins (distance_featurizer, divisor=4)
    scales = np.asarray([1.5 ** x for x in range(15)])
    dist_fea = np.exp(-((dist[:, None] / 4.0) ** 2) / scales).astype(
        np.float32
    )
    contact = (dist <= 8).astype(np.float32)[:, None]
    # orientation features in the dst frame. The reference computes them
    # from the float32 CA tensor; match that rounding.
    ca32 = ca.astype(np.float32).astype(np.float64)
    basis = np.stack([n_i[dst], u_i[dst], v_i[dst]], axis=1)  # (E, 3, 3)
    p_ij = np.einsum("eij,ej->ei", basis, ca32[src] - ca32[dst])
    q_ij = np.einsum("eij,ej->ei", basis, n_i[src])
    k_ij = np.einsum("eij,ej->ei", basis, u_i[src])
    t_ij = np.einsum("eij,ej->ei", basis, v_i[src])
    ori = np.concatenate([p_ij, q_ij, k_ij, t_ij], -1).astype(np.float32)

    edge_attr = np.concatenate([seq_edge, dist_fea, contact, ori], -1)
    return src, dst, edge_attr, ca.astype(np.float32)


def apply_norm_stats(pos: np.ndarray, edge_attr: np.ndarray, stats,
                     skip_edge_attr: int = 64, safe_domi: float = 1e-10):
    """NormalizeProtein for the EGNN inputs (dataset_utils.py:179-187):
    pos centered / scaled by mean(pos_std); edge_attr[:, 64:] standardized
    (the skip boundary cuts INTO the 65-wide one-hot — reference quirk)."""
    pos = pos - pos.mean(0, keepdims=True)
    pos = pos / (float(np.mean(stats["pos_std"])) + safe_domi)
    edge_attr = edge_attr.copy()
    mean = np.asarray(stats["edge_attr_mean"], np.float32)[skip_edge_attr:]
    std = np.asarray(stats["edge_attr_std"], np.float32)[skip_edge_attr:]
    edge_attr[:, skip_edge_attr:] = (
        edge_attr[:, skip_edge_attr:] - mean
    ) / (std + safe_domi)
    return pos.astype(np.float32), edge_attr


def load_norm_stats(path) -> Dict[str, np.ndarray]:
    """Read the shipped cath_k{k}_mean_attr.pt statistics file."""
    import torch

    dic = torch.load(path, map_location="cpu", weights_only=False)
    return {k: np.asarray(v) for k, v in dic.items()}


def init_egnn_params(rng: jax.Array, c: ProtssnEgnnConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 4 * c.n_layers + 2))

    def lin(n_in, n_out):
        return {
            "w": jax.random.normal(next(keys), (n_in, n_out))
            * np.sqrt(1.0 / n_in),
            "b": jnp.zeros(n_out),
        }

    edge_in = c.edge_attr_dim + 1 + 2 * c.input_dim
    layers = []
    for _ in range(c.n_layers):
        layers.append(
            {
                "edge0": lin(edge_in, edge_in * 2),
                "edge1": lin(edge_in * 2, c.m_dim),
                "node0": lin(c.input_dim + c.m_dim, c.input_dim * 2),
                "node1": lin(c.input_dim * 2, c.input_dim),
            }
        )
    return {"layers": layers, "lin": lin(c.input_dim, c.out_dim)}


def egnn_logits(params, c: ProtssnEgnnConfig, esm_rep, pos, src, dst,
                edge_attr) -> jnp.ndarray:
    """EGNN_Sparse stack -> (L, 20) logits. feats start as the PLM reps;
    coords (already normalized) are never updated (update_coors=False)."""
    feats = jnp.asarray(esm_rep)
    pos = jnp.asarray(pos)
    edge_attr = jnp.asarray(edge_attr)
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    L = feats.shape[0]
    rel = pos[src] - pos[dst]
    rel_dist = jnp.sum(rel * rel, -1, keepdims=True)  # squared, no sqrt
    ea = jnp.concatenate([edge_attr, rel_dist], -1)

    def _lin(x, p):
        return x @ p["w"] + p["b"]

    for layer in params["layers"]:
        m = jnp.concatenate([feats[dst], feats[src], ea], -1)
        m = jax.nn.silu(_lin(m, layer["edge0"]))
        m = jax.nn.silu(_lin(m, layer["edge1"]))
        m_i = jax.ops.segment_sum(m, dst, num_segments=L)  # aggr="add" @ dst
        h = jax.nn.silu(_lin(jnp.concatenate([feats, m_i], -1),
                             layer["node0"]))
        feats = feats + _lin(h, layer["node1"])  # internal residual
    return _lin(feats, params["lin"])


def egnn_log_probs(params, c: ProtssnEgnnConfig, esm_rep, pos, src, dst,
                   edge_attr) -> jnp.ndarray:
    """log(softmax(logits) + 1e-9) (ref compute_fitness.py:64)."""
    out = egnn_logits(params, c, esm_rep, pos, src, dst, edge_attr)
    return jnp.log(jax.nn.softmax(out[:, :20], -1) + 1e-9)


def score_mutants_egnn(
    log_probs: np.ndarray, sequence: str, mutants: Sequence[str],
    offset_idx: int = 1,
) -> np.ndarray:
    """sum over sub-mutants of logp[mt]-logp[wt] in the ARNDC... order
    (ref compute_fitness.py:31-50; 'wt' rows score 0)."""
    aa_idx = {a: i for i, a in enumerate(AA_PROTSSN)}
    table = np.asarray(log_probs)
    out = np.zeros(len(mutants))
    for i, m in enumerate(mutants):
        sep = ":" if ":" in m else ";"
        for tok in m.split(sep):
            if tok.lower() == "wt":
                continue
            wt, pos, mt = tok[0], int(tok[1:-1]) - offset_idx, tok[-1]
            if sequence[pos] != wt:
                raise ValueError(f"WT mismatch in {tok}")
            out[i] += table[pos, aa_idx[mt]] - table[pos, aa_idx[wt]]
    return out


def config_from_state_dict(sd, base: ProtssnEgnnConfig) -> ProtssnEgnnConfig:
    """Infer n_layers / m_dim / input_dim from checkpoint shapes (the k
    neighbor count is not recoverable from weights — comes from ``base``)."""
    sd = {k.removeprefix("GNN_model."): v for k, v in sd.items()}
    n_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("mpnn_layes.")
    )
    return dataclasses.replace(
        base,
        n_layers=n_layers,
        m_dim=int(np.asarray(sd["mpnn_layes.0.edge_mlp.3.weight"]).shape[0]),
        input_dim=int(np.asarray(sd["lin.weight"]).shape[1]),
        out_dim=int(np.asarray(sd["lin.weight"]).shape[0]),
    )


def convert_torch_state_dict(sd, c: ProtssnEgnnConfig) -> Dict[str, Any]:
    """Map a published protssn_k{k}_h{h}.pt GNN state dict to our pytree.

    Sequential indices: edge_mlp = [Linear, Dropout/Identity, SiLU, Linear,
    SiLU]; node_mlp = [Linear, Dropout/Identity, SiLU, Linear]."""
    sd = {k.removeprefix("GNN_model."): v for k, v in sd.items()}
    c = config_from_state_dict(sd, c)

    def lin(prefix):
        return {
            "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
        }

    layers = []
    for i in range(c.n_layers):
        b = f"mpnn_layes.{i}"
        layers.append(
            {
                "edge0": lin(f"{b}.edge_mlp.0"),
                "edge1": lin(f"{b}.edge_mlp.3"),
                "node0": lin(f"{b}.node_mlp.0"),
                "node1": lin(f"{b}.node_mlp.3"),
            }
        )
    return {"layers": layers, "lin": lin("lin")}


def train_denoising(
    params,
    c: ProtssnConfig,
    embeddings: np.ndarray,
    ca_coords: np.ndarray,
    native_tokens: np.ndarray,
    steps: int = 100,
    learning_rate: float = 1e-3,
    noise_prob: float = 0.25,
    seed: int = 0,
):
    """ProtSSN-style denoising objective: predict the native AA at every
    position from (noised) embeddings + structure."""
    import optax

    cfg = c.egnn()
    neighbors = knn_graph(jnp.asarray(ca_coords), cfg.k_neighbors)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    emb = jnp.asarray(embeddings)
    coords = jnp.asarray(ca_coords)
    targets = jnp.asarray(native_tokens)

    @jax.jit
    def step_fn(params, opt_state, key):
        def loss_fn(p):
            noise = jax.random.bernoulli(key, noise_prob, (emb.shape[0], 1))
            noised = jnp.where(noise, 0.0, emb)
            h, _ = egnn_apply(p, cfg, noised, coords, neighbors)
            logp = jax.nn.log_softmax(egnn_readout(p, cfg, h), -1)
            return -jnp.mean(
                jnp.take_along_axis(logp, targets[:, None], -1)[:, 0]
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run(params, opt_state, rng):  # all steps in one lax.scan dispatch
        def body(carry, i):
            p, o = carry
            p, o, loss = step_fn(p, o, jax.random.fold_in(rng, i))
            return (p, o), loss

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        return params

    return run(params, opt_state, jax.random.PRNGKey(seed))
