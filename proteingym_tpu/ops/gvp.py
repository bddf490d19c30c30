"""Geometric Vector Perceptron (GVP) ops for inverse-folding models.

Native replacement for the reference's vendored GVP modules
(ref: proteingym/baselines/esm/esm/inverse_folding/gvp_modules.py, 475
LoC torch). A GVP transforms a tuple (s, V) of scalar features (n,) and
vector features (v, 3):

  V' = W_h V                    (vector channel mixing, rotation-equivariant)
  s' = act(W_s [s ; ||V'||])    (scalars see vector norms — invariants)
  V'' = V_out * sigmoid(gate)   (vector gating by scalars)

Message passing runs over a k-NN graph with edge features (RBF distances,
unit direction vectors) — dense (L, K, .) gathers as in ops/gnn.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _norm(v, eps=1e-8):
    """(..., v, 3) -> (..., v) safe norms."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def gvp_init(key, s_in, v_in, s_out, v_out, vector_gate=True):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = max(v_in, v_out)
    p = {
        "wh": jax.random.normal(k1, (v_in, h), jnp.float32) / np.sqrt(v_in or 1),
        "wv": jax.random.normal(k2, (h, v_out), jnp.float32) / np.sqrt(h or 1),
        "ws": {
            "w": jax.random.normal(k3, (s_in + h, s_out), jnp.float32)
            / np.sqrt(s_in + h),
            "b": jnp.zeros(s_out, jnp.float32),
        },
    }
    if vector_gate and v_out:
        p["gate"] = {
            "w": jax.random.normal(k4, (s_out, v_out), jnp.float32)
            / np.sqrt(s_out),
            "b": jnp.zeros(v_out, jnp.float32),
        }
    return p


def gvp_apply(p, s, v, activate=True):
    """s: (..., s_in); v: (..., v_in, 3) -> (s_out, v_out)."""
    vh = jnp.einsum("...vc,vh->...hc", v, p["wh"])  # (..., h, 3)
    s_cat = jnp.concatenate([s, _norm(vh)], axis=-1)
    s_out = s_cat @ p["ws"]["w"] + p["ws"]["b"]
    if activate:
        s_out = jax.nn.relu(s_out)
    v_out = jnp.einsum("...hc,ho->...oc", vh, p["wv"])
    if "gate" in p:
        gate = jax.nn.sigmoid(s_out @ p["gate"]["w"] + p["gate"]["b"])
        v_out = v_out * gate[..., None]
    return s_out, v_out


# ---------------------------------------------------------------------------
# Backbone geometric features (ref inverse_folding/features.py role)
# ---------------------------------------------------------------------------

def backbone_node_features(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(L, 4, 3) N/Ca/C/O -> scalar (L, 6) dihedral sin/cos, vector (L, 3, 3)
    orientation features (forward, backward, sidechain-ish directions)."""
    n, ca, c = coords[:, 0], coords[:, 1], coords[:, 2]
    L = coords.shape[0]

    def dihedral(p0, p1, p2, p3):
        b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
        b1n = b1 / (np.linalg.norm(b1, axis=-1, keepdims=True) + 1e-8)
        v = b0 - (b0 * b1n).sum(-1, keepdims=True) * b1n
        w = b2 - (b2 * b1n).sum(-1, keepdims=True) * b1n
        x = (v * w).sum(-1)
        y = (np.cross(b1n, v) * w).sum(-1)
        return np.arctan2(y, x)

    # phi, psi, omega over the chain (padded at ends)
    phi = np.zeros(L)
    psi = np.zeros(L)
    omega = np.zeros(L)
    if L > 1:
        phi[1:] = dihedral(c[:-1], n[1:], ca[1:], c[1:])
        psi[:-1] = dihedral(n[:-1], ca[:-1], c[:-1], n[1:])
        omega[1:] = dihedral(ca[:-1], c[:-1], n[1:], ca[1:])
    scalars = np.stack(
        [np.sin(phi), np.cos(phi), np.sin(psi), np.cos(psi),
         np.sin(omega), np.cos(omega)], -1,
    ).astype(np.float32)

    def unit(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    fwd = np.zeros((L, 3))
    bwd = np.zeros((L, 3))
    fwd[:-1] = unit(ca[1:] - ca[:-1])
    bwd[1:] = unit(ca[:-1] - ca[1:])
    side = unit(np.cross(n - ca, c - ca))  # imputed Cb-ish direction
    vectors = np.stack([fwd, bwd, side], 1).astype(np.float32)
    return scalars, vectors


def backbone_edge_features(
    coords: np.ndarray, e_idx: np.ndarray, num_rbf: int = 16
) -> Tuple[np.ndarray, np.ndarray]:
    """Edge scalars: RBF(Ca dist) + sinusoidal seq offset; edge vectors:
    unit Ca->Ca direction. e_idx: (L, K)."""
    ca = coords[:, 1]
    L, K = e_idx.shape
    rel = ca[e_idx] - ca[:, None]  # (L, K, 3)
    d = np.linalg.norm(rel, axis=-1)
    mu = np.linspace(0.0, 20.0, num_rbf)
    sigma = 20.0 / num_rbf
    rbf = np.exp(-(((d[..., None] - mu) / sigma) ** 2))
    offset = (e_idx - np.arange(L)[:, None]).astype(np.float32)
    pos_feat = np.stack(
        [np.sin(offset / 10.0), np.cos(offset / 10.0),
         np.clip(offset, -32, 32) / 32.0], -1,
    )
    scalars = np.concatenate([rbf, pos_feat], -1).astype(np.float32)
    vectors = (rel / (d[..., None] + 1e-8))[:, :, None, :].astype(np.float32)
    return scalars, vectors  # (L, K, num_rbf+3), (L, K, 1, 3)
