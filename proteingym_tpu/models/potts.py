"""Potts (EVmutation) and site-independent statistical-energy models.

Covers the reference's EVmutation baseline
(ref: proteingym/baselines/EVmutation/score_mutants.py:8-62,
calculations.py:55-179) the TPU way:

  H(x)  = sum_i h_i(x_i) + sum_{i<j} J_ij(x_i, x_j)
  score = dE = H(mutant) - H(wild type)

Instead of the per-mutant Python ``delta_hamiltonian`` loop, we precompute a
wild-type background table

  G[p, a] = h[p, a] + sum_{j != p} J[p, j, a, wt_j]        (one einsum)

after which every single mutant is a 2-gather (dE = G[p,t] - G[p,f]) and a
depth-D mutant adds D^2 pair corrections:

  dE = sum_m (G[p_m,t_m] - G[p_m,f_m])
     + sum_{m<m'} (J[t,t'] - J[t,f'] - J[f,t'] + J[f,f'])

which vectorizes over the whole assay in one jit (MXU for the precompute,
gathers for the rest).

Also includes:
  - a reader/writer for plmc-v2 ``.model`` binaries (the format consumed by
    EVcouplings' CouplingsModel; ref score_mutants.py:13 loads these)
  - ``to_independent_model`` (fields = log f_i, J = 0; ref score_mutants.py:14)
  - a weighted-frequency site-independent trainer and a pseudolikelihood
    Potts trainer so scores can be produced from MSAs alone (the reference
    depends on external plmc/C inference; SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.data.mutants import parse_mutant


@dataclasses.dataclass
class PottsModel:
    """Couplings model over an arbitrary alphabet (usually '-ACDE...')."""

    h: np.ndarray  # (L, q) fields
    J: np.ndarray  # (L, L, q, q) couplings, symmetric: J[i,j] == J[j,i].T
    alphabet: str
    index_list: np.ndarray  # (L,) positions in target-sequence numbering
    target_seq: str  # focus sequence (length L)
    f_i: Optional[np.ndarray] = None  # (L, q) single-site frequencies
    theta: float = 0.2
    neff: float = 0.0
    weights: Optional[np.ndarray] = None

    def __post_init__(self):
        self._aa_to_idx = {a: i for i, a in enumerate(self.alphabet)}
        self._pos_to_idx = {int(p): i for i, p in enumerate(self.index_list)}

    @property
    def L(self) -> int:
        return self.h.shape[0]

    @property
    def q(self) -> int:
        return self.h.shape[1]

    def encode(self, seq: str) -> np.ndarray:
        return np.asarray([self._aa_to_idx[c] for c in seq], dtype=np.int32)

    def to_independent_model(self) -> "PottsModel":
        """Fields = log f_i, couplings zeroed (EVcouplings to_independent_model;
        this is the 'Site_Independent' leaderboard entry)."""
        with np.errstate(divide="ignore"):
            h = np.log(np.maximum(self.f_i, 0))
        return PottsModel(
            h=h,
            J=np.zeros_like(self.J),
            alphabet=self.alphabet,
            index_list=self.index_list,
            target_seq=self.target_seq,
            f_i=self.f_i,
            theta=self.theta,
            neff=self.neff,
            weights=self.weights,
        )

    # -- scoring ------------------------------------------------------------

    def wt_background(self) -> np.ndarray:
        """G[p, a] = h[p, a] + sum_{j != p} J[p, j, a, wt_j]."""
        return np.asarray(
            _wt_background(jnp.asarray(self.h), jnp.asarray(self.J),
                           jnp.asarray(self.encode(self.target_seq)))
        )

    def delta_hamiltonians(
        self, mutants: Sequence[str], offset: int = 0, delim: str = ":"
    ) -> np.ndarray:
        """Batched dE for mutant strings in target-sequence numbering.

        ``offset`` is added to every mutation position before mapping into
        model coordinates (ref score_mutants.py:62 passes -(MSA_start-1)).
        Mutations at positions outside the model, or with letters outside the
        alphabet, yield NaN (ref calculations.py:62-67).
        """
        n = len(mutants)
        out = np.full(n, np.nan, dtype=np.float64)
        pos_rows, from_rows, to_rows, valid_rows, ok = self._encode_mutants(
            mutants, offset, delim
        )
        if not ok.any():
            return out
        d = _delta_hamiltonian_batch(
            jnp.asarray(self.h),
            jnp.asarray(self.J),
            jnp.asarray(self.encode(self.target_seq)),
            jnp.asarray(pos_rows[ok]),
            jnp.asarray(from_rows[ok]),
            jnp.asarray(to_rows[ok]),
            jnp.asarray(valid_rows[ok]),
        )
        out[ok] = np.asarray(d, dtype=np.float64)
        return out

    def _encode_mutants(self, mutants, offset, delim):
        max_depth = 1
        parsed = []
        for m in mutants:
            p = parse_mutant(m, delim=delim)
            parsed.append(p)
            max_depth = max(max_depth, len(p))
        n = len(mutants)
        pos = np.zeros((n, max_depth), dtype=np.int32)
        frm = np.zeros((n, max_depth), dtype=np.int32)
        to = np.zeros((n, max_depth), dtype=np.int32)
        valid = np.zeros((n, max_depth), dtype=bool)
        ok = np.ones(n, dtype=bool)
        for i, muts in enumerate(parsed):
            for j, (f, p, t) in enumerate(muts):
                p = p + offset
                if (
                    p not in self._pos_to_idx
                    or f not in self._aa_to_idx
                    or t not in self._aa_to_idx
                ):
                    ok[i] = False
                    break
                pos[i, j] = self._pos_to_idx[p]
                frm[i, j] = self._aa_to_idx[f]
                to[i, j] = self._aa_to_idx[t]
                valid[i, j] = True
        return pos, frm, to, valid, ok


@jax.jit
def _wt_background(h, J, wt):
    # G[p, a] = h[p, a] + sum_j J[p, j, a, wt_j]; the j == p diagonal
    # contributes J[p, p, a, wt_p] which is zero in plmc models
    # (no self-couplings).  One MXU einsum over the wild-type one-hot.
    onehot_wt = jax.nn.one_hot(wt, J.shape[-1], dtype=J.dtype)
    return h + jnp.einsum(
        "pjab,jb->pa", J, onehot_wt, preferred_element_type=J.dtype
    )


@jax.jit
def _delta_hamiltonian_batch(h, J, wt, pos, frm, to, valid):
    """pos/frm/to/valid: (N, D) padded mutation arrays; returns (N,) dE."""
    G = _wt_background(h, J, wt)

    g_to = G[pos, to]
    g_from = G[pos, frm]
    d_single = jnp.sum(jnp.where(valid, g_to - g_from, 0.0), axis=1)

    # pair corrections between mutated positions (m < m')
    p_i = pos[:, :, None]
    p_j = pos[:, None, :]
    jtt = J[p_i, p_j, to[:, :, None], to[:, None, :]]
    jtf = J[p_i, p_j, to[:, :, None], frm[:, None, :]]
    jft = J[p_i, p_j, frm[:, :, None], to[:, None, :]]
    jff = J[p_i, p_j, frm[:, :, None], frm[:, None, :]]
    corr = jtt - jtf - jft + jff
    pair_mask = (
        valid[:, :, None]
        & valid[:, None, :]
        & (jnp.arange(pos.shape[1])[:, None] < jnp.arange(pos.shape[1])[None, :])
    )
    d_pairs = jnp.sum(jnp.where(pair_mask, corr, 0.0), axis=(1, 2))
    return d_single + d_pairs


def hamiltonian(model: PottsModel, seq_codes: np.ndarray) -> float:
    """Full statistical energy of one encoded sequence (for tests/oracles)."""
    h, J = model.h, model.J
    L = model.L
    e = float(h[np.arange(L), seq_codes].sum())
    for i in range(L - 1):
        for j in range(i + 1, L):
            e += float(J[i, j, seq_codes[i], seq_codes[j]])
    return e


# ---------------------------------------------------------------------------
# plmc v2 binary .model IO (the EVcouplings CouplingsModel on-disk format)
# ---------------------------------------------------------------------------

def read_plmc_model(path: str | Path, precision: str = "float32") -> PottsModel:
    """Read a plmc-v2 ``.model`` binary (EVmutation's pre-trained format).

    Layout: int32[5] header (L, q, N_valid, N_invalid, num_iter);
    float[5] (theta, lambda_h, lambda_J, lambda_group, N_eff); alphabet
    chars; weights; target_seq chars; int32 index_list; f_i (L,q); h_i (L,q);
    then f_ij blocks for all i<j, then J_ij blocks for all i<j.
    """
    with open(path, "rb") as f:
        L, q, n_valid, n_invalid, _num_iter = np.fromfile(f, "int32", 5)
        theta, _lh, _lJ, _lg, neff = np.fromfile(f, precision, 5)
        alphabet = np.fromfile(f, "S1", q).astype("U1")
        weights = np.fromfile(f, precision, n_valid + n_invalid)
        target_seq = np.fromfile(f, "S1", L).astype("U1")
        index_list = np.fromfile(f, "int32", L)
        f_i = np.fromfile(f, precision, L * q).reshape(L, q)
        h_i = np.fromfile(f, precision, L * q).reshape(L, q)
        # upper-triangle (i<j) blocks in row-major pair order; one bulk read
        # per tensor instead of L*(L-1)/2 tiny fromfile calls
        iu, ju = np.triu_indices(L, k=1)
        n_pairs = iu.shape[0]

        def read_pair_tensor():
            blocks = np.fromfile(f, precision, n_pairs * q * q).reshape(
                n_pairs, q, q
            )
            out = np.zeros((L, L, q, q), dtype=np.float64)
            out[iu, ju] = blocks
            out[ju, iu] = np.transpose(blocks, (0, 2, 1))
            return out

        f_ij = read_pair_tensor()
        J_ij = read_pair_tensor()
    model = PottsModel(
        h=h_i.astype(np.float64),
        J=J_ij,
        alphabet="".join(alphabet),
        index_list=index_list,
        target_seq="".join(target_seq),
        f_i=f_i.astype(np.float64),
        theta=float(theta),
        neff=float(neff),
        weights=weights.astype(np.float64),
    )
    model._f_ij = f_ij  # kept for completeness/analysis
    return model


def write_plmc_model(
    model: PottsModel, path: str | Path, precision: str = "float32"
) -> None:
    """Inverse of :func:`read_plmc_model` (round-trip tested)."""
    L, q = model.L, model.q
    weights = (
        model.weights
        if model.weights is not None
        else np.ones(1, dtype=np.float64)
    )
    f_ij = getattr(model, "_f_ij", None)
    if f_ij is None:
        f_ij = np.zeros((L, L, q, q))
    with open(path, "wb") as f:
        np.asarray([L, q, len(weights), 0, 100], dtype="int32").tofile(f)
        np.asarray(
            [model.theta, 0.01, 0.01, 0.0, model.neff], dtype=precision
        ).tofile(f)
        np.frombuffer(model.alphabet.encode("ascii"), dtype="S1").tofile(f)
        weights.astype(precision).tofile(f)
        np.frombuffer(model.target_seq.encode("ascii"), dtype="S1").tofile(f)
        model.index_list.astype("int32").tofile(f)
        model.f_i.astype(precision).tofile(f)
        model.h.astype(precision).tofile(f)
        for i in range(L - 1):
            for j in range(i + 1, L):
                f_ij[i, j].astype(precision).tofile(f)
        for i in range(L - 1):
            for j in range(i + 1, L):
                model.J[i, j].astype(precision).tofile(f)


# ---------------------------------------------------------------------------
# Trainers (first-class, replacing external plmc; SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def train_site_independent(
    matrix: np.ndarray,
    weights: np.ndarray,
    alphabet: str,
    index_list: np.ndarray,
    target_seq: str,
    pseudocount: float = 0.5,
    theta: float = 0.2,
) -> PottsModel:
    """Weighted single-site frequency model:
    h = log((1-lam)*f + lam/q) with lam = pseudocount/Neff — a
    Jeffreys-style prior whose strength is relative to the effective
    sample size, so deep alignments stay data-driven while unobserved
    residues keep finite fields.

    matrix: (N, L) int codes over ``alphabet``; weights: (N,) cluster weights.
    """
    n, L = matrix.shape
    q = len(alphabet)
    onehot = np.eye(q, dtype=np.float64)[matrix]
    f_i = np.einsum("n,nlq->lq", weights, onehot) / weights.sum()
    f_reg = (1 - pseudocount / weights.sum()) * f_i + (
        pseudocount / weights.sum()
    ) / q
    h = np.log(f_reg)
    return PottsModel(
        h=h,
        J=np.zeros((L, L, q, q)),
        alphabet=alphabet,
        index_list=np.asarray(index_list),
        target_seq=target_seq,
        f_i=f_i,
        theta=theta,
        neff=float(weights.sum()),
        weights=weights,
    )


@jax.jit
def _plm_loss(params, onehot, weights, lambda_h, lambda_j):
    """Weighted pseudolikelihood of a Potts model with L2 regularization.

    onehot: (N, L, q). Conditional logits for site i given the rest:
    logits[n, i, :] = h[i] + sum_j J[i, j, :, x_j] with J symmetrized and
    the diagonal removed.
    """
    h, J = params["h"], params["J"]
    J = 0.5 * (J + jnp.transpose(J, (1, 0, 3, 2)))
    L = h.shape[0]
    eye = jnp.eye(L, dtype=J.dtype)
    J = J * (1.0 - eye)[:, :, None, None]
    # logits: (N, L, q) = h + einsum over neighbors
    logits = h[None] + jnp.einsum(
        "njb,ijab->nia", onehot, J, preferred_element_type=jnp.float32
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.einsum("nia,nia->n", onehot, logp)
    nll = -jnp.sum(weights * ll) / jnp.sum(weights)
    reg = lambda_h * jnp.sum(h**2) + lambda_j * 0.5 * jnp.sum(J**2)
    return nll + reg


def train_potts_plm(
    matrix: np.ndarray,
    weights: np.ndarray,
    alphabet: str,
    index_list: np.ndarray,
    target_seq: str,
    lambda_h: float = 0.01,
    lambda_j: float = 0.01,
    steps: int = 300,
    learning_rate: float = 0.05,
    theta: float = 0.2,
    seed: int = 0,
) -> PottsModel:
    """Pseudolikelihood-maximization Potts trainer (plmc equivalent) in JAX.

    Full-batch Adam on the weighted PLM objective; the hot op is the
    (N*L, q) x (L*q, L*q)-shaped coupling einsum -> MXU.  For very deep MSAs
    pass a subsampled matrix.
    """
    import optax

    n, L = matrix.shape
    q = len(alphabet)
    onehot = jnp.asarray(np.eye(q, dtype=np.float32)[matrix])
    w = jnp.asarray(weights, dtype=jnp.float32)
    params = {
        "h": jnp.zeros((L, q), jnp.float32),
        "J": jnp.zeros((L, L, q, q), jnp.float32),
    }
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: _plm_loss(p, onehot, w, lambda_h, lambda_j)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # all steps inside one jitted scan: the (L, L, q, q) couplings never
    # leave the device mid-training (a per-step Python loop pays a dispatch
    # round trip per step, and ships the full J tensor on runtimes that
    # materialize jit outputs)
    @jax.jit
    def run(params, opt_state):
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=steps
        )
        return params, opt_state, losses[-1]

    params, opt_state, loss = run(params, opt_state)

    h = np.asarray(params["h"], dtype=np.float64)
    J = np.asarray(params["J"], dtype=np.float64)
    J = 0.5 * (J + np.transpose(J, (1, 0, 3, 2)))
    J[np.arange(L), np.arange(L)] = 0.0
    onehot_np = np.eye(q)[matrix]
    f_i = np.einsum("n,nlq->lq", np.asarray(weights, dtype=np.float64), onehot_np)
    f_i /= np.asarray(weights).sum()
    return PottsModel(
        h=h,
        J=J,
        alphabet=alphabet,
        index_list=np.asarray(index_list),
        target_seq=target_seq,
        f_i=f_i,
        theta=theta,
        neff=float(np.asarray(weights).sum()),
        weights=np.asarray(weights),
    )
