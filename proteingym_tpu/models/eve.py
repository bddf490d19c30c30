"""EVE: Bayesian VAE over MSA one-hots, in functional JAX.

Semantics match the reference EVE implementation
(ref: proteingym/baselines/EVE/EVE/VAE_model.py:23-551,
VAE_encoder.py:4-88, VAE_decoder.py:5-167, default_model_params.json):

  encoder: MLP (2000-1000-300) -> z_dim=50 mean/logvar heads,
           bias init 0.1 (mean) / -10 (logvar)
  decoder: Bayesian MLP (300-1000-2000) with per-parameter (mean, logvar)
           variational weights sampled each forward; optional 1x1 output
           convolution (depth 40), optional sparsity tiles, softplus global
           temperature scaler; outputs log-softmax over (L, q)
  loss:    the reference's quirky "BCE": binary_cross_entropy_with_logits
           applied to the LOG-SOFTMAX output vs the one-hot (VAE_model.py:155)
           + KL(latent) + KL(decoder params)/Neff, with annealing warm-up
  scoring: evol_index = -( mean_ELBO(mutant) - mean_ELBO(wt) ) over
           num_samples MC draws (VAE_model.py:466-481)

TPU design: the reference's 20k-sample loop becomes ``lax.map`` over chunks
of samples inside one jit; training is a single jitted step with weighted
categorical batch sampling on device.  The decoder's per-sample weight
draws vectorize over the sample axis with vmap.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class EveConfig:
    seq_len: int
    alphabet_size: int = 20
    encoder_hidden: Tuple[int, ...] = (2000, 1000, 300)
    decoder_hidden: Tuple[int, ...] = (300, 1000, 2000)
    z_dim: int = 50
    convolve_output: bool = True
    convolution_depth: int = 40
    include_temperature_scaler: bool = True
    include_sparsity: bool = False
    num_tiles_sparsity: int = 0
    mu_bias_init: float = 0.1
    logvar_init: float = -10.0


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _xavier(key, shape):
    fan_in, fan_out = shape[1], shape[0]
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return jax.random.normal(key, shape, jnp.float32) * std


def _kaiming(key, shape):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / float(np.sqrt(shape[1]))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_params(rng: jax.Array, config: EveConfig) -> Dict[str, Any]:
    c = config
    keys = iter(jax.random.split(rng, 64))
    flat = c.seq_len * c.alphabet_size

    enc_layers = []
    in_dim = flat
    for h in c.encoder_hidden:
        enc_layers.append(
            {
                "w": _kaiming(next(keys), (h, in_dim)),
                "b": jnp.full((h,), c.mu_bias_init),
            }
        )
        in_dim = h
    encoder = {
        "layers": enc_layers,
        "mean": {
            "w": _kaiming(next(keys), (c.z_dim, in_dim)),
            "b": jnp.full((c.z_dim,), c.mu_bias_init),
        },
        "logvar": {
            "w": _kaiming(next(keys), (c.z_dim, in_dim)),
            "b": jnp.full((c.z_dim,), c.logvar_init),
        },
    }

    dec_layers = []
    in_dim = c.z_dim
    for h in c.decoder_hidden:
        dec_layers.append(
            {
                "w_mean": _kaiming(next(keys), (h, in_dim)),
                "b_mean": jnp.full((h,), c.mu_bias_init),
                "w_logvar": jnp.full((h, in_dim), c.logvar_init),
                "b_logvar": jnp.full((h,), c.logvar_init),
            }
        )
        in_dim = h
    channel = c.convolution_depth if c.convolve_output else c.alphabet_size
    decoder = {
        "layers": dec_layers,
        "w_out_mean": _xavier(next(keys), (channel * c.seq_len, in_dim)),
        "w_out_logvar": jnp.full((channel * c.seq_len, in_dim), c.logvar_init),
        "b_out_mean": jnp.full((c.seq_len * c.alphabet_size,), c.mu_bias_init),
        "b_out_logvar": jnp.full((c.seq_len * c.alphabet_size,), c.logvar_init),
    }
    if c.convolve_output:
        decoder["conv_mean"] = _kaiming(next(keys), (c.alphabet_size, channel))
        decoder["conv_logvar"] = jnp.full((c.alphabet_size, channel), c.logvar_init)
    if c.include_sparsity:
        tiles = c.decoder_hidden[-1] // c.num_tiles_sparsity
        decoder["sparsity_mean"] = jnp.zeros((tiles, c.seq_len))
        decoder["sparsity_logvar"] = jnp.full((tiles, c.seq_len), c.logvar_init)
    if c.include_temperature_scaler:
        decoder["temp_mean"] = jnp.ones((1,))
        decoder["temp_logvar"] = jnp.full((1,), c.logvar_init)

    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _sample(key, mean, logvar):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)


def encode(params, config: EveConfig, x: jnp.ndarray):
    """x: (B, L, q) one-hot -> (mu, logvar) each (B, z)."""
    h = x.reshape(x.shape[0], -1)
    for layer in params["encoder"]["layers"]:
        h = jax.nn.relu(h @ layer["w"].T + layer["b"])
    mu = h @ params["encoder"]["mean"]["w"].T + params["encoder"]["mean"]["b"]
    logvar = h @ params["encoder"]["logvar"]["w"].T + params["encoder"]["logvar"]["b"]
    return mu, logvar


def decode(params, config: EveConfig, z: jnp.ndarray, rng: jax.Array):
    """Bayesian decoder: samples weights, returns (B, L, q) log-softmax."""
    c = config
    dec = params["decoder"]
    keys = iter(jax.random.split(rng, 4 + 2 * len(dec["layers"])))
    h = z
    for layer in dec["layers"]:
        w = _sample(next(keys), layer["w_mean"], layer["w_logvar"])
        b = _sample(next(keys), layer["b_mean"], layer["b_logvar"])
        h = jax.nn.relu(h @ w.T + b)

    w_out = _sample(next(keys), dec["w_out_mean"], dec["w_out_logvar"])
    b_out = _sample(next(keys), dec["b_out_mean"], dec["b_out_logvar"])
    channel = c.convolution_depth if c.convolve_output else c.alphabet_size
    hidden = c.decoder_hidden[-1]

    if c.convolve_output:
        conv_w = _sample(next(keys), dec["conv_mean"], dec["conv_logvar"])
        # (ref VAE_decoder.py:146-148): (L*H, channel) @ (channel, q).
        # NB the reference uses .view(channel, alphabet) on an
        # (alphabet, channel) conv weight — a raw memory reinterpret, NOT a
        # transpose; converted checkpoints depend on replicating it.
        w_out = w_out.reshape(c.seq_len * hidden, channel) @ conv_w.reshape(
            channel, c.alphabet_size
        )

    if c.include_sparsity:
        sp = _sample(next(keys), dec["sparsity_mean"], dec["sparsity_logvar"])
        sp = jnp.tile(sp, (c.num_tiles_sparsity, 1))
        sp = jax.nn.sigmoid(sp)[:, :, None]  # (H, L, 1)
        w_out = w_out.reshape(hidden, c.seq_len, c.alphabet_size) * sp

    w_out = w_out.reshape(c.seq_len * c.alphabet_size, hidden)
    logits = h @ w_out.T + b_out

    if c.include_temperature_scaler:
        temp = _sample(next(keys), dec["temp_mean"], dec["temp_logvar"])
        logits = jnp.log(1.0 + jnp.exp(temp[0])) * logits

    logits = logits.reshape(-1, c.seq_len, c.alphabet_size)
    return jax.nn.log_softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Loss pieces (exact reference quirks)
# ---------------------------------------------------------------------------

def _bce_with_logits(logits, targets):
    """torch.F.binary_cross_entropy_with_logits, elementwise, no reduction."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _kld_diag_gaussians(mu, logvar, p_mu=0.0, p_logvar=0.0):
    """KL(q || p) for diagonal Gaussians (ref VAE_model.py:74-81)."""
    kld = (
        0.5 * (p_logvar - logvar)
        + 0.5 * (jnp.exp(logvar) + (mu - p_mu) ** 2) / (jnp.exp(p_logvar) + 1e-20)
        - 0.5
    )
    return jnp.sum(kld)


def kld_latent(mu, logvar):
    """Per-sequence KL(q(z|x) || N(0, I)) (ref :156)."""
    return -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)


def kld_decoder_params(params, config: EveConfig) -> jnp.ndarray:
    """KL of every decoder variational parameter vs its prior (ref :92-147)."""
    dec = params["decoder"]
    total = 0.0
    for layer in dec["layers"]:
        total += _kld_diag_gaussians(layer["w_mean"], layer["w_logvar"])
        total += _kld_diag_gaussians(layer["b_mean"], layer["b_logvar"])
    total += _kld_diag_gaussians(dec["w_out_mean"], dec["w_out_logvar"])
    total += _kld_diag_gaussians(dec["b_out_mean"], dec["b_out_logvar"])
    if config.include_sparsity:
        from scipy.special import erfinv

        logit_scale_sigma = 4.0
        logit_scale_mu = (
            2.0**0.5 * logit_scale_sigma * float(erfinv(2.0 * 0.01 - 1.0))
        )
        total += _kld_diag_gaussians(
            dec["sparsity_mean"],
            dec["sparsity_logvar"],
            logit_scale_mu,
            float(np.log(logit_scale_sigma**2)),
        )
    if config.convolve_output:
        total += _kld_diag_gaussians(dec["conv_mean"], dec["conv_logvar"])
    if config.include_temperature_scaler:
        total += _kld_diag_gaussians(dec["temp_mean"], dec["temp_logvar"])
    return total


def elbo_components(params, config: EveConfig, x, rng):
    """Per-sequence (ELBO, BCE, KLD) — ref all_likelihood_components (:466-481).

    Note the reference quirk: "BCE" is sigmoid-BCE applied to log-softmax
    outputs, not categorical cross-entropy.
    """
    k1, k2 = jax.random.split(rng)
    mu, logvar = encode(params, config, x)
    z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(k1, mu.shape)
    recon_log = decode(params, config, z, k2)
    bce = jnp.sum(
        _bce_with_logits(
            recon_log.reshape(x.shape[0], -1), x.reshape(x.shape[0], -1)
        ),
        axis=1,
    )
    kld = kld_latent(mu, logvar)
    return -(bce + kld), bce, kld


def loss_fn(params, config: EveConfig, x, rng, neff, warm_up_scale=1.0,
            kl_latent_scale=1.0, kl_global_scale=1.0):
    """Mean negative ELBO + warm-up-scaled KL terms (ref :149-163)."""
    elbo, bce, kld = elbo_components(params, config, x, rng)
    bce_mean = jnp.mean(bce)
    kld_mean = jnp.mean(kld)
    kld_params_norm = kld_decoder_params(params, config) / neff
    neg_elbo = bce_mean + warm_up_scale * (
        kl_latent_scale * kld_mean + kl_global_scale * kld_params_norm
    )
    return neg_elbo, (bce_mean, kld_mean, kld_params_norm)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def make_train_step(config: EveConfig, learning_rate=1e-4, annealing_warm_up=0,
                    grad_clip_norm: Optional[float] = None):
    opt_chain = []
    if grad_clip_norm:
        opt_chain.append(optax.clip_by_global_norm(grad_clip_norm))
    opt_chain.append(optax.adam(learning_rate))
    optimizer = optax.chain(*opt_chain)

    def train_step(params, opt_state, rng, onehot, probs, neff, step):
        """One step: weighted batch draw + ELBO grad + Adam update."""
        k_batch, k_elbo = jax.random.split(rng)
        idx = jax.random.choice(
            k_batch, onehot.shape[0], (256,), replace=True, p=probs
        )
        x = onehot[idx]
        warm = jnp.where(
            annealing_warm_up > 0,
            jnp.minimum(step / jnp.maximum(annealing_warm_up, 1), 1.0),
            1.0,
        )

        def lf(p):
            return loss_fn(p, config, x, k_elbo, neff, warm)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer.init, train_step


def train(
    matrix_onehot: np.ndarray,
    weights: np.ndarray,
    config: EveConfig,
    steps: int = 400_000,
    learning_rate: float = 1e-4,
    seed: int = 0,
    log_every: int = 0,
    steps_per_dispatch: int = 100,
):
    """Train EVE on (N, L, q) one-hots with cluster weights.

    ``steps_per_dispatch`` steps run inside ONE jitted lax.scan, so the
    params/opt-state never leave the device between host round-trips — a
    per-step Python loop ships the full ~360MB state each step on runtimes
    that materialize jit outputs (and pays a dispatch RTT regardless).
    """
    rng = jax.random.PRNGKey(seed)
    rng, init_key = jax.random.split(rng)
    params = init_params(init_key, config)
    init_opt, train_step = make_train_step(config, learning_rate)
    opt_state = init_opt(params)
    onehot = jnp.asarray(matrix_onehot, jnp.float32)
    probs = jnp.asarray(weights / weights.sum(), jnp.float32)
    neff = float(weights.sum())

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("n_steps",))
    def run_chunk(params, opt_state, rng, step0, n_steps):
        def body(carry, i):
            p, o = carry
            p, o, loss = train_step(
                p, o, jax.random.fold_in(rng, i), onehot, probs, neff,
                step0 + i,
            )
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps)
        )
        return params, opt_state, losses[-1]

    step = 0
    while step < steps:
        n = min(steps_per_dispatch, steps - step)
        rng, k = jax.random.split(rng)
        params, opt_state, loss = run_chunk(
            params, opt_state, k, jnp.asarray(step), n_steps=n
        )
        step += n
        if log_every and (step // steps_per_dispatch) % max(
            1, log_every // steps_per_dispatch
        ) == 0:
            print(f"step {step}: loss={float(loss):.3f}")
    return params


# ---------------------------------------------------------------------------
# Scoring (delta-ELBO evolutionary indices)
# ---------------------------------------------------------------------------

def mean_elbos(
    params,
    config: EveConfig,
    onehots: np.ndarray,
    num_samples: int = 20_000,
    chunk: int = 4,
    seed: int = 0,
) -> np.ndarray:
    """Mean ELBO per sequence over num_samples MC draws (ref :466-477).

    The reference loops num_samples times per batch of mutants
    (VAE_model.py:470-477), re-running the ENCODER on the same batch every
    draw even though q(z|x) is deterministic given x. Here the encoder
    and the (draw-independent) latent KL run ONCE per batch; a lax.scan
    then walks small vmapped sample chunks that only draw z-noise and
    decoder weights — identical math (mean over draws of -(BCE + KL) =
    -(mean BCE + KL)) and the same per-draw RNG stream as the old
    elbo_components-per-draw formulation, at roughly half the FLOPs.

    ``chunk`` stays small on purpose: each vmapped sample materializes a
    full copy of the sampled Bayesian decoder weights (the (L*q, hidden)
    output matrix alone is ~40 MB f32 at real EVE sizes), so
    sample-parallelism is memory-bound. THROUGHPUT COMES FROM THE BATCH
    AXIS: the per-draw decoder-weight sampling is a fixed cost amortized
    over every sequence in the batch, so callers should score all
    mutants of an assay in one call (VERDICT r4 item 3 measured ~0.14
    mut/s at batch 16 vs tens of mut/s at batch 2048 for the same code).
    """
    x = jnp.asarray(onehots, jnp.float32)
    chunk = max(1, chunk)
    n_chunks = (num_samples + chunk - 1) // chunk
    keys = jax.random.split(jax.random.PRNGKey(seed), n_chunks * chunk).reshape(
        n_chunks, chunk, -1
    )

    @jax.jit
    def total_elbo(p, xb, keys):
        mu, logvar = encode(p, config, xb)
        kld = kld_latent(mu, logvar)
        x_flat = xb.reshape(xb.shape[0], -1)

        def body(acc, keys_chunk):
            def one(key):
                k1, k2 = jax.random.split(key)
                z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                    k1, mu.shape)
                recon_log = decode(p, config, z, k2)
                return jnp.sum(
                    _bce_with_logits(
                        recon_log.reshape(xb.shape[0], -1), x_flat),
                    axis=1,
                )

            return acc + jnp.sum(jax.vmap(one)(keys_chunk), axis=0), None

        bce_total, _ = jax.lax.scan(body, jnp.zeros(xb.shape[0]), keys)
        return -(bce_total / (n_chunks * chunk) + kld)

    return np.asarray(total_elbo(params, x, keys))


def evol_indices(
    params,
    config: EveConfig,
    wt_onehot: np.ndarray,
    mut_onehots: np.ndarray,
    num_samples: int = 20_000,
    chunk: int = 4,
    seed: int = 0,
) -> np.ndarray:
    """evol_index = -(mean_ELBO(mut) - mean_ELBO(wt)) (ref :478-481).

    Higher = more deleterious (the registry flips sign at merge time,
    config.json EVE directionality = -1).
    """
    batch = np.concatenate([wt_onehot[None], mut_onehots], axis=0)
    elbos = mean_elbos(params, config, batch, num_samples, chunk, seed)
    return -(elbos[1:] - elbos[0])


def onehot_mutants(
    focus_codes: np.ndarray, mutants, alphabet: str, aa_to_idx=None
) -> np.ndarray:
    """Build (M, L, q) one-hots for mutant strings in focus coordinates."""
    from proteingym_tpu.data.mutants import parse_mutant

    if aa_to_idx is None:
        aa_to_idx = {a: i for i, a in enumerate(alphabet)}
    q = len(alphabet)
    out = np.zeros((len(mutants), len(focus_codes), q), dtype=np.float32)
    # indeterminate focus letters carry code -1 -> all-zero one-hot row
    base = np.zeros((len(focus_codes), q), dtype=np.float32)
    known = np.asarray(focus_codes) >= 0
    base[known, np.asarray(focus_codes)[known]] = 1.0
    for i, m in enumerate(mutants):
        x = base.copy()
        for f, pos, t in parse_mutant(m):
            x[pos - 1] = 0.0
            x[pos - 1, aa_to_idx[t]] = 1.0
        out[i] = x
    return out


# ---------------------------------------------------------------------------
# Checkpoint conversion (reference torch EVE -> our pytree)
# ---------------------------------------------------------------------------

def config_from_torch_checkpoint(ckpt: Dict[str, Any]) -> EveConfig:
    """Derive an EveConfig from a reference EVE checkpoint dict.

    The reference saves {'model_state_dict', 'encoder_parameters',
    'decoder_parameters', 'training_parameters'} (ref VAE_model.py:356-364);
    the clinical reference file names one such checkpoint per protein via
    its EVE_model_path column.
    """
    enc, dec = ckpt["encoder_parameters"], ckpt["decoder_parameters"]
    if enc.get("convolve_input"):
        raise NotImplementedError(
            "convolve_input encoders are not used by published EVE models"
        )
    for k in ("nonlinear_activation",):
        if enc.get(k, "relu") != "relu":
            raise NotImplementedError(f"encoder {k}={enc[k]!r} unsupported")
    for k in ("first_hidden_nonlinearity", "last_hidden_nonlinearity"):
        if dec.get(k, "relu") != "relu":
            raise NotImplementedError(f"decoder {k}={dec[k]!r} unsupported")
    sd = ckpt["model_state_dict"]
    w0 = np.asarray(sd["encoder.hidden_layers.0.weight"])
    alphabet_size = int(enc.get("alphabet_size", 20))
    seq_len = int(enc.get("seq_len", w0.shape[1] // alphabet_size))
    return EveConfig(
        seq_len=seq_len,
        alphabet_size=alphabet_size,
        encoder_hidden=tuple(enc["hidden_layers_sizes"]),
        decoder_hidden=tuple(dec["hidden_layers_sizes"]),
        z_dim=int(enc["z_dim"]),
        convolve_output=bool(dec["convolve_output"]),
        convolution_depth=int(dec.get("convolution_output_depth", 40)),
        include_temperature_scaler=bool(dec["include_temperature_scaler"]),
        include_sparsity=bool(dec["include_sparsity"]),
        num_tiles_sparsity=int(dec.get("num_tiles_sparsity", 0)),
    )


def convert_torch_state_dict(state_dict, config: EveConfig) -> Dict[str, Any]:
    """Reference EVE module names (VAE_encoder.py/VAE_decoder.py) -> pytree."""

    def get(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    c = config
    encoder = {
        "layers": [
            {
                "w": get(f"encoder.hidden_layers.{i}.weight"),
                "b": get(f"encoder.hidden_layers.{i}.bias"),
            }
            for i in range(len(c.encoder_hidden))
        ],
        "mean": {"w": get("encoder.fc_mean.weight"),
                 "b": get("encoder.fc_mean.bias")},
        "logvar": {"w": get("encoder.fc_log_var.weight"),
                   "b": get("encoder.fc_log_var.bias")},
    }
    decoder = {
        "layers": [
            {
                "w_mean": get(f"decoder.hidden_layers_mean.{i}.weight"),
                "b_mean": get(f"decoder.hidden_layers_mean.{i}.bias"),
                "w_logvar": get(f"decoder.hidden_layers_log_var.{i}.weight"),
                "b_logvar": get(f"decoder.hidden_layers_log_var.{i}.bias"),
            }
            for i in range(len(c.decoder_hidden))
        ],
        "w_out_mean": get("decoder.last_hidden_layer_weight_mean"),
        "w_out_logvar": get("decoder.last_hidden_layer_weight_log_var"),
        "b_out_mean": get("decoder.last_hidden_layer_bias_mean"),
        "b_out_logvar": get("decoder.last_hidden_layer_bias_log_var"),
    }
    if c.convolve_output:
        # torch Conv1d weight (alphabet, channel, 1); we keep the squeezed
        # (alphabet, channel) layout and reinterpret memory in decode()
        decoder["conv_mean"] = get("decoder.output_convolution_mean.weight")[..., 0]
        decoder["conv_logvar"] = get(
            "decoder.output_convolution_log_var.weight"
        )[..., 0]
    if c.include_sparsity:
        decoder["sparsity_mean"] = get("decoder.sparsity_weight_mean")
        decoder["sparsity_logvar"] = get("decoder.sparsity_weight_log_var")
    if c.include_temperature_scaler:
        decoder["temp_mean"] = get("decoder.temperature_scaler_mean")
        decoder["temp_logvar"] = get("decoder.temperature_scaler_log_var")
    return {"encoder": encoder, "decoder": decoder}


def load_torch_checkpoint(path) -> Tuple[Dict[str, Any], EveConfig]:
    """Load a reference EVE checkpoint file (torch.save format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    config = config_from_torch_checkpoint(ckpt)
    return convert_torch_state_dict(ckpt["model_state_dict"], config), config
