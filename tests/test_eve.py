import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proteingym_tpu.models.eve import (
    EveConfig,
    _bce_with_logits,
    decode,
    elbo_components,
    encode,
    evol_indices,
    init_params,
    kld_decoder_params,
    kld_latent,
    loss_fn,
    make_train_step,
    onehot_mutants,
    train,
)

TINY = EveConfig(
    seq_len=12,
    alphabet_size=20,
    encoder_hidden=(64, 32),
    decoder_hidden=(32, 64),
    z_dim=8,
    convolution_depth=10,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(jax.random.PRNGKey(0), TINY)


def test_bce_with_logits_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    targets = (rng.random(size=(4, 10)) > 0.5).astype(np.float32)
    expected = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), reduction="none"
    ).numpy()
    got = np.asarray(_bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_encode_decode_shapes(tiny_params):
    x = jnp.asarray(np.eye(20, dtype=np.float32)[np.zeros((3, 12), int)])
    mu, logvar = encode(tiny_params, TINY, x)
    assert mu.shape == (3, 8) and logvar.shape == (3, 8)
    recon = decode(tiny_params, TINY, mu, jax.random.PRNGKey(1))
    assert recon.shape == (3, 12, 20)
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(recon)).sum(-1), 1.0, atol=1e-5
    )


def test_elbo_finite_and_kld_positive(tiny_params):
    x = jnp.asarray(np.eye(20, dtype=np.float32)[np.zeros((3, 12), int)])
    elbo, bce, kld = elbo_components(tiny_params, TINY, x, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(elbo)).all()
    assert (np.asarray(kld) >= 0).all()
    assert (np.asarray(bce) >= 0).all()
    assert float(kld_decoder_params(tiny_params, TINY)) >= 0


def test_mean_elbos_matches_per_draw_elbo_components(tiny_params):
    """The hoisted-encoder scoring path (encode + latent KL once per
    batch, only z-noise + decoder draws inside the sample loop) must
    reproduce the naive mean of per-draw elbo_components on the SAME key
    stream — the VERDICT r4 item-3 speedup is a refactor, not a
    semantics change (ref VAE_model.py:470-477 re-encodes every draw)."""
    from proteingym_tpu.models.eve import mean_elbos

    rs = np.random.RandomState(3)
    x = np.eye(20, dtype=np.float32)[rs.randint(0, 20, (5, 12))]
    num_samples, chunk, seed = 6, 2, 7
    got = mean_elbos(tiny_params, TINY, x, num_samples=num_samples,
                     chunk=chunk, seed=seed)

    keys = jax.random.split(jax.random.PRNGKey(seed), num_samples)
    naive = np.mean(
        [np.asarray(elbo_components(tiny_params, TINY, jnp.asarray(x), k)[0])
         for k in keys], axis=0)
    np.testing.assert_allclose(got, naive, rtol=1e-5, atol=1e-5)


def test_kld_latent_zero_for_standard_normal():
    mu = jnp.zeros((2, 8))
    logvar = jnp.zeros((2, 8))
    np.testing.assert_allclose(np.asarray(kld_latent(mu, logvar)), 0.0, atol=1e-7)


def test_training_reduces_loss(rng):
    # tiny MSA: two strongly conserved positions
    n = 64
    codes = np.stack(
        [
            np.where(rng.random(n) < 0.9, 0, 3),
            np.where(rng.random(n) < 0.85, 5, 7),
        ],
        axis=1,
    )
    onehot = np.eye(20, dtype=np.float32)[codes]
    config = EveConfig(
        seq_len=2, alphabet_size=20, encoder_hidden=(32,),
        decoder_hidden=(32,), z_dim=4, convolution_depth=8,
    )
    weights = np.ones(n)
    params0 = init_params(jax.random.PRNGKey(0), config)
    l0, _ = loss_fn(params0, config, jnp.asarray(onehot), jax.random.PRNGKey(9), n)
    params = train(onehot, weights, config, steps=150, learning_rate=1e-3)
    l1, _ = loss_fn(params, config, jnp.asarray(onehot), jax.random.PRNGKey(9), n)
    assert float(l1) < float(l0)


def test_evol_indices_prefer_consensus(rng):
    """After training on a conserved family, mutating away from consensus
    should get a higher (worse) evol_index than mutating toward it."""
    n, L = 128, 6
    consensus = np.array([0, 5, 10, 15, 3, 7])
    codes = np.tile(consensus, (n, 1))
    noise = rng.random((n, L)) < 0.08
    codes = np.where(noise, rng.integers(0, 20, (n, L)), codes)
    onehot = np.eye(20, dtype=np.float32)[codes]
    config = EveConfig(
        seq_len=L, alphabet_size=20, encoder_hidden=(48,),
        decoder_hidden=(48,), z_dim=6, convolution_depth=8,
    )
    params = train(onehot, np.ones(n), config, steps=400, learning_rate=1e-3)

    alphabet = "ACDEFGHIKLMNPQRSTVWY"
    wt = np.eye(20, dtype=np.float32)[consensus]
    # mutate position 1 (consensus F=5) to something else
    muts = [f"{alphabet[5]}2{alphabet[9]}", f"{alphabet[10]}3{alphabet[2]}"]
    mut_oh = onehot_mutants(consensus, muts, alphabet)
    idx = evol_indices(params, config, wt, mut_oh, num_samples=400, chunk=64)
    assert idx.shape == (2,)
    # away-from-consensus mutations are deleterious: evol_index > 0
    assert (idx > 0).all()


def test_train_step_jits(tiny_params):
    init_opt, step = make_train_step(TINY)
    opt_state = init_opt(tiny_params)
    onehot = jnp.asarray(
        np.eye(20, dtype=np.float32)[np.zeros((8, 12), int)]
    )
    probs = jnp.ones(8) / 8
    p, o, loss = jax.jit(step)(
        tiny_params, opt_state, jax.random.PRNGKey(0), onehot, probs, 8.0, 0
    )
    assert np.isfinite(float(loss))
