import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proteingym_tpu.models.esm2 import ALPHABET, EsmConfig, apply, init_params
from proteingym_tpu.parallel.mesh import (
    esm_param_sharding,
    make_mesh,
    shard_params,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=4, model=2)


def test_sharded_forward_matches_single_device(mesh8):
    config = EsmConfig(
        name="tiny", num_layers=2, embed_dim=128, num_heads=4, dtype=jnp.float32
    )
    params = init_params(jax.random.PRNGKey(0), config)
    toks = jnp.asarray(
        np.stack([ALPHABET.tokenize("MKLVAGDEFWHC", pad_to=16) for _ in range(8)])
    )
    expected = apply(params, config, toks)

    shardings = esm_param_sharding(params, mesh8)
    sharded = shard_params(params, shardings)
    from jax.sharding import NamedSharding, PartitionSpec as P

    toks_sharded = jax.device_put(toks, NamedSharding(mesh8, P("data", None)))
    with mesh8:
        got = jax.jit(lambda p, t: apply(p, config, t))(sharded, toks_sharded)
    np.testing.assert_allclose(np.asarray(expected), np.asarray(got), atol=1e-4)


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8
    assert np.isfinite(np.asarray(out)).all()
