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


def test_tensor_parallel_masked_marginal_scoring(mesh8):
    """End-to-end TP scoring: the full masked-marginal table + mutant
    scoring runs with params sharded over the model axis (the path that
    fits ESM2-15B-class checkpoints across chips) and matches the
    single-device result."""
    from proteingym_tpu.models.esm2 import make_apply_fn
    from proteingym_tpu.models.esm_scoring import (
        masked_marginal_table, score_mutants_from_table,
    )

    config = EsmConfig(
        name="tp_tiny", num_layers=2, embed_dim=128, num_heads=4,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(1), config)
    seq = "MKLVAGDEFWHCRTYP"
    mutants = [f"{seq[p]}{p + 1}A" for p in range(len(seq)) if seq[p] != "A"]
    tokens = ALPHABET.tokenize(seq)
    fn = make_apply_fn(config)

    expected_table = masked_marginal_table(fn, tokens, chunk=8, params=params)
    expected = score_mutants_from_table(expected_table, mutants, seq)

    sharded = shard_params(params, esm_param_sharding(params, mesh8))
    with mesh8:
        table = masked_marginal_table(fn, tokens, chunk=8, params=sharded)
        got = score_mutants_from_table(table, mutants, seq)
    np.testing.assert_allclose(expected, got, atol=1e-4)


def test_generic_tp_sharding_scoring(mesh8):
    """generic_tp_sharding (any-pytree heuristic) also supports the
    scoring path, for model families without a hand-written spec."""
    from proteingym_tpu.models.esm2 import make_apply_fn
    from proteingym_tpu.models.esm_scoring import masked_marginal_table
    from proteingym_tpu.parallel.mesh import generic_tp_sharding

    config = EsmConfig(
        name="tp_generic", num_layers=2, embed_dim=128, num_heads=4,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(2), config)
    tokens = ALPHABET.tokenize("MKLVAGDEFWHC")
    fn = make_apply_fn(config)
    expected = masked_marginal_table(fn, tokens, chunk=8, params=params)

    shardings = generic_tp_sharding(params, mesh8, min_size=1024)
    sharded = shard_params(params, shardings)
    with mesh8:
        got = masked_marginal_table(fn, tokens, chunk=8, params=sharded)
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), atol=1e-4
    )


def test_cli_mesh_scoring_matches_single_device(tmp_path):
    """The production --mesh path (score_esm via ScoreContext) must produce
    the same per-mutant scores as single-device scoring."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import pandas as pd

    from proteingym_tpu.data.reference import AssayRecord
    from proteingym_tpu.pipeline.scorers import SCORERS, ScoreContext

    seq = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ"
    rng = np.random.default_rng(0)
    mutants = []
    for _ in range(12):
        p = int(rng.integers(0, len(seq)))
        wt = seq[p]
        mt = "ACDEFGHIKLMNPQRSTVWY"[int(rng.integers(20))]
        if mt == wt:
            mt = "A" if wt != "A" else "C"
        mutants.append(f"{wt}{p + 1}{mt}")
    record = AssayRecord(
        DMS_id="TEST_MESH", DMS_filename="test.csv", UniProt_ID="TEST",
        target_seq=seq, seq_len=len(seq),
    )
    from proteingym_tpu.data.mutants import apply_mutant

    frame = pd.DataFrame({
        "mutant": mutants,
        "mutated_sequence": [apply_mutant(seq, m) for m in mutants],
    })

    def run(extra):
        ctx = ScoreContext(
            record=record, dms_frame=frame.copy(), checkpoint="esm2_tiny",
            batch_size=8,
            extra={"_scorer_name": "esm", **extra},
        )
        return SCORERS["esm"](ctx)

    single = run({})
    meshed = run({"mesh": "data=4,model=2"})
    col = [c for c in single.columns if c.endswith("_score")][0]
    np.testing.assert_allclose(
        meshed[col].to_numpy(), single[col].to_numpy(), atol=1e-4
    )
