"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 test strategy).
x64 is enabled so metric kernels can be checked bit-for-bit against
scipy/sklearn.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon site customization force-selects the TPU tunnel backend at jax
# import; override it after import (backends aren't initialized yet)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# XLA:CPU's oneDNN/XNNPACK matmuls run a relaxed-precision fast path on
# bf16-capable hosts (~1e-4 relative error) — enough to blur logit-level
# torch-parity tolerances; force exact fp32 accumulation in tests
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# Test tiering: `pytest -m "not slow"` is the fast development tier —
# measured 12:48 wall on an idle 8-core host (2026-08, 306 tests); the
# full suite (default) adds the vendored-torch parity and training-loop
# tests. The list is curated from --durations of a full run (tests >=
# ~12 s); spine + kernel coverage and the graded-surface contract tests
# (bench, dryrun, entry) stay in the fast tier.
# ---------------------------------------------------------------------------

_SLOW_NODE_PATTERNS = [
    "test_scorer_smoke[proteinnpt]",
    "test_scorer_smoke[wavenet]",
    "test_scorer_smoke[kermut]",
    "test_scorer_smoke[s2f]",
    "test_scorer_smoke[protssn]",
    "test_scorer_smoke[aido]",
    "test_scorer_smoke[saprot]",
    "test_scorer_smoke[protgpt2]",
    "test_scorer_smoke[siterm]",
    "test_scorer_smoke[protein_mpnn]",
    "test_scorer_smoke[esm_if1]",
    "test_scorer_smoke[progen2]",
    "test_scorer_smoke[esm3]",
    "test_scorer_smoke[mulan]",
    "test_scorer_smoke[embeddings_ridge]",
    "test_scorer_smoke[trancepteve]",
    "test_scorer_smoke[deepsequence]",
    "test_scorer_smoke[eve]",
    "test_scorer_smoke[mif_st]",
    "test_scorer_smoke[mif]",
    "test_scorer_smoke[msa_transformer]",
    "test_scorer_smoke[rita]",
    "test_supervised_baselines.py::TestProteinNpt",
    "test_supervised_baselines.py::TestRidge::test_recovers_linear_signal",
    "test_eve.py::test_training_reduces_loss",
    "test_eve.py::test_evol_indices_prefer_consensus",
    "test_parallel.py::test_dryrun_multichip",
    "test_progen3.py::TestExpertParallel",
    "test_golden_artifacts.py::test_bootstrap_standard_errors",
    "test_provean_wavenet.py::TestWavenet::test_learns_family_statistics",
    "test_gvp_transformer_parity.py",
    "test_retrieval.py::TestEndToEndTranceptEve",
    "test_retrieval.py::TestEveLogPrior",
    "test_cli_train.py::test_train_eve_writes_orbax_checkpoint",
    "test_torch_parity.py",
    "test_tranception.py::test_batched_ar_loglik_matches_manual",
    "test_structure_models.py::TestGnnOps",
    "test_protein_mpnn.py::TestDecoder",
    "test_s3f_parity.py",
    "test_provean_wavenet.py::TestWavenet::test_causality",
    "test_msa_transformer.py::TestForward",
    "test_siterm_gemme.py::TestSiteRmGtr::test_regularization",
    "test_kermut.py::TestMpnnConditionals",
    "test_prosst_real.py",
    "test_esm3_parity.py",
    "test_prosst_quantizer.py",
    "test_mulan_parity.py",
    "test_protssn_parity.py",
    "test_breadth_models.py",
    "test_progen3.py::TestRouting",
    "test_progen3.py::TestHfConfigInference",
    "test_poet.py::TestTieredAttention",
    "test_tridi_saprot.py::TestSaProtFileVocab",
    "test_ring_attention.py",
    "test_siterm_gemme.py::TestSiteRm::test_expm_path",
    # r4 re-curation (fast tier measured 18:41 under load; these are the
    # heaviest rows whose coverage the slow tier / parity suites repeat)
    "test_scorer_smoke[s3f]",
    "test_scorer_smoke[prosst]",
    "test_gvp.py::TestGvpTransformerBehavior",
    "test_structure_models.py::TestProtssn",
    "test_scorers_smoke.py::test_protssn_ensemble_column",
    "test_eve.py::test_train_step_jits",
    "test_supervised_baselines.py::TestAugmentedRidge",
    "test_protein_mpnn.py::TestScoring",
    "test_siterm_gemme.py::TestSiteRmGtr::test_valid_reversible_rate_matrices",
    "test_scorer_smoke[venusrem]",
    "test_scorer_smoke[carp]",
    "test_prot_t5.py",
    "test_vespa_heads.py::test_vespa_full_scoring_mode",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_NODE_PATTERNS):
            item.add_marker(pytest.mark.slow)
