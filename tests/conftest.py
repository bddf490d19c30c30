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
# re-curated r5 to stay under ~6 minutes idle (measured 12:34 under
# heavy load before the r5 cut, ~250 s of rows moved out); the full
# suite (default) adds the vendored-torch parity and training-loop
# tests. The list is curated from --durations of a full run; spine +
# kernel coverage and the graded-surface contract tests (bench, dryrun,
# entry) stay in the fast tier.
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
    # r5 re-curation (fast tier measured 12:34 under load / target <6 min
    # idle; heaviest rows whose coverage other fast rows or the slow-tier
    # parity suites repeat — e.g. test_score_merge_evaluate keeps the CLI
    # spine fast while the indel variant moves, the clinical CLI e2e is
    # the slow-tier twin of test_clinical.py's fast synthetic layer)
    "test_clinical_cli_e2e.py",
    "test_scorer_smoke[s3f_msa]",
    "test_cli.py::test_indel_score_merge_evaluate",
    "test_rsalor_vespag.py::TestVespagConvertedCheckpoint::"
    "test_cli_convert_and_score",
    "test_packed_segments.py::TestSegmentedApply::"
    "test_packed_row_matches_solo_forwards[esm2]",
    "test_progen3.py::TestForward::test_restricted_logits",
    "test_progen3.py::TestForward::test_causal",
    "test_cli_train.py::test_supervised_score_embeddings_and_aug",
    "test_scorer_smoke[progen3]",
    "test_cli.py::test_convert_esm_roundtrip",
    "test_protein_mpnn.py::TestConversion::test_torch_state_dict_shapes",
    "test_ar_zoo.py::TestProGen2::test_causal",
    "test_structure_models.py::TestS3f::test_s2f_variant_ignores_surface",
    "test_scorer_smoke[ohe_ridge]",
    "test_kermut.py::TestGP::test_zero_shot_mean_helps",
    "test_structure_models.py::TestCarp::"
    "test_not_causal_and_context_sensitive",
    "test_msa_transformer.py::TestMultiColumnMasking::"
    "test_k_masked_scores_agree_with_reference_protocol",
    "test_indel_retrieval.py::TestPerRowIndelFusion::"
    "test_make_indel_fusion_tables_and_scoring",
    "test_hmm.py::TestForwardParity::test_matches_brute_force[6]",
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
    # r5: trains 400 MLM steps on CPU (~1 min) to demonstrate k-column
    # fidelity on a locally-structured model
    "test_packed_scoring.py::TestKColumns::"
    "test_k_scores_track_on_locally_trained_model",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_NODE_PATTERNS):
            item.add_marker(pytest.mark.slow)
