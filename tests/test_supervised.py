"""Supervised merge + evaluation layer (ref merge_supervised.py,
performance_DMS_supervised_benchmarks.py)."""

import numpy as np
import pandas as pd
import pytest

from proteingym_tpu.data.reference import load_reference
from proteingym_tpu.data.registry import registry_from_dict
from proteingym_tpu.merge.supervised import (
    CV_SCHEMES_SUBS, merge_supervised, supervised_filesystem_loaders,
)
from proteingym_tpu.metrics.supervised import evaluate_supervised

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("sup")
    rs = np.random.RandomState(0)
    rows = []
    for k, dms_id in enumerate(["P1_Test_2026", "P2_Test_2026", "P3_Test_2026"]):
        L = 20
        target = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{target[p]}{p + 1}A" for p in range(L) if target[p] != "A"]
        y = rs.normal(size=len(muts))
        dms = pd.DataFrame({"mutant": muts, "DMS_score": y})
        (root / "dms").mkdir(exist_ok=True)
        dms.to_csv(root / "dms" / f"{dms_id}.csv", index=False)
        # per-scheme predictions for two models: good (y + noise) and bad
        for cv in CV_SCHEMES_SUBS:
            for model, pred in [
                ("GoodGP", y + rs.normal(0, 0.3, len(y))),
                ("BadRidge", rs.normal(size=len(y))),
            ]:
                d = root / "scores" / cv / model.lower()
                d.mkdir(parents=True, exist_ok=True)
                pd.DataFrame(
                    {"mutant": muts, "y_pred": pred, "y_true": y}
                ).to_csv(d / f"{dms_id}.csv", index=False)
        rows.append(
            {
                "DMS_id": dms_id,
                "DMS_filename": f"{dms_id}.csv",
                "UniProt_ID": f"UP{k}",
                "target_seq": target,
                "seq_len": L,
                "taxon": ["Human", "Prokaryote", "Virus"][k],
                "coarse_selection_type": ["Activity", "Stability", "Binding"][k],
                "MSA_Neff_L_category": ["Low", "Medium", "High"][k],
            }
        )
    pd.DataFrame(rows).to_csv(root / "reference.csv", index=False)
    registry = registry_from_dict(
        {
            "GoodGP": {
                "input_score_name": "y_pred", "location": "goodgp",
                "key": "mutant", "label_name": "y_true",
                "model_type": "Supervised",
            },
            "BadRidge": {
                "input_score_name": "y_pred", "location": "badridge",
                "key": "mutant", "label_name": "y_true",
                "model_type": "Supervised",
            },
        }
    )
    return root, registry


def test_merge_supervised_long_format(world, tmp_path):
    root, registry = world
    reference = load_reference(root / "reference.csv")
    dms_loader, score_loader = supervised_filesystem_loaders(
        root / "dms", root / "scores"
    )
    long = merge_supervised(
        reference, registry, dms_loader, score_loader, output_dir=tmp_path
    )
    assert set(long.columns) == {
        "DMS_id", "model_name", "fold_variable_name", "Spearman", "MSE",
    }
    # 3 assays x 2 models x 3 schemes
    assert len(long) == 18
    assert long["Spearman"].notna().all()
    good = long[long.model_name == "GoodGP"]["Spearman"].mean()
    bad = long[long.model_name == "BadRidge"]["Spearman"].mean()
    assert good > 0.7 > abs(bad) + 0.4
    # merged per-scheme artifacts exist with normalized_targets
    merged = pd.read_csv(tmp_path / "fold_random_5" / "P1_Test_2026.csv")
    assert "normalized_targets" in merged
    assert "GoodGP_predictions" in merged
    assert (tmp_path / "merged_scores_substitutions_DMS.csv").exists()


def test_evaluate_supervised_summary(world, tmp_path):
    root, registry = world
    reference = load_reference(root / "reference.csv")
    dms_loader, score_loader = supervised_filesystem_loaders(
        root / "dms", root / "scores"
    )
    long = merge_supervised(reference, registry, dms_loader, score_loader)
    summaries = evaluate_supervised(
        long, reference, tmp_path, bootstrap_samples=100,
        model_types={"GoodGP": "Supervised"},
    )
    for metric in ["Spearman", "MSE"]:
        summ = summaries[metric]
        assert (
            tmp_path / metric
            / f"Summary_performance_DMS_substitutions_{metric}.csv"
        ).exists()
        assert (
            tmp_path / metric / f"DMS_substitutions_{metric}_DMS_level.csv"
        ).exists()
        for cv in CV_SCHEMES_SUBS:
            assert (
                tmp_path / metric
                / f"DMS_substitutions_{metric}_DMS_level_{cv}.csv"
            ).exists()
            assert f"Average_{metric}_{cv}" in summ.columns
        assert summ.index.name == "Model_rank"
    # Spearman ranks descending (GoodGP first), MSE ascending (GoodGP first)
    assert summaries["Spearman"].iloc[0]["Model_name"] == "GoodGP"
    assert summaries["MSE"].iloc[0]["Model_name"] == "GoodGP"
    assert summaries["Spearman"].iloc[0]["Average_Spearman"] > 0.7
    # bootstrap SE of the top model vs itself is ~0
    assert summaries["Spearman"].iloc[0]["Bootstrap_standard_error_Spearman"] == 0.0
    # depth/taxon columns populated where categories exist
    assert np.isfinite(summaries["Spearman"]["Low_MSA_depth"].iloc[0])
    # absent taxon (Other Eukaryote) present as NaN column, not a crash
    assert "Taxa_Other_Eukaryote" in summaries["Spearman"].columns


def test_merge_detects_mutant_set_changes(world):
    # duplicate mutants in the assay frame violate the reference's
    # set-equality/length guard (ref merge_supervised.py:108-111)
    root, registry = world
    reference = load_reference(root / "reference.csv")
    dms_loader, score_loader = supervised_filesystem_loaders(
        root / "dms", root / "scores"
    )

    def dup_dms_loader(rec):
        frame = dms_loader(rec)
        return pd.concat([frame, frame.iloc[:1]], ignore_index=True)

    with pytest.raises(ValueError):
        merge_supervised(reference, registry, dup_dms_loader, score_loader)


def test_missing_scores_yield_nan_rows(world):
    root, registry = world
    reference = load_reference(root / "reference.csv")
    dms_loader, _ = supervised_filesystem_loaders(root / "dms", root / "scores")
    long = merge_supervised(
        reference, registry, dms_loader, lambda cv, d, e: None
    )
    assert long["Spearman"].isna().all() and len(long) == 18
