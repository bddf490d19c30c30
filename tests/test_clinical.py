"""Clinical AUC evaluation layer (artifact contract of
benchmarks/clinical_zero_shot/*/AUC/)."""

import numpy as np
import pandas as pd
import pytest

pytest.importorskip("jax")

from proteingym_tpu.data.reference import load_reference
from proteingym_tpu.data.registry import registry_from_dict
from proteingym_tpu.metrics.clinical import evaluate_clinical


@pytest.fixture()
def clinical_world(tmp_path):
    rs = np.random.RandomState(0)
    rows = []
    merged_dir = tmp_path / "merged"
    merged_dir.mkdir()
    for k in range(4):
        pid = f"NP_00000{k}.1"
        n = 60
        labels = rs.randint(0, 2, n)
        good = labels * 2.0 + rs.normal(0, 0.8, n)  # predictive
        noise = rs.normal(size=n)
        pd.DataFrame(
            {
                "mutant": [f"A{i + 1}G" for i in range(n)],
                "DMS_bin_score": labels,
                "GoodModel": good,
                "NoiseModel": noise,
            }
        ).to_csv(merged_dir / f"{pid}.csv", index=False)
        rows.append({"DMS_id": pid, "target_seq": "A" * 50, "seq_len": 50,
                     "DMS_filename": f"{pid}.csv", "UniProt_ID": pid})
    ref_csv = tmp_path / "clinical_ref.csv"
    pd.DataFrame(rows).to_csv(ref_csv, index=False)
    registry = registry_from_dict(
        {
            "GoodModel": {"input_score_name": "GoodModel", "key": "mutant",
                          "model_type": "MSA"},
            "NoiseModel": {"input_score_name": "NoiseModel", "key": "mutant",
                           "model_type": "Other"},
        }
    )
    return tmp_path, ref_csv, merged_dir, registry


def test_clinical_auc_artifacts(clinical_world, tmp_path):
    root, ref_csv, merged_dir, registry = clinical_world
    reference = load_reference(ref_csv)

    def loader(dms_id):
        p = merged_dir / f"{dms_id}.csv"
        return pd.read_csv(p) if p.exists() else None

    out = tmp_path / "bench"
    summary = evaluate_clinical(
        reference, registry, loader, out, bootstrap_samples=200,
        model_types={"GoodModel": "MSA"},
    )
    assert summary.iloc[0]["Model_name"] == "GoodModel"
    assert summary.iloc[0]["Average_AUC"] > 0.8
    assert summary.iloc[0]["Bootstrap_standard_error_AUC"] == 0.0  # top model
    assert summary.index.name == "Model_rank"
    dms_level = pd.read_csv(
        out / "AUC" / "clinical_substitutions_AUC_DMS_level.csv"
    )
    assert dms_level.columns[0] == "RefSeq ID"
    assert len(dms_level) == 4
    assert (
        out / "AUC" / "Summary_performance_clinical_substitutions_AUC.csv"
    ).exists()


def test_clinical_single_class_protein_is_nan(clinical_world, tmp_path):
    root, ref_csv, merged_dir, registry = clinical_world
    # overwrite one protein with single-class labels
    pid = "NP_000000.1"
    frame = pd.read_csv(merged_dir / f"{pid}.csv")
    frame["DMS_bin_score"] = 1
    frame.to_csv(merged_dir / f"{pid}.csv", index=False)
    reference = load_reference(ref_csv)

    def loader(dms_id):
        return pd.read_csv(merged_dir / f"{dms_id}.csv")

    summary = evaluate_clinical(
        reference, registry, loader, tmp_path / "b2", bootstrap_samples=50
    )
    dms_level = pd.read_csv(
        tmp_path / "b2" / "AUC" / "clinical_substitutions_AUC_DMS_level.csv"
    )
    row = dms_level[dms_level["RefSeq ID"] == pid]
    assert row["GoodModel"].isna().all()
    assert np.isfinite(summary["Average_AUC"]).all()
