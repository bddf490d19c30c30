"""End-to-end spine test: cleanup -> merge -> metrics -> leaderboard artifacts."""

import numpy as np
import pandas as pd
import pytest

from proteingym_tpu.data.cleanup import dms_file_cleanup
from proteingym_tpu.data.reference import load_reference
from proteingym_tpu.data.registry import registry_from_dict
from proteingym_tpu.merge.merge import merge_assay_scores
from proteingym_tpu.metrics.aggregate import evaluate_benchmark


@pytest.fixture
def tiny_benchmark(tmp_path, rng):
    target = "MKLVAGDEFW"
    assays = []
    for i, (dms_id, uniprot, taxon, seltype, neff) in enumerate(
        [
            ("PROT1_TEST_2020", "PROT1_TEST", "Human", "Activity", "Low"),
            ("PROT1_TEST2_2021", "PROT1_TEST", "Human", "Stability", "Low"),
            ("PROT2_TEST_2019", "PROT2_TEST", "Virus", "Binding", "Medium"),
            ("PROT3_TEST_2022", "PROT3_TEST", "Prokaryote", "Expression", "High"),
            ("PROT4_TEST_2022", "PROT4_TEST", "Eukaryote", "OrganismalFitness", "High"),
        ]
    ):
        n = 60 + 10 * i
        muts, seen = [], set()
        while len(muts) < n:
            pos = int(rng.integers(1, len(target) + 1))
            to = "ACDEFGHIKLMNPQRSTVWY"[int(rng.integers(0, 20))]
            m = f"{target[pos - 1]}{pos}{to}"
            if target[pos - 1] != to and m not in seen:
                seen.add(m)
                muts.append(m)
        scores = rng.normal(size=n)
        frame = pd.DataFrame(
            {
                "mutant": muts,
                "DMS_score": scores,
                "DMS_score_bin": (scores > np.median(scores)).astype(int),
            }
        )
        assays.append(
            dict(
                DMS_id=dms_id,
                DMS_filename=f"{dms_id}.csv",
                UniProt_ID=uniprot,
                taxon=taxon,
                target_seq=target,
                seq_len=len(target),
                coarse_selection_type=seltype,
                MSA_Neff_L_category=neff,
                DMS_total_number_mutants=n,
                frame=frame,
            )
        )
    ref_frame = pd.DataFrame([{k: v for k, v in a.items() if k != "frame"} for a in assays])
    ref_path = tmp_path / "reference.csv"
    ref_frame.to_csv(ref_path, index=False)
    return ref_path, assays


def test_spine_end_to_end(tmp_path, tiny_benchmark, rng):
    ref_path, assays = tiny_benchmark
    reference = load_reference(ref_path)
    assert len(reference) == 5
    assert reference["PROT1_TEST_2020"].UniProt_ID == "PROT1_TEST"

    registry = registry_from_dict(
        {
            "good_model": {"input_score_name": "pred", "directionality": 1, "key": "mutant"},
            "anti_model": {"input_score_name": "pred", "directionality": -1, "key": "mutant"},
            "noise_model": {"input_score_name": "pred", "directionality": 1, "key": "mutant"},
        }
    )

    merged_frames = {}
    for a in assays:
        dms = a["frame"]
        model_scores = {
            # good model: correlates with DMS_score
            "good_model": pd.DataFrame(
                {"mutant": dms["mutant"], "pred": dms["DMS_score"] + 0.3 * rng.normal(size=len(dms))}
            ),
            # anti model: same signal but stored negated, fixed by directionality
            "anti_model": pd.DataFrame(
                {"mutant": dms["mutant"], "pred": -(dms["DMS_score"] + 0.3 * rng.normal(size=len(dms)))}
            ),
            "noise_model": pd.DataFrame(
                {"mutant": dms["mutant"], "pred": rng.normal(size=len(dms))}
            ),
        }
        merged = merge_assay_scores(
            dms, model_scores, registry, dms_id=a["DMS_id"],
            expected_num_mutants=a["DMS_total_number_mutants"],
        )
        assert len(merged) == len(dms)
        assert {"good_model", "anti_model", "noise_model"} <= set(merged.columns)
        merged_frames[a["DMS_id"]] = merged

    out_dir = tmp_path / "perf"
    summaries = evaluate_benchmark(
        reference,
        registry,
        lambda dms_id: merged_frames.get(dms_id),
        out_dir,
        performance_by_depth=True,
        bootstrap_samples=200,
        write_html=False,
    )

    # artifact contract
    for metric in ["Spearman", "AUC", "MCC", "NDCG", "Top_recall"]:
        assert (out_dir / metric / f"Summary_performance_DMS_substitutions_{metric}.csv").exists()
        assert (out_dir / metric / f"DMS_substitutions_{metric}_DMS_level.csv").exists()
        assert (out_dir / metric / f"DMS_substitutions_{metric}_Uniprot_level.csv").exists()

    summary = summaries["Spearman"]
    assert list(summary.columns[:4]) == [
        "Model_name",
        "Model type",
        "Average_Spearman",
        "Bootstrap_standard_error_Spearman",
    ]
    by_model = summary.set_index("Model_name")["Average_Spearman"]
    # directionality fix makes anti_model as good as good_model; noise loses
    assert by_model["good_model"] > by_model["noise_model"]
    assert by_model["anti_model"] > by_model["noise_model"]
    assert abs(by_model["good_model"]) <= 1.0
    # ranked ordering is descending
    assert summary["Average_Spearman"].is_monotonic_decreasing
    # depth columns present
    assert "Depth_1" in summary.columns


def test_merge_subset_model_skipped(rng):
    dms = pd.DataFrame(
        {"mutant": ["A1C", "A1D", "A1E"], "DMS_score": [0.1, 0.2, 0.3]}
    )
    registry = registry_from_dict(
        {"partial": {"input_score_name": "s", "directionality": 1, "key": "mutant"}}
    )
    scores = {"partial": pd.DataFrame({"mutant": ["A1C", "A1D"], "s": [1.0, 2.0]})}
    merged = merge_assay_scores(dms, scores, registry)
    # strict-subset mutant coverage -> model skipped (ref merge.py:87-91)
    assert "partial" not in merged.columns


def test_merge_duplicate_mutants_averaged(rng):
    dms = pd.DataFrame({"mutant": ["A1C", "A1D"], "DMS_score": [0.1, 0.2]})
    registry = registry_from_dict(
        {"m": {"input_score_name": "s", "directionality": 1, "key": "mutant"}}
    )
    scores = {
        "m": pd.DataFrame({"mutant": ["A1C", "A1C", "A1D"], "s": [1.0, 3.0, 5.0]})
    }
    merged = merge_assay_scores(dms, scores, registry)
    assert merged.loc[merged["mutant"] == "A1C", "m"].iloc[0] == pytest.approx(2.0)


def test_cleanup(tmp_path):
    target = "MKLV"
    raw = pd.DataFrame(
        {
            "mutant": ["M1A", "K2C", "K2C", "X9Z", "M1A:K2C", "bad", None, "L3P"],
            "score": [1.0, 2.0, 4.0, 5.0, 3.0, 1.0, 1.0, "oops"],
        }
    )
    out = dms_file_cleanup(raw, target)
    # X9Z invalid, "bad" invalid, None dropped, non-numeric dropped,
    # duplicate K2C averaged
    assert set(out["mutant"]) == {"M1A", "K2C", "M1A:K2C"}
    assert out.loc[out["mutant"] == "K2C", "DMS_score"].iloc[0] == pytest.approx(3.0)
    assert out.loc[out["mutant"] == "M1A", "mutated_sequence"].iloc[0] == "AKLV"
    assert out.loc[out["mutant"] == "M1A:K2C", "mutated_sequence"].iloc[0] == "ACLV"
