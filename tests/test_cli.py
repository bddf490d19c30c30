"""End-to-end CLI: score -> merge -> evaluate on a synthetic benchmark."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")

from proteingym_tpu.pipeline.cli import main

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic benchmark world: 2 assays, MSAs, DMS files, config."""
    root = tmp_path_factory.mktemp("world")
    rs = np.random.RandomState(0)
    rows = []
    for k, dms_id in enumerate(["PROT_A_Test_2026", "PROT_B_Test_2026"]):
        L = 30
        target = "".join(AA[i] for i in rs.randint(0, 20, L))
        # MSA (a2m) around the target
        msa_lines = [f">{dms_id}_focus/1-{L}", target]
        for i in range(40):
            s = list(target)
            for p in rs.choice(L, 6, replace=False):
                s[p] = AA[rs.randint(20)]
            msa_lines += [f">hom{i}", "".join(s)]
        msa_dir = root / "msa"
        msa_dir.mkdir(exist_ok=True)
        (msa_dir / f"{dms_id}.a2m").write_text("\n".join(msa_lines) + "\n")
        # DMS assay: single substitutions with a planted signal
        muts, seqs = [], []
        for p in range(L):
            for m in AA[:3]:
                if m != target[p]:
                    muts.append(f"{target[p]}{p + 1}{m}")
                    seqs.append(target[:p] + m + target[p + 1 :])
        score = rs.normal(size=len(muts))
        dms = pd.DataFrame(
            {
                "mutant": muts,
                "mutated_sequence": seqs,
                "DMS_score": score,
                "DMS_score_bin": (score > np.median(score)).astype(int),
            }
        )
        dms_dir = root / "dms"
        dms_dir.mkdir(exist_ok=True)
        dms.to_csv(dms_dir / f"{dms_id}.csv", index=False)
        rows.append(
            {
                "DMS_id": dms_id,
                "DMS_filename": f"{dms_id}.csv",
                "UniProt_ID": f"PROT_{'AB'[k]}",
                "target_seq": target,
                "seq_len": L,
                "taxon": "Prokaryote",
                "includes_multiple_mutants": False,
                "DMS_total_number_mutants": len(muts),
                "coarse_selection_type": "Activity",
                "selection_type": "Activity",
                "MSA_filename": f"{dms_id}.a2m",
                "MSA_start": 1,
                "MSA_end": L,
                "MSA_theta": 0.2,
                "MSA_Neff_L_category": "Medium",
                "weight_file_name": f"{dms_id}_w.npy",
            }
        )
    ref_csv = root / "reference.csv"
    pd.DataFrame(rows).to_csv(ref_csv, index=False)
    config = {
        "model_list_zero_shot_substitutions_DMS": {
            "Site_Independent": {
                "input_score_name": "Site_Independent_score",
                "location": "site_independent",
                "directionality": 1,
                "key": "mutant",
                "model_type": "Alignment-based model",
            },
            "HMM": {
                "input_score_name": "HMM_score",
                "location": "hmm",
                "directionality": 1,
                "key": "mutant",
                "model_type": "Alignment-based model",
            },
        }
    }
    (root / "config.json").write_text(json.dumps(config))
    return root


def test_models_lists_scorers(capsys):
    assert main(["models"]) == 0
    out = capsys.readouterr().out
    for name in ["site_independent", "potts", "hmm", "eve", "esm", "tranception"]:
        assert name in out


def test_score_merge_evaluate(world):
    base = [
        "--dms-reference", str(world / "reference.csv"),
        "--dms-dir", str(world / "dms"),
    ]
    for model, loc in [("site_independent", "site_independent"), ("hmm", "hmm")]:
        rc = main(
            ["score", "--model", model, *base,
             "--msa-dir", str(world / "msa"),
             "--weights-dir", str(world / "weights"),
             "--output-dir", str(world / "scores" / loc),
             "--quiet", "--fail-fast"]
        )
        assert rc == 0
        for dms_id in ["PROT_A_Test_2026", "PROT_B_Test_2026"]:
            f = world / "scores" / loc / f"{dms_id}.csv"
            assert f.exists()
            frame = pd.read_csv(f)
            assert frame.iloc[:, -1].notna().all()

    # resume: second run skips everything (manifest)
    rc = main(
        ["score", "--model", "site_independent", *base,
         "--msa-dir", str(world / "msa"),
         "--weights-dir", str(world / "weights"),
         "--output-dir", str(world / "scores" / "site_independent"),
         "--quiet"]
    )
    assert rc == 0
    events = [
        json.loads(line)
        for line in (world / "scores" / "site_independent" / "events.jsonl")
        .read_text().splitlines()
    ]
    assert any(e["event"] == "task_skipped" for e in events)

    rc = main(
        ["merge", *base,
         "--scores-root", str(world / "scores"),
         "--config", str(world / "config.json"),
         "--output-dir", str(world / "merged")]
    )
    assert rc == 0
    merged = pd.read_csv(world / "merged" / "PROT_A_Test_2026.csv")
    assert {"Site_Independent", "HMM"} <= set(merged.columns)

    rc = main(
        ["evaluate",
         "--dms-reference", str(world / "reference.csv"),
         "--merged-dir", str(world / "merged"),
         "--config", str(world / "config.json"),
         "--output-dir", str(world / "bench"),
         "--bootstrap-samples", "50",
         "--no-html"]
    )
    assert rc == 0
    summary = pd.read_csv(
        world / "bench" / "Spearman"
        / "Summary_performance_DMS_substitutions_Spearman.csv"
    )
    assert set(summary["Model_name"]) == {"Site_Independent", "HMM"}
    assert "Average_Spearman" in summary.columns


def test_download_list(capsys):
    assert main(["download", "--list"]) == 0
    out = capsys.readouterr().out
    assert "DMS_ProteinGym_substitutions" in out and "sha256:" in out


def test_convert_esm_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from proteingym_tpu.models import esm2
    from proteingym_tpu.pipeline.checkpoints import restore_pytree

    cfg = esm2.PRESETS["esm2_t6_8M"]
    rs = np.random.RandomState(0)
    d, f, v = cfg.embed_dim, cfg.ffn_dim, cfg.alphabet_size

    def t(*shape):
        return torch.tensor(rs.randn(*shape).astype(np.float32) * 0.02)

    sd = {"embed_tokens.weight": t(v, d), "lm_head.bias": t(v),
          "lm_head.dense.weight": t(d, d), "lm_head.dense.bias": t(d),
          "lm_head.layer_norm.weight": torch.ones(d),
          "lm_head.layer_norm.bias": torch.zeros(d),
          "emb_layer_norm_after.weight": torch.ones(d),
          "emb_layer_norm_after.bias": torch.zeros(d)}
    for i in range(cfg.num_layers):
        p = f"layers.{i}"
        for nm, shp in [("self_attn.q_proj", (d, d)),
                        ("self_attn.k_proj", (d, d)),
                        ("self_attn.v_proj", (d, d)),
                        ("self_attn.out_proj", (d, d)),
                        ("fc1", (f, d)), ("fc2", (d, f))]:
            sd[f"{p}.{nm}.weight"] = t(*shp)
            sd[f"{p}.{nm}.bias"] = t(shp[0])
        for nm in ["self_attn_layer_norm", "final_layer_norm"]:
            sd[f"{p}.{nm}.weight"] = torch.ones(d)
            sd[f"{p}.{nm}.bias"] = torch.zeros(d)
    torch.save(sd, tmp_path / "m.pt")
    rc = main(["convert", "--family", "esm", "--preset", "esm2_t6_8M",
               "--checkpoint", str(tmp_path / "m.pt"),
               "--output", str(tmp_path / "out")])
    assert rc == 0
    # layout contract: params/ + config.json, loadable by the scorers
    assert (tmp_path / "out" / "config.json").exists()
    params = restore_pytree(tmp_path / "out" / "params")
    direct = esm2.convert_torch_state_dict(sd, cfg)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # full round trip: the converted directory loads through the esm path
    from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint

    loaded, config = load_esm_checkpoint(str(tmp_path / "out"))
    assert config.name == cfg.name
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_indel_score_merge_evaluate(tmp_path):
    """End-to-end indel benchmark: AR scoring of variable-length sequences
    keyed on mutated_sequence, merge with mutation_type=indels, evaluate
    without depth splits (ref merge.py:71, performance indel mode)."""
    rs = np.random.RandomState(3)
    L = 18
    target = "".join("ACDEFGHIKLMNPQRSTVWY"[i] for i in rs.randint(0, 20, L))
    seqs = [target]
    for i in range(14):
        p = rs.randint(1, L - 1)
        if i % 2:  # insertion
            seqs.append(target[:p] + "A" + target[p:])
        else:  # deletion
            seqs.append(target[:p] + target[p + 1:])
    dms = pd.DataFrame({
        "mutant": seqs, "mutated_sequence": seqs,
        "DMS_score": rs.normal(size=len(seqs)),
    })
    dms["DMS_score_bin"] = (dms.DMS_score > dms.DMS_score.median()).astype(int)
    (tmp_path / "dms").mkdir()
    dms.to_csv(tmp_path / "dms" / "IND.csv", index=False)
    pd.DataFrame([{
        "DMS_id": "IND", "DMS_filename": "IND.csv", "UniProt_ID": "U_IND",
        "target_seq": target, "seq_len": L, "taxon": "Virus",
        "includes_multiple_mutants": False,
        "DMS_total_number_mutants": len(seqs),
        "coarse_selection_type": "Activity", "selection_type": "Activity",
        "MSA_Neff_L_category": "Low",
    }]).to_csv(tmp_path / "ref.csv", index=False)

    rc = main([
        "score", "--model", "rita",
        "--dms-reference", str(tmp_path / "ref.csv"),
        "--dms-dir", str(tmp_path / "dms"),
        "--output-dir", str(tmp_path / "scores" / "rita"),
        "--indel-mode", "--batch-size", "8", "--quiet", "--fail-fast",
    ])
    assert rc == 0
    scored = pd.read_csv(tmp_path / "scores" / "rita" / "IND.csv")
    assert scored["RITA_s_score"].notna().all()

    config = {"model_list_zero_shot_indels_DMS": {
        "RITA_S": {"input_score_name": "RITA_s_score", "location": "rita",
                   "directionality": 1, "key": "mutated_sequence",
                   "model_type": "Protein language model"},
    }}
    import json

    (tmp_path / "config.json").write_text(json.dumps(config))
    rc = main([
        "merge",
        "--dms-reference", str(tmp_path / "ref.csv"),
        "--dms-dir", str(tmp_path / "dms"),
        "--scores-root", str(tmp_path / "scores"),
        "--config", str(tmp_path / "config.json"),
        "--output-dir", str(tmp_path / "merged"),
        "--mutation-type", "indels",
    ])
    assert rc == 0
    merged = pd.read_csv(tmp_path / "merged" / "IND.csv")
    assert "RITA_S" in merged.columns and merged["RITA_S"].notna().all()

    rc = main([
        "evaluate",
        "--dms-reference", str(tmp_path / "ref.csv"),
        "--merged-dir", str(tmp_path / "merged"),
        "--config", str(tmp_path / "config.json"),
        "--output-dir", str(tmp_path / "bench"),
        "--mutation-type", "indels",
        "--bootstrap-samples", "20", "--no-html",
    ])
    assert rc == 0
    summary = pd.read_csv(
        tmp_path / "bench" / "Spearman"
        / "Summary_performance_DMS_indels_Spearman.csv"
    )
    assert summary.iloc[0]["Model_name"] == "RITA_S"
    assert np.isfinite(summary.iloc[0]["Average_Spearman"])
