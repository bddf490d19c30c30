"""End-to-end TranceptEVE walkthrough (the reference ships this flow as
notebooks/TranceptEVE_example.ipynb).

Runs fully offline on CPU in ~2 minutes with synthetic data:

  1. build a small protein family (wild type + homologs) as an A2M MSA
     and a single-substitution DMS assay whose scores correlate with
     family conservation
  2. score it three ways through the `pgym` CLI contract:
       - site_independent   (fast alignment-only baseline)
       - trancepteve        (Tranception trunk + retrieval-prior fusion;
                             tiny random preset, MSA prior carries signal)
  3. merge the score files and print per-model Spearman

With real data, point --dms-reference/--dms-dir/--msa-dir at the
downloaded ProteinGym archives (pgym download) and swap --checkpoint to a
converted published checkpoint (pgym convert --family tranception ...).

Run:  JAX_PLATFORMS=cpu python examples/trancepteve_example.py
"""

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

from proteingym_tpu.pipeline.cli import main

AA = "ACDEFGHIKLMNPQRSTVWY"


def build_world(root: Path, L: int = 24, n_homologs: int = 40):
    rs = np.random.RandomState(0)
    target = "".join(AA[i] for i in rs.randint(0, 20, L))
    (root / "msa").mkdir()
    (root / "dms").mkdir()

    # family: even positions conserved, odd positions variable
    lines = [f">focus/1-{L}", target]
    for i in range(n_homologs):
        s = list(target)
        for p in range(1, L, 2):
            if rs.rand() < 0.5:
                s[p] = AA[rs.randint(20)]
        lines += [f">homolog_{i}", "".join(s)]
    (root / "msa" / "FAM.a2m").write_text("\n".join(lines) + "\n")

    # DMS: substitutions at conserved positions are deleterious
    muts, seqs, scores = [], [], []
    for p in range(L):
        for m in AA[:3]:
            if m == target[p]:
                continue
            muts.append(f"{target[p]}{p + 1}{m}")
            seqs.append(target[:p] + m + target[p + 1:])
            scores.append(
                (-1.5 if p % 2 == 0 else -0.1) + rs.normal(0, 0.3)
            )
    pd.DataFrame(
        {"mutant": muts, "mutated_sequence": seqs, "DMS_score": scores}
    ).to_csv(root / "dms" / "FAM.csv", index=False)

    pd.DataFrame(
        [{
            "DMS_id": "FAM", "DMS_filename": "FAM.csv", "UniProt_ID": "FAM",
            "target_seq": target, "seq_len": L, "MSA_filename": "FAM.a2m",
            "MSA_start": 1, "MSA_end": L, "MSA_theta": 0.2,
            "weight_file_name": "FAM_w.npy",
        }]
    ).to_csv(root / "ref.csv", index=False)


def score(root: Path, model: str, extra=None, checkpoint=None):
    args = [
        "score", "--model", model,
        "--dms-reference", str(root / "ref.csv"),
        "--dms-dir", str(root / "dms"),
        "--msa-dir", str(root / "msa"),
        "--weights-dir", str(root / "weights"),
        "--output-dir", str(root / "scores" / model),
        "--quiet", "--fail-fast", "--overwrite",
    ]
    if checkpoint:
        args += ["--checkpoint", checkpoint]
    if extra:
        args += ["--extra", *extra]
    rc = main(args)
    assert rc == 0, f"{model} failed"
    return pd.read_csv(root / "scores" / model / "FAM.csv")


def run():
    from scipy.stats import spearmanr

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        build_world(root)
        print("== site_independent (alignment-only)")
        si = score(root, "site_independent")
        print("== trancepteve (tiny trunk + MSA retrieval prior)")
        # --extra eve_checkpoints=<path1,path2> additionally blends EVE
        # log-priors from converted published checkpoints (the full
        # TranceptEVE recipe); without them the retrieval prior is the
        # processed-MSA term alone
        te = score(
            root, "trancepteve",
            extra=["retrieval_type=TranceptEVE"],
        )
        # Tranception-family scores key on mutated_sequence (the reference
        # registry's key field for these models); alignment models key on
        # mutant — same join the merge layer performs per config.json
        frame = si.merge(te, on="mutated_sequence", suffixes=("", "_te"))
        for col in frame.columns:
            if col in ("mutant", "mutated_sequence", "DMS_score"):
                continue
            rho = spearmanr(frame[col], frame["DMS_score"]).correlation
            print(f"  {col}: Spearman vs assay = {rho:+.3f}")


if __name__ == "__main__":
    run()
