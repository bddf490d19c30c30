"""Smoke every registered scorer end-to-end through the CLI contract."""

import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")

from proteingym_tpu.data.reference import load_reference
from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.pipeline.cli import main
from proteingym_tpu.pipeline.scorers import SCORERS

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo")
    rs = np.random.RandomState(0)
    L = 20
    target = "".join(AA[i] for i in rs.randint(0, 20, L))
    (root / "msa").mkdir()
    (root / "dms").mkdir()
    (root / "pdb").mkdir()
    lines = [f">focus/1-{L}", target]
    for i in range(25):
        s = list(target)
        for p in rs.choice(L, 4, replace=False):
            s[p] = AA[rs.randint(20)]
        lines += [f">h{i}", "".join(s)]
    (root / "msa" / "Z.a2m").write_text("\n".join(lines) + "\n")
    muts, seqs = [], []
    for p in range(L):
        for m in AA[:2]:
            if m != target[p]:
                muts.append(f"{target[p]}{p + 1}{m}")
                seqs.append(target[:p] + m + target[p + 1 :])
    pd.DataFrame(
        {"mutant": muts, "mutated_sequence": seqs,
         "DMS_score": rs.normal(size=len(muts))}
    ).to_csv(root / "dms" / "Z.csv", index=False)
    # synthetic structure PDB
    coords = synthetic_helix_backbone(L)
    plines = []
    serial = 1
    three = {"A": "ALA"}
    aa3 = {
        "A": "ALA", "C": "CYS", "D": "ASP", "E": "GLU", "F": "PHE",
        "G": "GLY", "H": "HIS", "I": "ILE", "K": "LYS", "L": "LEU",
        "M": "MET", "N": "ASN", "P": "PRO", "Q": "GLN", "R": "ARG",
        "S": "SER", "T": "THR", "V": "VAL", "W": "TRP", "Y": "TYR",
    }
    for i in range(L):
        for j, atom in enumerate(["N", "CA", "C", "O"]):
            x, y, z = coords[i, j]
            plines.append(
                f"ATOM  {serial:5d} {atom:<4s} {aa3[target[i]]} A{i + 1:4d}"
                f"    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           "
                f"{atom[0]}"
            )
            serial += 1
    (root / "pdb" / "UPZ.pdb").write_text("\n".join(plines) + "\n")
    pd.DataFrame(
        [{
            "DMS_id": "Z", "DMS_filename": "Z.csv", "UniProt_ID": "UPZ",
            "target_seq": target, "seq_len": L, "MSA_filename": "Z.a2m",
            "MSA_start": 1, "MSA_end": L, "MSA_theta": 0.2,
            "weight_file_name": "Z_w.npy",
        }]
    ).to_csv(root / "ref.csv", index=False)
    return root


FAST_EXTRA = {
    "eve": ["train_steps=30", "num_samples=50", "encoder_hidden=32",
            "decoder_hidden=32", "z_dim=4"],
    "deepsequence": ["train_steps=30", "num_samples=50", "encoder_hidden=32",
                     "decoder_hidden=32", "z_dim=4"],
    "potts": ["plm_steps=30"],
    "evmutation": ["plm_steps=30"],
    "vespag": ["train_steps=30"],
    "vespa": ["train_steps=30"],
    "kermut": ["gp_steps=10", "n_orders=1"],
    "msa_transformer": ["msa_samples=6", "num_seeds=1"],
    "poet": ["max_context_tokens=60", "n_context_samples=1"],
    "protein_mpnn": ["num_seq_per_target=2"],
    "unirep": ["hidden_dim=32", "embed_dim=8"],
    "protgpt2": ["num_layers=2", "embed_dim=64", "num_heads=4"],
    "progen3": ["tiny=1"],
    "proteinnpt": ["npt_steps=30", "npt_dim=16", "npt_layers=1"],
}
NEEDS_STRUCTURE = {
    "protein_mpnn", "esm_if1", "saprot", "protssn", "mif", "mulan", "kermut",
}
SLOW_SKIP = set()  # all scorers run in the tiny world


@pytest.mark.parametrize("model", sorted(SCORERS))
def test_scorer_smoke(model, world):
    if model in SLOW_SKIP:
        pytest.skip("slow")
    args = [
        "score", "--model", model,
        "--dms-reference", str(world / "ref.csv"),
        "--dms-dir", str(world / "dms"),
        "--msa-dir", str(world / "msa"),
        "--weights-dir", str(world / "w"),
        "--structure-dir", str(world / "pdb"),
        "--output-dir", str(world / "scores" / model),
        "--batch-size", "8",
        "--quiet", "--fail-fast", "--overwrite",
    ]
    extra = FAST_EXTRA.get(model)
    if extra:
        args += ["--extra", *extra]
    # tiny checkpoints for trunk-based scorers
    preset = {
        "esm": "esm2_t6_8M", "carp": "carp_600k", "esmc": "esmc_tiny",
        "esm3": "esm3_tiny", "xtrimopglm": "xtrimopglm_tiny",
        "poet": "poet_tiny", "msa_transformer": "msa_tiny",
    }.get(model)
    if preset:
        args += ["--checkpoint", preset]
    rc = main(args)
    assert rc == 0, f"{model} failed"
    frame = pd.read_csv(world / "scores" / model / "Z.csv")
    new_cols = [c for c in frame.columns
                if c not in ("mutant", "mutated_sequence", "DMS_score")]
    assert new_cols, f"{model}: no score column written"
    assert frame[new_cols[-1]].notna().any(), f"{model}: all-NaN scores"


def test_protssn_ensemble_column(world):
    """Comma-separated checkpoints produce the averaged ProtSSN_ensemble
    column (the published 9-member recipe)."""
    args = [
        "score", "--model", "protssn",
        "--dms-reference", str(world / "ref.csv"),
        "--dms-dir", str(world / "dms"),
        "--msa-dir", str(world / "msa"),
        "--weights-dir", str(world / "w"),
        "--structure-dir", str(world / "pdb"),
        "--output-dir", str(world / "scores" / "protssn_ens"),
        "--checkpoint", "protssn_tiny,protssn_tiny",
        "--quiet", "--fail-fast", "--overwrite",
    ]
    assert main(args) == 0
    frame = pd.read_csv(world / "scores" / "protssn_ens" / "Z.csv")
    assert "ProtSSN_ensemble" in frame.columns
    assert frame["ProtSSN_ensemble"].notna().any()
    # identical members -> ensemble equals the single-member column
    # (comparison only if the parametrized smoke test already ran in this
    # fixture — running `-k ensemble` alone must not fail on the read)
    single_path = world / "scores" / "protssn" / "Z.csv"
    if single_path.exists():
        single = pd.read_csv(single_path)
        if "ProtSSN_score" in single.columns:
            np.testing.assert_allclose(
                frame["ProtSSN_ensemble"], single["ProtSSN_score"],
                rtol=1e-6,
            )
