"""pgym train + supervised-score subcommands."""

import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")

from proteingym_tpu.pipeline.cli import main

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("train")
    rs = np.random.RandomState(0)
    L = 15
    target = "".join(AA[i] for i in rs.randint(0, 20, L))
    (root / "msa").mkdir()
    (root / "dms").mkdir()
    lines = [f">f/1-{L}", target]
    for i in range(20):
        s = list(target)
        for p in rs.choice(L, 3, replace=False):
            s[p] = AA[rs.randint(20)]
        lines += [f">h{i}", "".join(s)]
    (root / "msa" / "T.a2m").write_text("\n".join(lines) + "\n")
    muts = [f"{target[p]}{p + 1}A" for p in range(L) if target[p] != "A"]
    pd.DataFrame(
        {"mutant": muts,
         "mutated_sequence": [target[: int(m[1:-1]) - 1] + "A"
                              + target[int(m[1:-1]):] for m in muts],
         "DMS_score": rs.normal(size=len(muts))}
    ).to_csv(root / "dms" / "T.csv", index=False)
    pd.DataFrame(
        [{"DMS_id": "T", "DMS_filename": "T.csv", "UniProt_ID": "T",
          "target_seq": target, "seq_len": L, "MSA_filename": "T.a2m",
          "MSA_start": 1, "MSA_end": L}]
    ).to_csv(root / "ref.csv", index=False)
    return root


def test_train_eve_writes_orbax_checkpoint(world, tmp_path):
    rc = main(
        ["train", "--model", "eve",
         "--dms-reference", str(world / "ref.csv"), "--dms-id", "T",
         "--msa-dir", str(world / "msa"),
         "--output-dir", str(tmp_path), "--steps", "5"]
    )
    assert rc == 0
    ckpt = tmp_path / "eve_T_seed0"
    assert ckpt.exists()
    from proteingym_tpu.pipeline.checkpoints import restore_pytree

    params = restore_pytree(ckpt)
    assert "encoder" in params and "decoder" in params


def test_train_potts_writes_plmc_model(world, tmp_path):
    rc = main(
        ["train", "--model", "potts",
         "--dms-reference", str(world / "ref.csv"), "--dms-id", "T",
         "--msa-dir", str(world / "msa"),
         "--output-dir", str(tmp_path), "--steps", "20"]
    )
    assert rc == 0
    path = tmp_path / "potts_T_seed0.model"
    assert path.exists()
    from proteingym_tpu.models.potts import read_plmc_model

    model = read_plmc_model(path)
    assert model.L == 15


def test_supervised_score_layout(world, tmp_path):
    rc = main(
        ["supervised-score", "--model", "OHE_ridge",
         "--dms-reference", str(world / "ref.csv"),
         "--dms-dir", str(world / "dms"),
         "--output-dir", str(tmp_path)]
    )
    assert rc == 0
    for scheme in ("fold_random_5", "fold_modulo_5", "fold_contiguous_5"):
        f = tmp_path / scheme / "ohe_ridge" / "T.csv"
        assert f.exists(), scheme
        frame = pd.read_csv(f)
        assert {"mutant", "y_pred", "DMS_score"} <= set(frame.columns)


def test_supervised_score_embeddings_and_aug(world, tmp_path):
    """embeddings_ridge trunk features + --aug-scores-dir augmentation
    through the batch command (the remaining published supervised
    recipes)."""
    # fabricate a zero-shot score dir: scores == labels (fully predictive)
    zs_dir = tmp_path / "zs"
    zs_dir.mkdir()
    dms = pd.read_csv(world / "dms" / "T.csv")
    pd.DataFrame(
        {"mutant": dms["mutant"], "ESM_score": dms["DMS_score"]}
    ).to_csv(zs_dir / "T.csv", index=False)

    rc = main(
        ["supervised-score", "--model", "embeddings_ridge",
         "--dms-reference", str(world / "ref.csv"),
         "--dms-dir", str(world / "dms"),
         "--output-dir", str(tmp_path / "out"),
         "--checkpoint", "esm2_tiny",
         "--aug-scores-dir", str(zs_dir)]
    )
    assert rc == 0
    f = tmp_path / "out" / "fold_random_5" / "embeddings_ridge" / "T.csv"
    assert f.exists()
    frame = pd.read_csv(f)
    from scipy.stats import spearmanr

    rho = spearmanr(frame["y_pred"], frame["DMS_score"]).correlation
    assert rho > 0.8, rho  # the aux feature carries the signal
