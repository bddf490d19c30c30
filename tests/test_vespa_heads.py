"""VESPA heads: ConsCNN torch parity, SAV blend semantics, scorer wiring.

Reference: proteingym/baselines/vespa/compute_fitness.py (shells out to
the Rostlab vespa CLI); heads per Marquet et al. 2022 — see
proteingym_tpu/models/vespa_heads.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from proteingym_tpu.models import vespa_heads


def _torch_conscnn(d_model=20, hidden=6, seed=0):
    torch.manual_seed(seed)
    return torch.nn.Sequential(
        torch.nn.Conv2d(d_model, hidden, kernel_size=(7, 1),
                        padding=(3, 0)),
        torch.nn.ReLU(),
        torch.nn.Dropout(0.25),
        torch.nn.Conv2d(hidden, vespa_heads.N_CLASSES, kernel_size=(7, 1),
                        padding=(3, 0)),
    ).eval()


def test_conscnn_torch_parity():
    d_model, L = 20, 17
    model = _torch_conscnn(d_model=d_model)
    params = vespa_heads.convert_conscnn_state_dict(model.state_dict())

    rs = np.random.RandomState(0)
    emb = rs.randn(L, d_model).astype(np.float32)
    with torch.no_grad():
        # the torch head consumes (B, C, L, 1)
        want = model(
            torch.from_numpy(emb.T[None, :, :, None])
        )[0, :, :, 0].T.numpy()
    got = np.asarray(vespa_heads.conscnn_apply(params, emb))
    np.testing.assert_allclose(got, want, atol=1e-5)

    probs = np.asarray(vespa_heads.conservation_probs(params, emb))
    assert probs.shape == (L, vespa_heads.N_CLASSES)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_conscnn_converter_rejects_wrong_head():
    bad = {
        "classifier.0.weight": torch.zeros(4, 8, 7, 1),
        "classifier.0.bias": torch.zeros(4),
        "classifier.3.weight": torch.zeros(7, 4, 7, 1),  # 7 != 9 classes
        "classifier.3.bias": torch.zeros(7),
    }
    with pytest.raises(ValueError, match="conservation classes"):
        vespa_heads.convert_conscnn_state_dict(bad)


def test_vespa_table_semantics():
    wt = "MKTAYIAK"
    L = len(wt)
    rs = np.random.RandomState(1)
    # position 0 maximally conserved (class 8), position 1 maximally
    # variable (class 0), the rest uniform
    cons = np.full((L, 9), 1.0 / 9, np.float32)
    cons[0] = np.eye(9, dtype=np.float32)[8]
    cons[1] = np.eye(9, dtype=np.float32)[0]

    table = vespa_heads.vespa_table(wt, cons)
    assert table.shape == (L, 20)
    assert (table >= 0).all() and (table <= 1).all()
    aa_idx = {a: i for i, a in enumerate(vespa_heads.AA20)}
    for pos, a in enumerate(wt):
        assert table[pos, aa_idx[a]] == 0.0  # WT cells carry no effect
    # same substitution at a conserved site is more damaging than at a
    # variable site (DEFAULT_BLEND's conservation weights are monotone)
    assert table[0, aa_idx["W"]] > table[1, aa_idx["W"]]

    # full mode: a mutant the trunk finds likely (high log-odds) is less
    # damaging than one it finds unlikely
    logodds = np.full((L, 20), -3.0, np.float32)
    logodds[2, aa_idx["W"]] = 0.0
    full = vespa_heads.vespa_table(wt, cons, logodds)
    assert full[2, aa_idx["W"]] < full[2, aa_idx["C"]]

    # ProteinGym ingestion semantics (ref vespa/compute_fitness.py:90-108):
    # sum of log(1-p) over non-synonymous singles, synonymous skipped,
    # higher = fitter (all-negative for real effect probabilities)
    scores = vespa_heads.score_mutants(
        table, wt, ["M1W", "K2W", "M1W:K2W", "WT", "M1M", "M1M:K2W"])
    np.testing.assert_allclose(scores[0], np.log1p(-table[0, aa_idx["W"]]),
                               atol=1e-6)
    np.testing.assert_allclose(scores[2], scores[0] + scores[1], atol=1e-6)
    assert scores[3] == 0.0
    assert scores[4] == 0.0  # fully-synonymous mutant
    np.testing.assert_allclose(scores[5], scores[1], atol=1e-6)
    assert (scores[:3] < 0).all()

    # non-AA20 mutant amino acid fails loudly
    with pytest.raises(ValueError, match="standard residues"):
        vespa_heads.score_mutants(table, wt, ["M1X"])

    # non-AA20 wild-type rows are NaN and fail loudly when touched
    wtx = "MXTAYIAK"
    tab_x = vespa_heads.vespa_table(wtx, cons)
    assert np.isnan(tab_x[1]).all() and np.isfinite(tab_x[0]).all()
    with pytest.raises(ValueError, match="non-AA20 wild type"):
        vespa_heads.score_mutants(tab_x, wtx, ["X2W"])
    # untouched rows still score
    assert np.isfinite(
        vespa_heads.score_mutants(tab_x, wtx, ["M1W"])).all()

    # VESPAl accepts a 10-weight blend (no log-odds coefficient)
    light = vespa_heads.vespa_table(
        wt, cons, None,
        {"w": np.zeros(10, np.float32), "b": 1.0})
    np.testing.assert_allclose(
        light[0, aa_idx["W"]], 1.0 / (1.0 + np.exp(-1.0)), atol=1e-6)
    with pytest.raises(ValueError, match="blend weights"):
        vespa_heads.vespa_table(wt, cons, logodds,
                                {"w": np.zeros(10, np.float32), "b": 0.0})


def test_vespa_full_scoring_mode(tmp_path):
    """CLI convert (prot_t5 + vespa_conscnn) -> vespa_mode=full/light."""
    import pandas as pd

    from tests.test_prot_t5 import _hf_seq2seq
    from proteingym_tpu.pipeline.cli import main

    model = _hf_seq2seq(tie=True, seed=7)
    torch.save(model.state_dict(), tmp_path / "t5.pt")
    assert main(["convert", "--family", "prot_t5", "--preset",
                 "prot_t5_tiny", "--checkpoint", str(tmp_path / "t5.pt"),
                 "--output", str(tmp_path / "t5")]) == 0

    cnn = _torch_conscnn(d_model=64, hidden=6, seed=3)  # d_model matches t5
    torch.save(cnn.state_dict(), tmp_path / "cons.pt")
    assert main(["convert", "--family", "vespa_conscnn", "--preset",
                 "prott5cons", "--checkpoint", str(tmp_path / "cons.pt"),
                 "--output", str(tmp_path / "cons")]) == 0

    from proteingym_tpu.data.reference import AssayRecord
    from proteingym_tpu.pipeline.scorers import ScoreContext
    from proteingym_tpu.pipeline.scorers_extra import score_vespag

    wt = "MKTAYIAK"
    frame = pd.DataFrame({"mutant": ["M1A", "K2C", "T3W"]})
    record = AssayRecord(DMS_id="T", DMS_filename="T.csv",
                         UniProt_ID="UPT", target_seq=wt, seq_len=len(wt))

    def run(mode, **extra):
        ctx = ScoreContext(
            record=record, dms_frame=frame.copy(),
            extra={"prot_t5_checkpoint": str(tmp_path / "t5"),
                   "conscnn_checkpoint": str(tmp_path / "cons"),
                   "vespa_mode": mode, **extra},
        )
        return score_vespag(ctx)["VESPA_score"].to_numpy()

    full, light = run("full"), run("light")
    assert np.isfinite(full).all() and np.isfinite(light).all()
    # reference ingestion: sum log(1-p) over singles -> strictly negative
    assert (full < 0).all() and (light < 0).all()
    # the log-odds feature must actually change the blend
    assert not np.allclose(full, light)

    # a custom blend sidecar overrides DEFAULT_BLEND
    import json

    blend = {"w": [0.0] * vespa_heads.N_FEATURES, "b": 2.0}
    (tmp_path / "blend.json").write_text(json.dumps(blend))
    const = run("full", vespa_blend=str(tmp_path / "blend.json"))
    np.testing.assert_allclose(
        const, np.log1p(-1.0 / (1.0 + np.exp(-2.0))), atol=1e-6)

    # missing conscnn checkpoint fails loudly
    ctx = ScoreContext(record=record, dms_frame=frame.copy(),
                       extra={"prot_t5_checkpoint": str(tmp_path / "t5"),
                              "vespa_mode": "full"})
    with pytest.raises(ValueError, match="conscnn_checkpoint"):
        score_vespag(ctx)
