"""ProtT5 (T5 encoder) parity vs HF transformers at tiny config."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from proteingym_tpu.models import prot_t5


def _hf_model(gated: bool, seed: int = 0):
    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(seed)
    cfg = T5Config(
        vocab_size=48, d_model=64, d_kv=16, num_heads=4, num_layers=2,
        d_ff=128,
        feed_forward_proj="gated-gelu" if gated else "relu",
        is_encoder_decoder=False, use_cache=False, dropout_rate=0.0,
    )
    model = T5EncoderModel(cfg).eval()
    return model


@pytest.mark.parametrize("gated", [False, True])
def test_encoder_parity(gated):
    model = _hf_model(gated)
    sd = model.state_dict()
    config = prot_t5.config_from_state_dict(sd)
    assert config.gated == gated
    assert (config.d_model, config.num_layers, config.num_heads,
            config.d_kv, config.d_ff) == (64, 2, 4, 16, 128)
    params = prot_t5.convert_torch_state_dict(sd, config)

    rs = np.random.RandomState(0)
    tokens = rs.randint(3, 48, (2, 12)).astype(np.int64)
    tokens[0, 9:] = prot_t5.PAD_ID  # ragged row exercises the pad mask
    tokens[0, 8] = prot_t5.EOS_ID
    tokens[1, -1] = prot_t5.EOS_ID
    attn = (tokens != prot_t5.PAD_ID).astype(np.int64)
    with torch.no_grad():
        want = model(
            torch.from_numpy(tokens), attention_mask=torch.from_numpy(attn)
        ).last_hidden_state.numpy()
    got = np.asarray(prot_t5.apply(
        params, config, jnp.asarray(tokens.astype(np.int32))
    ))
    live = attn.astype(bool)
    np.testing.assert_allclose(got[live], want[live], atol=2e-4)


def _hf_seq2seq(seed: int = 1, tie: bool = True):
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(seed)
    cfg = T5Config(
        vocab_size=48, d_model=64, d_kv=16, num_heads=4, num_layers=2,
        d_ff=128, feed_forward_proj="relu", use_cache=False,
        dropout_rate=0.0, decoder_start_token_id=0,
        tie_word_embeddings=tie,
    )
    return T5ForConditionalGeneration(cfg).eval()


@pytest.mark.parametrize("tie", [True, False])
def test_decoder_parity(tie):
    model = _hf_seq2seq(tie=tie)
    sd = model.state_dict()
    config = prot_t5.config_from_state_dict(sd)
    params = prot_t5.convert_torch_state_dict(sd, config)
    assert ("lm_head" in params["decoder"]) == (not tie)

    rs = np.random.RandomState(1)
    enc_in = rs.randint(3, 48, (2, 10)).astype(np.int64)
    enc_in[0, 7:] = prot_t5.PAD_ID
    attn = (enc_in != prot_t5.PAD_ID).astype(np.int64)
    dec_in = np.concatenate(
        [np.zeros((2, 1), np.int64), rs.randint(3, 48, (2, 4))], axis=1
    )
    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(enc_in),
            attention_mask=torch.from_numpy(attn),
            decoder_input_ids=torch.from_numpy(dec_in),
        ).logits.numpy()
    import jax.numpy as jnp

    enc = prot_t5.apply(params, config, jnp.asarray(enc_in.astype(np.int32)))
    got = np.asarray(prot_t5.decoder_apply(
        params, config, jnp.asarray(dec_in.astype(np.int32)), enc,
        jnp.asarray(enc_in == prot_t5.PAD_ID),
    ))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_masked_logodds_reads_sentinel_slot():
    model = _hf_seq2seq(tie=True, seed=5)
    sd = model.state_dict()
    config = prot_t5.config_from_state_dict(sd)
    params = prot_t5.convert_torch_state_dict(sd, config)
    seq = "MKTAYIAK"
    table = prot_t5.masked_logodds(params, config, seq, chunk=3)
    assert table.shape == (len(seq), config.vocab_size)
    assert np.isfinite(table).all()
    # rows are log-probabilities
    np.testing.assert_allclose(np.exp(table).sum(-1), 1.0, atol=1e-4)
    # hand-check position 2 against the HF model
    sid = prot_t5.sentinel_id(config)
    row = prot_t5.tokenize(seq).astype(np.int64)
    row[2] = sid
    with torch.no_grad():
        logits = model(
            input_ids=torch.from_numpy(row[None]),
            decoder_input_ids=torch.tensor([[0, sid]]),
        ).logits.numpy()[0, 1]
    want = logits - np.log(np.exp(logits).sum())
    np.testing.assert_allclose(table[2], want, atol=3e-4)


def test_relative_position_buckets_match_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    for t in (7, 40, 300):
        rel = np.arange(t)[None, :] - np.arange(t)[:, None]
        want = T5Attention._relative_position_bucket(
            torch.from_numpy(rel), bidirectional=True, num_buckets=32,
            max_distance=128,
        ).numpy()
        got = prot_t5._relative_position_bucket(rel)
        np.testing.assert_array_equal(got, want)


def test_cli_convert_and_vespa_scoring(tmp_path):
    """pgym convert --family prot_t5 on a tiny HF T5EncoderModel, then
    score the vespa scorer with the converted trunk supplying the
    embeddings (--extra prot_t5_checkpoint=...)."""
    import pandas as pd

    from proteingym_tpu.pipeline.cli import main

    model = _hf_model(gated=False, seed=3)
    torch.save(model.state_dict(), tmp_path / "t5.pt")
    rc = main(["convert", "--family", "prot_t5", "--preset", "prot_t5_tiny",
               "--checkpoint", str(tmp_path / "t5.pt"),
               "--output", str(tmp_path / "out")])
    assert rc == 0
    import json

    meta = json.loads((tmp_path / "out" / "config.json").read_text())
    assert meta["d_model"] == 64 and meta["num_layers"] == 2

    AA = "ACDEFGHIKLMNPQRSTVWY"
    rs = np.random.RandomState(4)
    L = 14
    wt = "".join(AA[i] for i in rs.randint(0, 20, L))
    # synthetic family MSA so the GEMME teacher has signal
    lines = [f">focus/1-{L}", wt]
    for i in range(25):
        s = list(wt)
        for p in range(1, L, 2):
            if rs.rand() < 0.5:
                s[p] = AA[rs.randint(20)]
        lines += [f">h{i}", "".join(s)]
    msa_dir = tmp_path / "msa"
    msa_dir.mkdir()
    (msa_dir / "T.a2m").write_text("\n".join(lines) + "\n")

    muts = [f"{wt[p]}{p + 1}{'A' if wt[p] != 'A' else 'C'}"
            for p in range(L)]
    frame = pd.DataFrame({"mutant": muts})

    from proteingym_tpu.data.reference import AssayRecord
    from proteingym_tpu.pipeline.scorers import ScoreContext
    from proteingym_tpu.pipeline.scorers_extra import score_vespag

    record = AssayRecord(
        DMS_id="T", DMS_filename="T.csv", UniProt_ID="UPT",
        target_seq=wt, seq_len=L, MSA_filename="T.a2m",
        MSA_start=1, MSA_end=L,
    )
    ctx = ScoreContext(
        record=record, dms_frame=frame, msa_dir=str(msa_dir),
        extra={"prot_t5_checkpoint": str(tmp_path / "out"),
               "train_steps": "30"},
    )
    out = score_vespag(ctx)
    assert "VespaG_score" in out.columns
    assert np.isfinite(out["VespaG_score"].to_numpy()).all()

    # the trunk actually used is ProtT5: its embeddings match the HF
    # encoder on the same tokens
    from proteingym_tpu.models import prot_t5 as m
    from proteingym_tpu.pipeline.checkpoints import restore_pytree

    params = restore_pytree(tmp_path / "out" / "params")
    config = m.config_from_state_dict(model.state_dict())
    emb = np.asarray(m.embeddings(params, config, wt))
    toks = m.tokenize(wt)[None]
    with torch.no_grad():
        want = model(
            torch.from_numpy(toks.astype(np.int64))
        ).last_hidden_state.numpy()[0, :L]
    np.testing.assert_allclose(emb, want, atol=2e-4)


def test_vespa_logodds_scoring_mode(tmp_path):
    """Full seq2seq checkpoint + --extra vespa_mode=logodds: the vespa
    scorer emits masked-reconstruction log-odds deltas."""
    import pandas as pd

    from proteingym_tpu.pipeline.cli import main

    model = _hf_seq2seq(tie=True, seed=7)
    torch.save(model.state_dict(), tmp_path / "t5.pt")
    rc = main(["convert", "--family", "prot_t5", "--preset", "prot_t5_tiny",
               "--checkpoint", str(tmp_path / "t5.pt"),
               "--output", str(tmp_path / "out")])
    assert rc == 0

    wt = "MKTAYIAK"
    muts = ["M1A", "K2C", "T3W", "M1A:K2C"]
    frame = pd.DataFrame({"mutant": muts})

    from proteingym_tpu.data.reference import AssayRecord
    from proteingym_tpu.pipeline.scorers import ScoreContext
    from proteingym_tpu.pipeline.scorers_extra import score_vespag

    record = AssayRecord(DMS_id="T", DMS_filename="T.csv",
                         UniProt_ID="UPT", target_seq=wt, seq_len=len(wt))
    ctx = ScoreContext(
        record=record, dms_frame=frame,
        extra={"prot_t5_checkpoint": str(tmp_path / "out"),
               "vespa_mode": "logodds"},
    )
    out = score_vespag(ctx)
    got = out["VESPA_score"].to_numpy()
    assert np.isfinite(got).all()

    from proteingym_tpu.models import prot_t5 as m
    from proteingym_tpu.pipeline.checkpoints import restore_pytree

    params = restore_pytree(tmp_path / "out" / "params")
    config = m.config_from_state_dict(model.state_dict())
    table = m.masked_logodds(params, config, wt)
    ids = m.AA_TOKEN_IDS
    want0 = table[0, ids["A"]] - table[0, ids["M"]]
    np.testing.assert_allclose(got[0], want0, atol=1e-5)
    # multi-mutant sums the singles
    np.testing.assert_allclose(got[3], got[0] + got[1], atol=1e-5)


def test_embeddings_shape_and_tokens():
    config = prot_t5.PRESETS["prot_t5_tiny"]
    params = prot_t5.init_params(jax.random.PRNGKey(0), config)
    seq = "MKTAYIAK"
    emb = np.asarray(prot_t5.embeddings(params, config, seq))
    assert emb.shape == (len(seq), config.d_model)
    assert np.isfinite(emb).all()
    row = prot_t5.tokenize(seq, pad_to=12)
    assert row.shape == (12,)
    assert row[len(seq)] == prot_t5.EOS_ID
    assert (row[len(seq) + 1:] == prot_t5.PAD_ID).all()
    # override table is honored
    row2 = prot_t5.tokenize("AC", token_ids={"A": 5, "C": 6})
    assert row2[0] == 5 and row2[1] == 6
