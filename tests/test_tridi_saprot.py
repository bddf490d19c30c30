"""3Di structure tokens + SaProt structure-aware masked LM."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import saprot
from proteingym_tpu.ops import tridi

AA = "ACDEFGHIKLMNPQRSTVWY"


class TestTridi:
    def test_descriptors_shape_and_range(self):
        coords = synthetic_helix_backbone(20)
        desc, partner = tridi.tridi_descriptors(coords)
        assert desc.shape == (20, 10)
        assert np.isfinite(desc).all()
        assert (np.abs(desc[:, :5]) <= 1 + 1e-6).all()  # cosines
        assert (partner != np.arange(20)).all()

    def test_rigid_motion_invariance(self):
        coords = synthetic_helix_backbone(15)
        rs = np.random.RandomState(0)
        q, _ = np.linalg.qr(rs.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1  # proper rotation
        moved = coords @ q + np.array([5.0, -3.0, 2.0])
        d1, _ = tridi.tridi_descriptors(coords)
        d2, _ = tridi.tridi_descriptors(moved)
        np.testing.assert_allclose(d1, d2, atol=1e-6)

    def test_tokens_deterministic_and_bounded(self):
        coords = synthetic_helix_backbone(25)
        cb = tridi.default_codebook()
        t1 = tridi.structure_tokens(coords, cb)
        t2 = tridi.structure_tokens(coords, cb)
        np.testing.assert_array_equal(t1, t2)
        assert (t1 >= 0).all() and (t1 < 20).all()
        letters = tridi.structure_letters(coords, cb)
        assert len(letters) == 25
        assert set(letters) <= set(tridi.TRIDI_VOCAB)

    def test_kmeans_codebook_separates(self):
        rs = np.random.RandomState(1)
        a = rs.randn(50, 10) + 5
        b = rs.randn(50, 10) - 5
        cb = tridi.train_codebook(np.concatenate([a, b]), k=2, iters=20)
        d = ((np.concatenate([a, b])[:, None] - cb[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
        assert assign[0] != assign[50]


class TestSaProt:
    CFG = None

    @classmethod
    def setup_class(cls):
        import dataclasses

        from proteingym_tpu.models import esm2

        cls.CFG = dataclasses.replace(
            esm2.EsmConfig("tiny", 2, 64, 4, dtype=jnp.float32),
            alphabet_size=saprot.VOCAB.size,
        )
        cls.params = esm2.init_params(jax.random.PRNGKey(0), cls.CFG)

    def test_vocab_blocks(self):
        v = saprot.VOCAB
        assert v.pair_id("A", "p") == 5
        assert v.pair_id("A", "#") == 5 + saprot.BLOCK - 1
        assert v.pair_id("C", "p") == 5 + saprot.BLOCK
        blk = v.aa_block("A")
        assert blk.stop - blk.start == saprot.BLOCK

    def test_score_assay_end_to_end(self):
        rs = np.random.RandomState(2)
        L = 14
        coords = synthetic_helix_backbone(L)
        seq = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{seq[2]}3{'A' if seq[2] != 'A' else 'C'}",
                f"{seq[5]}6W" if seq[5] != "W" else f"{seq[5]}6Y"]
        scores = saprot.score_assay_saprot(
            self.params, self.CFG, seq, coords, muts, batch_size=2
        )
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()

    def test_identity_mutation_scores_zero(self):
        rs = np.random.RandomState(3)
        L = 10
        coords = synthetic_helix_backbone(L)
        seq = "".join(AA[i] for i in rs.randint(0, 20, L))
        m = f"{seq[4]}5{seq[4]}"
        s = saprot.score_assay_saprot(self.params, self.CFG, seq, coords, [m])
        np.testing.assert_allclose(s, 0.0, atol=1e-6)

    def test_wt_mismatch_raises(self):
        coords = synthetic_helix_backbone(6)
        with pytest.raises(ValueError):
            saprot.score_assay_saprot(
                self.params, self.CFG, "AAAAAA", coords, ["C1G"]
            )


class TestProsst:
    def test_k_state_quantizer_and_scoring(self):
        import dataclasses

        from proteingym_tpu.models import esm2
        from proteingym_tpu.models import prosst

        rs = np.random.RandomState(11)
        L = 12
        coords = synthetic_helix_backbone(L)
        toks = prosst.structure_token_ids(coords, k_structure=8)
        assert toks.shape == (L,)
        assert toks.max() < 8
        cfg = dataclasses.replace(
            esm2.EsmConfig("tiny", 2, 64, 4, dtype=jnp.float32)
        )
        params = prosst.prosst_init(jax.random.PRNGKey(0), cfg, k_structure=8)
        seq = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{seq[3]}4{'A' if seq[3] != 'A' else 'C'}"]
        s = prosst.score_assay_prosst(params, cfg, coords, seq, muts,
                                      k_structure=8, chunk=4)
        assert np.isfinite(s).all()
        # different structure tokens change the score
        alt = (toks + 1) % 8
        s2 = prosst.score_assay_prosst(params, cfg, coords, seq, muts,
                                       k_structure=8, struct_tokens=alt,
                                       chunk=4)
        assert not np.allclose(s, s2)


class TestSaProtFileVocab:
    def _write_vocab(self, path, break_contiguity=False):
        toks = ["<cls>", "<pad>", "<eos>", "<unk>"]
        struc = "pynwrqhgdlvtmfsaeikc#"
        for aa in "LAGVSERTIDPKQNFYMHWCX#":
            for sc in struc:
                toks.append(aa + sc)
        toks.append("<mask>")
        if break_contiguity:
            toks[5], toks[6] = toks[6], toks[5]
        path.write_text("\n".join(toks) + "\n")
        return toks

    def test_blocks_and_tokenize(self, tmp_path):
        from proteingym_tpu.models.saprot import SaProtFileVocab

        f = tmp_path / "vocab.txt"
        toks = self._write_vocab(f)
        v = SaProtFileVocab(f)
        assert v.size == len(toks)
        blk = v.aa_block("A")
        assert blk.stop - blk.start == 21
        assert toks[blk.start] == "Ap" and toks[blk.stop - 1] == "A#"
        ids = v.tokenize("LAG", "pyn")
        assert toks[ids[1]] == "Lp" and toks[ids[2]] == "Ay"
        assert ids[0] == v.cls_idx and ids[-1] == v.eos_idx

    def test_contiguity_violation_raises(self, tmp_path):
        from proteingym_tpu.models.saprot import SaProtFileVocab

        f = tmp_path / "vocab.txt"
        self._write_vocab(f, break_contiguity=True)
        with pytest.raises(ValueError):
            SaProtFileVocab(f)

    def test_scoring_with_file_vocab(self, tmp_path):
        import jax

        from proteingym_tpu.models import esm2, saprot

        f = tmp_path / "vocab.txt"
        toks = self._write_vocab(f)
        v = saprot.SaProtFileVocab(f)
        import dataclasses

        config = dataclasses.replace(
            esm2.PRESETS["esm2_t6_8M"], alphabet_size=v.size,
            name="saprot_test",
        )
        params = esm2.init_params(jax.random.PRNGKey(0), config)
        seq = "MKTAYIAKQR"
        struc = "pynwrqhgdl"
        scores = saprot.score_mutants(
            params, config, seq, struc, ["M1A", "K2W"], vocab=v
        )
        assert np.isfinite(scores).all() and scores.std() > 0
