"""Indel prior realignment (native Clustal-Omega replacement) + fusion
passthrough on inserted rows."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu import native
from proteingym_tpu.models import retrieval

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="needs native aligner"
)

AA = "ACDEFGHIKLMNPQRSTVWY"


def _prior(L, vocab=25, seed=0):
    rs = np.random.RandomState(seed)
    with np.errstate(divide="ignore"):
        return np.log(rs.dirichlet(np.ones(vocab), size=L))


class TestIndelRealignment:
    def test_identity_keeps_prior(self):
        ref = "ACDEFGHIKL"
        prior = _prior(10)
        new, s, e = retrieval.update_msa_prior_indel(prior, 0, 10, ref, ref)
        assert (s, e) == (0, 10)
        np.testing.assert_allclose(new, prior)

    def test_deletion_drops_row(self):
        ref = "ACDEFGHIKL"
        mut = "ACDFGHIKL"  # E (pos 4) deleted
        prior = _prior(10)
        new, s, e = retrieval.update_msa_prior_indel(prior, 0, 10, ref, mut)
        assert e - s == 9
        np.testing.assert_allclose(new[:3], prior[:3])
        np.testing.assert_allclose(new[3:], prior[4:])

    def test_insertion_adds_zero_row(self):
        ref = "ACDEFGHIKL"
        mut = "ACDEWFGHIKL"  # W inserted after E
        prior = _prior(10)
        new, s, e = retrieval.update_msa_prior_indel(prior, 0, 10, ref, mut)
        assert e - s == 11
        zero_rows = np.where((new == 0).all(1))[0]
        assert len(zero_rows) == 1
        np.testing.assert_allclose(
            np.delete(new, zero_rows[0], axis=0), prior
        )

    def test_fusion_skips_inserted_rows(self):
        """Zero log-prior rows must pass AR log-probs through unfused
        (ref tranception model_pytorch.py:834-838)."""
        rs = np.random.RandomState(1)
        T, V = 8, 25
        logits = rs.randn(1, T, V).astype(np.float32)
        shift = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        prior = _prior(10, seed=2).astype(np.float32)
        prior[4] = 0.0  # inserted row
        fuse = retrieval.make_fusion(prior, 0, 10, alpha=0.5)
        targets = rs.randint(5, V, (1, T)).astype(np.int32)
        starts = np.zeros(1, np.int32)
        ends = np.full(1, T, np.int32)
        got = np.asarray(
            fuse(jnp.asarray(shift), jnp.asarray(targets),
                 jnp.asarray(starts), jnp.asarray(ends), False)
        )
        # row 4 untouched; other in-range rows fused
        np.testing.assert_allclose(got[0, 4], shift[0, 4], atol=1e-6)
        assert not np.allclose(got[0, 3], shift[0, 3])


class TestPerRowIndelFusion:
    def test_make_indel_fusion_tables_and_scoring(self):
        """End-to-end: per-sequence realigned priors flow through the AR
        harness, and a deletion shifts which prior rows fuse (the tail of
        the mutant must fuse against shifted, not WT-frame, rows)."""
        import jax

        from proteingym_tpu.models import trancepteve as te
        from proteingym_tpu.models.tranception import TranceptionConfig, init_params

        rs = np.random.RandomState(0)
        target = "MKLVAGDEFWHCRTYPQNSA"
        muts = [target[:7] + target[8:],            # deletion at pos 8
                target[:5] + "A" + target[5:]]      # insertion at pos 6
        prior = np.log(
            rs.dirichlet(np.ones(20), len(target)) + 1e-9
        )
        full = np.zeros((len(target), 25))
        full[:, 5:] = prior
        fusion, table_of = retrieval.make_indel_fusion(
            full, 0, len(target), alpha=0.5, target_seq=target,
            sequences=muts,
        )
        assert fusion.per_row
        assert set(table_of) == set(muts) | {target}
        # deletion table: one fewer live row; insertion: AR-only row added
        tabs = np.asarray(fusion.args["msa_lp"])
        ends = np.asarray(fusion.args["msa_end"])
        assert ends[table_of[muts[0]]] == len(target) - 1
        assert ends[table_of[muts[1]]] == len(target) + 1
        # exactly one AR-only (all-zero) row inside the live region — the
        # aligner may place the insertion at either of the ambiguous 'A'
        # positions, so check presence, not index
        ins_tab = tabs[table_of[muts[1]]][: ends[table_of[muts[1]]]]
        zero_rows = np.where(~np.any(ins_tab != 0.0, axis=-1))[0]
        assert len(zero_rows) == 1

        config = TranceptionConfig("tiny", 2, 64, 4)
        params = init_params(jax.random.PRNGKey(0), config)
        frame = te.score_trancepteve(
            params, config, ["d8", "i6"], muts, target,
            rcfg=te.RetrievalConfig(retrieval_type="Tranception",
                                    msa_start=0, msa_end=len(target),
                                    indel_mode=True),
            msa_log_prior=full, alpha=0.5, scoring_mirror=True,
            batch_size=4, indel_mode=True,
        )
        assert np.isfinite(frame["avg_score"]).all()
