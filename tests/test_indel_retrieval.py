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
