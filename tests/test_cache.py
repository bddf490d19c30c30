"""Content-addressed artifact cache."""

import numpy as np

from proteingym_tpu.pipeline.cache import ArtifactCache, content_key


def test_key_sensitivity():
    a = np.arange(10.0)
    k1 = content_key(msa=a, theta=0.2)
    k2 = content_key(msa=a, theta=0.3)
    k3 = content_key(msa=a + 1, theta=0.2)
    assert k1 != k2 != k3
    assert k1 == content_key(msa=np.arange(10.0), theta=0.2)


def test_get_or_compute_roundtrip(tmp_path):
    cache = ArtifactCache(tmp_path)
    calls = []

    def compute():
        calls.append(1)
        return {"weights": np.ones(5), "neff": np.asarray(3.2)}

    out1 = cache.get_or_compute("weights", compute, msa_hash="abc", theta=0.2)
    out2 = cache.get_or_compute("weights", compute, msa_hash="abc", theta=0.2)
    assert len(calls) == 1  # second call served from disk
    np.testing.assert_array_equal(out1["weights"], out2["weights"])
    assert float(out2["neff"]) == 3.2
    out3 = cache.get_or_compute("weights", compute, msa_hash="xyz", theta=0.2)
    assert len(calls) == 2
