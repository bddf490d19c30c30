"""ProteinMPNN: decoding-order autoregressive invariants, scoring, parsing."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.data.structures import (
    parse_pdb_backbone, synthetic_helix_backbone,
)
from proteingym_tpu.models import protein_mpnn as mpnn

TINY = mpnn.MpnnConfig(name="tiny", hidden_dim=32, edge_features=32,
                       k_neighbors=8)
AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def setup():
    L = 16
    coords = synthetic_helix_backbone(L)
    params = mpnn.init_params(jax.random.PRNGKey(0), TINY)
    rs = np.random.RandomState(0)
    seq = "".join(AA[i] for i in rs.randint(0, 20, L))
    return coords, params, seq


class TestDecoder:
    def test_first_decoded_position_is_sequence_independent(self, setup):
        """The first position in the decoding order conditions only on the
        structure, so its log-probs must not change with the sequence."""
        coords, params, seq = setup
        enc = mpnn.encode(params, TINY, jnp.asarray(coords, jnp.float32))
        L = len(seq)
        order = np.arange(L, dtype=np.int32)  # position 0 decoded first
        t1 = mpnn.tokenize_sequence(seq)
        t2 = mpnn.tokenize_sequence(seq[::-1])
        lp1 = np.asarray(mpnn.decode(params, TINY, enc, jnp.asarray(t1),
                                     jnp.asarray(order)))
        lp2 = np.asarray(mpnn.decode(params, TINY, enc, jnp.asarray(t2),
                                     jnp.asarray(order)))
        np.testing.assert_allclose(lp1[0], lp2[0], atol=1e-5)
        assert not np.allclose(lp1[-1], lp2[-1])

    def test_future_positions_do_not_leak(self, setup):
        """Changing the residue at a LATER decoding position must not change
        log-probs at earlier ones."""
        coords, params, seq = setup
        enc = mpnn.encode(params, TINY, jnp.asarray(coords, jnp.float32))
        L = len(seq)
        order = jnp.asarray(np.arange(L, dtype=np.int32))
        t1 = mpnn.tokenize_sequence(seq)
        t2 = t1.copy()
        t2[-1] = (t2[-1] + 3) % 20
        lp1 = np.asarray(mpnn.decode(params, TINY, enc, jnp.asarray(t1), order))
        lp2 = np.asarray(mpnn.decode(params, TINY, enc, jnp.asarray(t2), order))
        np.testing.assert_allclose(lp1[: L - 1], lp2[: L - 1], atol=1e-5)

    def test_log_probs_normalized(self, setup):
        coords, params, seq = setup
        enc = mpnn.encode(params, TINY, jnp.asarray(coords, jnp.float32))
        order = jnp.asarray(np.arange(len(seq), dtype=np.int32))
        lp = np.asarray(
            mpnn.decode(params, TINY, enc,
                        jnp.asarray(mpnn.tokenize_sequence(seq)), order)
        )
        np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-5)


class TestScoring:
    def test_score_sequences_deterministic_and_finite(self, setup):
        coords, params, seq = setup
        muts = [seq, seq[:3] + "W" + seq[4:], seq[:8] + "C" + seq[9:]]
        a = mpnn.score_sequences(params, TINY, coords, muts, n_orders=3)
        b = mpnn.score_sequences(params, TINY, coords, muts, n_orders=3)
        assert a.shape == (3,)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b)
        assert (a < 0).all()  # -NLL

    def test_more_orders_changes_estimate(self, setup):
        coords, params, seq = setup
        a = mpnn.score_sequences(params, TINY, coords, [seq], n_orders=1,
                                 seed=1)
        b = mpnn.score_sequences(params, TINY, coords, [seq], n_orders=1,
                                 seed=2)
        assert not np.allclose(a, b)


class TestConversion:
    def test_torch_state_dict_shapes(self, setup):
        import torch

        coords, _, seq = setup
        c = TINY
        h = c.hidden_dim
        sd = {
            "features.embeddings.linear.weight": torch.randn(
                c.num_positional_embeddings, 2 * c.max_relative_feature + 2
            ),
            "features.embeddings.linear.bias": torch.randn(
                c.num_positional_embeddings
            ),
            "features.edge_embedding.weight": torch.randn(
                c.edge_features, c.num_positional_embeddings + 25 * c.num_rbf
            ),
            "features.norm_edges.weight": torch.randn(c.edge_features),
            "features.norm_edges.bias": torch.randn(c.edge_features),
            "W_e.weight": torch.randn(h, c.edge_features),
            "W_e.bias": torch.randn(h),
            "W_s.weight": torch.randn(c.vocab, h),
            "W_out.weight": torch.randn(c.vocab, h),
            "W_out.bias": torch.randn(c.vocab),
        }
        for i in range(c.num_encoder_layers):
            lp = f"encoder_layers.{i}"
            for w, n_in in [("W1", 3 * h), ("W2", h), ("W3", h),
                            ("W11", 3 * h), ("W12", h), ("W13", h)]:
                sd[f"{lp}.{w}.weight"] = torch.randn(h, n_in)
                sd[f"{lp}.{w}.bias"] = torch.randn(h)
            for n in ("norm1", "norm2", "norm3"):
                sd[f"{lp}.{n}.weight"] = torch.randn(h)
                sd[f"{lp}.{n}.bias"] = torch.randn(h)
            sd[f"{lp}.dense.W_in.weight"] = torch.randn(4 * h, h)
            sd[f"{lp}.dense.W_in.bias"] = torch.randn(4 * h)
            sd[f"{lp}.dense.W_out.weight"] = torch.randn(h, 4 * h)
            sd[f"{lp}.dense.W_out.bias"] = torch.randn(h)
        for i in range(c.num_decoder_layers):
            lp = f"decoder_layers.{i}"
            for w, n_in in [("W1", 4 * h), ("W2", h), ("W3", h)]:
                sd[f"{lp}.{w}.weight"] = torch.randn(h, n_in)
                sd[f"{lp}.{w}.bias"] = torch.randn(h)
            for n in ("norm1", "norm2"):
                sd[f"{lp}.{n}.weight"] = torch.randn(h)
                sd[f"{lp}.{n}.bias"] = torch.randn(h)
            sd[f"{lp}.dense.W_in.weight"] = torch.randn(4 * h, h)
            sd[f"{lp}.dense.W_in.bias"] = torch.randn(4 * h)
            sd[f"{lp}.dense.W_out.weight"] = torch.randn(h, 4 * h)
            sd[f"{lp}.dense.W_out.bias"] = torch.randn(h)

        params = mpnn.convert_torch_state_dict(sd, c)
        init = mpnn.init_params(jax.random.PRNGKey(0), c)

        def shapes(tree):
            return jax.tree.map(lambda x: tuple(x.shape), tree)

        assert shapes(params) == shapes(init)
        out = mpnn.score_sequences(params, c, coords, [seq], n_orders=2)
        assert np.isfinite(out).all()


class TestPdbParser:
    def test_roundtrip_synthetic_pdb(self, tmp_path):
        coords = synthetic_helix_backbone(3)
        lines = []
        serial = 1
        for i in range(3):
            for j, atom in enumerate(["N", "CA", "C", "O"]):
                x, y, z = coords[i, j]
                lines.append(
                    f"ATOM  {serial:5d} {atom:<4s} ALA A{i + 1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           "
                    f"{atom[0]}"
                )
                serial += 1
        p = tmp_path / "t.pdb"
        p.write_text("\n".join(lines) + "\n")
        parsed, seq = parse_pdb_backbone(p)
        assert parsed.shape == (3, 4, 3)
        assert seq == "AAA"
        np.testing.assert_allclose(parsed, coords, atol=1e-3)
