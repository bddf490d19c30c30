"""Pallas fused attention: interpret-mode parity with the XLA reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.ops.flash_attention import flash_mha, mha, reference_mha


def _qkv(rs, b=2, h=3, t=64, d=32):
    q = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    return q, k, v


class TestParity:
    def test_plain(self):
        rs = np.random.RandomState(0)
        q, k, v = _qkv(rs)
        got = flash_mha(q, k, v, interpret=True, block_q=32)
        want = reference_mha(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_causal(self):
        rs = np.random.RandomState(1)
        q, k, v = _qkv(rs, t=48)
        got = flash_mha(q, k, v, causal=True, interpret=True, block_q=16)
        want = reference_mha(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_padding_mask(self):
        rs = np.random.RandomState(2)
        q, k, v = _qkv(rs, b=2, t=40)
        mask = np.ones((2, 40), bool)
        mask[0, 30:] = False
        mask[1, 10:] = False
        got = flash_mha(q, k, v, key_mask=jnp.asarray(mask), interpret=True,
                        block_q=8)
        want = reference_mha(q, k, v, key_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_alibi_bias(self):
        rs = np.random.RandomState(3)
        q, k, v = _qkv(rs, h=4, t=32)
        slopes = np.array([0.25, 0.125, 0.0625, 0.03125])
        bias = jnp.asarray(-slopes[:, None] * np.arange(32)[None, :],
                           jnp.float32)
        got = flash_mha(q, k, v, bias=bias, causal=True, interpret=True,
                        block_q=16)
        want = reference_mha(q, k, v, bias=bias, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_unaligned_length_pads(self):
        rs = np.random.RandomState(4)
        q, k, v = _qkv(rs, t=37)  # not a multiple of block_q
        got = flash_mha(q, k, v, interpret=True, block_q=16)
        want = reference_mha(q, k, v)
        assert got.shape == want.shape == (2, 3, 37, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_dispatch_cpu_uses_reference(self):
        rs = np.random.RandomState(5)
        q, k, v = _qkv(rs, t=16)
        got = mha(q, k, v)
        want = reference_mha(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_row_log_softmax_gather_matches_naive():
    import jax
    import jax.numpy as jnp

    from proteingym_tpu.ops.gather_logprobs import row_log_softmax_gather

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(5, 37, 33)).astype(np.float32))
    offs = jnp.asarray(rng.integers(0, 37, size=5).astype(np.int32))
    naive = jax.nn.log_softmax(logits, -1)[jnp.arange(5), offs]
    got = row_log_softmax_gather(logits, offs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive), atol=1e-6)


class TestGroupedMha:
    """Grouped-heads whole-T kernel (scores in VMEM; G heads/program)."""

    def _qkv(self, b, h, t, d, seed=0):
        rs = np.random.RandomState(seed)
        mk = lambda: jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        return mk(), mk(), mk()

    def test_plain(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha

        q, k, v = self._qkv(2, 4, 40, 16)
        got = grouped_mha(q, k, v, interpret=True)
        want = reference_mha(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_padding_mask_and_bias(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha

        rs = np.random.RandomState(1)
        q, k, v = self._qkv(2, 4, 33, 16, seed=2)
        mask = np.ones((2, 33), bool)
        mask[0, 25:] = False
        mask[1, 10:] = False
        bias = jnp.asarray(rs.randn(4, 33), jnp.float32)
        got = grouped_mha(q, k, v, key_mask=jnp.asarray(mask), bias=bias,
                          interpret=True)
        want = reference_mha(q, k, v, key_mask=jnp.asarray(mask), bias=bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_per_batch_aux_operands(self):
        # group_size dividing H routes the padding mask (and segment map)
        # through per-BATCH (B, 8, T) operands instead of per-(B*H) rows
        from proteingym_tpu.ops.flash_attention import grouped_mha

        q, k, v = self._qkv(2, 4, 40, 16, seed=5)
        mask = np.ones((2, 40), bool)
        mask[0, 30:] = False
        mask[1, 22:] = False
        seg = np.zeros((2, 40), np.int32)
        seg[0, :12] = 1
        seg[0, 12:30] = 2
        seg[1, :22] = 1
        for g in (2, 4):  # both divide H=4 -> per-batch aux path
            got = grouped_mha(q, k, v, key_mask=jnp.asarray(mask),
                              segment_ids=jnp.asarray(seg),
                              interpret=True, group_size=g)
            want = reference_mha(q, k, v, key_mask=jnp.asarray(mask),
                                 segment_ids=jnp.asarray(seg))
            live = seg > 0
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 2, 1, 3)[live],
                np.asarray(want).transpose(0, 2, 1, 3)[live], atol=2e-5,
            )
        # g=8 spans batch rows (8 > H) -> per-(B*H) fallback, same result
        got = grouped_mha(q, k, v, key_mask=jnp.asarray(mask),
                          interpret=True, group_size=8)
        want = reference_mha(q, k, v, key_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_causal(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha

        q, k, v = self._qkv(1, 8, 24, 8, seed=3)
        got = grouped_mha(q, k, v, causal=True, interpret=True)
        want = reference_mha(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_group_size_divides_bh(self):
        """bh=6 is not divisible by the VMEM-derived G; the kernel must
        fall back to a divisor."""
        from proteingym_tpu.ops.flash_attention import grouped_mha

        q, k, v = self._qkv(3, 2, 17, 8, seed=4)
        got = grouped_mha(q, k, v, interpret=True)
        want = reference_mha(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_tranception_alibi_production_regime(self):
        """Grouped-ALiBi key bias is NONNEGATIVE and grows with key
        position (slope*k, max slope 0.5 at 20 heads); at T >= 384 a
        deferred bias add inside exp overflows f32 to Inf/NaN. The
        kernel must include the bias in the softmax row max."""
        from proteingym_tpu.models.tranception import alibi_bias
        from proteingym_tpu.ops.flash_attention import grouped_mha

        rs = np.random.RandomState(7)
        b, h, t, d = 1, 20, 384, 16  # Tranception's 20 heads: max slope 0.5
        q = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        k = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        v = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        bias = jnp.asarray(alibi_bias(h, t)[:, 0, :])  # (H, T), >= 0
        assert float(bias.max()) > 100.0  # the overflow regime is real
        got = grouped_mha(q, k, v, bias=bias, causal=True, interpret=True)
        want = reference_mha(q, k, v, bias=bias, causal=True)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_masked_key_does_not_anchor_softmax_max(self):
        """A padded key whose raw score dominates the row must not anchor
        the softmax max: if the mask joins after the max, every real
        key underflows the f32 denominator and the 1e-30 clamp emits
        garbage."""
        from proteingym_tpu.ops.flash_attention import grouped_mha

        rs = np.random.RandomState(8)
        b, h, t, d = 1, 4, 40, 16
        q = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        k = np.asarray(rs.randn(b, h, t, d), np.float32)
        k[:, :, 30:, :] *= 100.0  # masked keys with huge raw scores
        k = jnp.asarray(k)
        v = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        mask = np.ones((b, t), bool)
        mask[:, 30:] = False
        got = grouped_mha(q, k, v, key_mask=jnp.asarray(mask),
                          interpret=True)
        want = reference_mha(q, k, v, key_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fused_rope_matches_pre_rotated(self):
        """rope_base path == apply_rotary then attention (all dispatches)."""
        from proteingym_tpu.ops.flash_attention import grouped_mha
        from proteingym_tpu.ops.rotary import apply_rotary

        rs = np.random.RandomState(5)
        b, h, t, d = 2, 4, 37, 16
        # build in (B, T, H, D), rotate, then transpose — the model's old
        # path — and compare against the kernel's in-VMEM rotation
        q = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
        k = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
        v = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
        q_r, k_r = apply_rotary(q, k)
        tr = lambda x: x.transpose(0, 2, 1, 3)
        want = reference_mha(tr(q_r), tr(k_r), tr(v))
        got = grouped_mha(tr(q), tr(k), tr(v), rope_base=10000.0,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


class TestBthdKernel:
    """Heads-mid (B, T, H, D) grouped kernel — transpose-free boundary."""

    def _qkv(self, b, t, h, d, seed=0):
        rs = np.random.RandomState(seed)
        mk = lambda: jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
        return mk(), mk(), mk()

    def _ref(self, q, k, v, **kw):
        # reference works in (B, H, T, D)
        tr = lambda x: jnp.swapaxes(x, 1, 2)
        return tr(reference_mha(tr(q), tr(k), tr(v), **kw))

    def test_plain_and_padding(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha_bthd

        q, k, v = self._qkv(2, 150, 4, 32)
        mask = np.ones((2, 150), bool)
        mask[0, 110:] = False
        mask[1, 77:] = False
        km = jnp.asarray(mask)
        got = grouped_mha_bthd(q, k, v, key_mask=km, interpret=True)
        want = self._ref(q, k, v, key_mask=km)
        np.testing.assert_allclose(
            np.asarray(got)[mask], np.asarray(want)[mask], atol=2e-5
        )

    def test_rope_multi_qblock(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha_bthd
        from proteingym_tpu.ops.flash_attention import _apply_rope_bhtd

        q, k, v = self._qkv(1, 256, 2, 32, seed=3)
        tr = lambda x: jnp.swapaxes(x, 1, 2)
        qr, kr = _apply_rope_bhtd(tr(q), tr(k), 10000.0)
        want = tr(reference_mha(qr, kr, tr(v)))
        got = grouped_mha_bthd(q, k, v, rope_base=10000.0, interpret=True,
                               block_q=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_segmented(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha_bthd

        q, k, v = self._qkv(2, 256, 4, 32, seed=4)
        seg = np.zeros((2, 256), np.int32)
        seg[0, :100] = 1
        seg[0, 100:230] = 2
        seg[1, :256] = 1
        sj = jnp.asarray(seg)
        got = grouped_mha_bthd(q, k, v, segment_ids=sj, interpret=True,
                               block_q=128)
        want = self._ref(q, k, v, key_mask=sj > 0, segment_ids=sj)
        live = seg > 0
        np.testing.assert_allclose(
            np.asarray(got)[live], np.asarray(want)[live], atol=2e-5
        )

    def test_causal(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha_bthd

        q, k, v = self._qkv(1, 256, 2, 32, seed=5)
        got = grouped_mha_bthd(q, k, v, causal=True, interpret=True,
                               block_q=128)
        want = self._ref(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_masked_key_does_not_anchor_softmax_max(self):
        from proteingym_tpu.ops.flash_attention import grouped_mha_bthd

        rs = np.random.RandomState(9)
        b, t, h, d = 1, 64, 2, 16
        q = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
        k = np.asarray(rs.randn(b, t, h, d), np.float32)
        k[:, 50:] *= 100.0
        k = jnp.asarray(k)
        v = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
        mask = np.ones((b, t), bool)
        mask[:, 50:] = False
        got = grouped_mha_bthd(q, k, v, key_mask=jnp.asarray(mask),
                               interpret=True)
        want = self._ref(q, k, v, key_mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(got)[mask], np.asarray(want)[mask], atol=2e-5
        )


def test_mha_natural_matches_transposed_mha():
    """The natural-layout entry point is layout plumbing only."""
    from proteingym_tpu.ops.flash_attention import mha, mha_natural

    rs = np.random.RandomState(11)
    b, t, h, d = 2, 40, 4, 16
    q = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    mask = np.ones((b, t), bool)
    mask[0, 30:] = False
    km = jnp.asarray(mask)
    got = mha_natural(q, k, v, key_mask=km, rope_base=10000.0)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    want = tr(mha(tr(q), tr(k), tr(v), key_mask=km, rope_base=10000.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_seg_block_dispatch_pads_unaligned_rows():
    """The long-packed-row dispatch path (T > GROUPED_MAX_SEQ_LEN with
    segment_ids) pads to a SEG_BLOCK multiple and routes to the
    extent-sparse kernel instead of materializing dense HBM scores."""
    from proteingym_tpu.ops.flash_attention import _seg_block_dispatch

    rs = np.random.RandomState(10)
    b, h, t, d = 1, 2, 300, 16  # not a multiple of SEG_BLOCK=128
    q = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
    seg = np.zeros((b, t), np.int32)
    seg[0, :120] = 1
    seg[0, 120:260] = 2  # tail 260: stays padding
    sj = jnp.asarray(seg)
    got = _seg_block_dispatch(q, k, v, sj, interpret=True)
    assert got.shape == (b, h, t, d)
    want = reference_mha(q, k, v, segment_ids=sj, key_mask=sj > 0)
    live = seg > 0
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[live],
        np.asarray(want).transpose(0, 2, 1, 3)[live], atol=2e-5,
    )


def test_seg_block_dispatch_key_mask_folds_into_segments():
    """A key_mask masking positions INSIDE a live segment must be
    honored by the long-row segmented route (mha folds it into the
    segment map: masked keys -> segment 0)."""
    from proteingym_tpu.ops.flash_attention import _seg_block_dispatch

    rs = np.random.RandomState(12)
    b, h, t, d = 1, 2, 256, 16
    q = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
    seg = np.zeros((b, t), np.int32)
    seg[0, :200] = 1
    mask = np.ones((b, t), bool)
    mask[0, 150:200] = False  # masked keys inside segment 1
    sj = jnp.asarray(seg)
    km = jnp.asarray(mask)
    folded = jnp.where(km, sj, 0)  # what mha computes before dispatch
    got = _seg_block_dispatch(q, k, v, folded, interpret=True)
    want = reference_mha(q, k, v, segment_ids=sj, key_mask=km)
    live = (seg > 0) & mask
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[live],
        np.asarray(want).transpose(0, 2, 1, 3)[live], atol=2e-5,
    )
