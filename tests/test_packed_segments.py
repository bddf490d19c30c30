"""Segment packing: block-diagonal attention + per-segment semantics.

Packing several independent sequences into one row must leave every
sequence's logits EXACTLY as if it were alone (ref
esm/compute_fitness.py:489-504 runs one masked forward per row; our
packed rows fuse many of those forwards into one).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from proteingym_tpu.models import esm2
from proteingym_tpu.models.esm2 import ALPHABET, EsmConfig
from proteingym_tpu.ops import flash_attention as fa

AA = "ACDEFGHIKLMNPQRSTVWY"

TINY = EsmConfig(
    name="tiny", num_layers=2, embed_dim=64, num_heads=4,
    dtype=jnp.float32,
)
TINY_1V = EsmConfig(
    name="tiny1v", num_layers=2, embed_dim=64, num_heads=4,
    dtype=jnp.float32, use_rotary=False, token_dropout=False,
    max_positions=256,
)


def _seqs(rs, lengths):
    return ["".join(AA[i] for i in rs.randint(0, 20, L)) for L in lengths]


class TestSegmentedAttention:
    def _qkv(self, rs, b=2, h=4, t=96, d=32):
        mk = lambda: jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        return mk(), mk(), mk()

    def _segs(self, b, t):
        seg = np.zeros((b, t), np.int32)
        seg[:, :40] = 1
        seg[:, 40:70] = 2
        seg[:, 70:90] = 3
        return seg

    def test_reference_segmented_equals_per_segment(self):
        rs = np.random.RandomState(0)
        q, k, v = self._qkv(rs)
        seg = self._segs(2, 96)
        ref = fa.reference_mha(
            q, k, v, key_mask=jnp.asarray(seg > 0),
            segment_ids=jnp.asarray(seg),
        )
        for lo, hi in [(0, 40), (40, 70), (70, 90)]:
            solo = fa.reference_mha(
                q[:, :, lo:hi], k[:, :, lo:hi], v[:, :, lo:hi]
            )
            np.testing.assert_allclose(
                np.asarray(ref[:, :, lo:hi]), np.asarray(solo), atol=1e-5
            )

    def test_grouped_kernel_interpret_matches_reference(self):
        rs = np.random.RandomState(1)
        q, k, v = self._qkv(rs)
        seg = self._segs(2, 96)
        km, sj = jnp.asarray(seg > 0), jnp.asarray(seg)
        ref = fa.reference_mha(q, k, v, key_mask=km, segment_ids=sj)
        ker = fa.grouped_mha(
            q, k, v, key_mask=km, segment_ids=sj, interpret=True
        )
        # padding positions (seg 0) are unconsumed garbage on both paths
        np.testing.assert_allclose(
            np.asarray(ker[:, :, :90]), np.asarray(ref[:, :, :90]),
            atol=1e-5,
        )

    def test_seg_block_kernel_interpret_matches_reference(self):
        # extent-sparse kernel: segments crossing SEG_BLOCK boundaries,
        # a padded tail, and a full-row single segment
        rs = np.random.RandomState(7)
        b, h, t, d = 2, 4, 512, 32
        mk = lambda: jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        q, k, v = mk(), mk(), mk()
        seg = np.zeros((b, t), np.int32)
        seg[0, :200] = 1
        seg[0, 200:310] = 2
        seg[0, 310:470] = 3  # 470:512 padding
        seg[1, :] = 1  # one segment spanning every block
        sj = jnp.asarray(seg)
        ref = fa.reference_mha(
            q, k, v, key_mask=sj > 0, segment_ids=sj
        )
        got = fa.seg_block_mha(q, k, v, sj, interpret=True)
        live = seg > 0  # (B, T); compare (B, T, H, D) layouts
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1, 3)[live],
            np.asarray(ref).transpose(0, 2, 1, 3)[live], atol=1e-5,
        )

    def test_seg_block_kernel_rope(self):
        rs = np.random.RandomState(8)
        b, h, t, d = 1, 2, 256, 32
        mk = lambda: jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        q, k, v = mk(), mk(), mk()
        seg = np.zeros((b, t), np.int32)
        seg[0, :100] = 1
        seg[0, 100:230] = 2
        sj = jnp.asarray(seg)
        qr, kr = fa._apply_rope_bhtd(q, k, 10000.0)
        ref = fa.reference_mha(qr, kr, v, key_mask=sj > 0, segment_ids=sj)
        got = fa.seg_block_mha(
            q, k, v, sj, rope_base=10000.0, interpret=True
        )
        live = seg > 0
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1, 3)[live],
            np.asarray(ref).transpose(0, 2, 1, 3)[live], atol=1e-4,
        )

    def test_segment_block_extents(self):
        seg = np.zeros((1, 512), np.int32)
        seg[0, :200] = 1       # blocks 0..1
        seg[0, 200:310] = 2    # blocks 1..2
        seg[0, 310:470] = 3    # blocks 2..3
        lo, hi = fa._segment_block_extents(jnp.asarray(seg), 4)
        # q block 0: only segment 1 -> keys [0, 200) -> blocks [0, 2)
        # q block 1: segments 1+2 -> keys [0, 310) -> blocks [0, 3)
        # q block 2: segments 2+3 -> keys [200, 470) -> blocks [1, 4)
        # q block 3: segment 3 + pad tail -> keys [310, 512) -> [2, 4)
        np.testing.assert_array_equal(np.asarray(lo)[0], [0, 0, 1, 2])
        np.testing.assert_array_equal(np.asarray(hi)[0], [2, 3, 4, 4])

    def test_rope_shift_invariance_under_packing(self):
        # rotary attention sees only position DIFFERENCES, so packed
        # segments rotated at GLOBAL row positions must equal a lone
        # sequence rotated at local positions
        rs = np.random.RandomState(2)
        q, k, v = self._qkv(rs)
        seg = self._segs(2, 96)
        km, sj = jnp.asarray(seg > 0), jnp.asarray(seg)
        packed = fa.reference_mha(
            *fa._apply_rope_bhtd(q, k, 10000.0), v,
            key_mask=km, segment_ids=sj,
        )
        qs, ks = fa._apply_rope_bhtd(
            q[:, :, 40:70], k[:, :, 40:70], 10000.0
        )
        solo = fa.reference_mha(qs, ks, v[:, :, 40:70])
        np.testing.assert_allclose(
            np.asarray(packed[:, :, 40:70]), np.asarray(solo), atol=2e-2
        )


class TestSegmentedApply:
    def _packed_row(self, tok_list, row_len):
        row = np.full(row_len, ALPHABET.padding_idx, np.int32)
        seg = np.zeros(row_len, np.int32)
        begin = 0
        for s, toks in enumerate(tok_list, 1):
            row[begin : begin + len(toks)] = toks
            seg[begin : begin + len(toks)] = s
            begin += len(toks)
        return row, seg

    @pytest.mark.parametrize("config", [TINY, TINY_1V], ids=["esm2", "1v"])
    def test_packed_row_matches_solo_forwards(self, config):
        rs = np.random.RandomState(3)
        params = esm2.init_params(jax.random.PRNGKey(0), config)
        tok_list = [ALPHABET.tokenize(s) for s in _seqs(rs, [17, 11, 23])]
        # mask one position per segment (exercises per-segment
        # token-dropout scaling)
        for toks, pos in zip(tok_list, (5, 3, 9)):
            toks[pos] = ALPHABET.mask_idx
        row, seg = self._packed_row(tok_list, 64)
        packed = np.asarray(
            esm2.apply(
                params, config, jnp.asarray(row[None]),
                segment_ids=jnp.asarray(seg[None]),
            )
        )[0]
        begin = 0
        for toks in tok_list:
            solo = np.asarray(
                esm2.apply(params, config, jnp.asarray(toks[None]))
            )[0]
            np.testing.assert_allclose(
                packed[begin : begin + len(toks)], solo, atol=2e-3,
                err_msg=f"segment at {begin}",
            )
            begin += len(toks)


class TestPackedSegmentTables:
    def test_matches_bucketed_packed_tables(self):
        from proteingym_tpu.models import packed_scoring as ps

        rs = np.random.RandomState(4)
        config = TINY
        params = esm2.init_params(jax.random.PRNGKey(1), config)
        # mixed lengths incl. one longer than the window (window path)
        seqs = _seqs(rs, [13, 21, 9, 40])
        token_list = [ALPHABET.tokenize(s) for s in seqs]
        base = ps.packed_masked_marginal_tables(
            esm2.make_apply_fn(config), params, token_list,
            chunk=4, super_chunks=2, window=32,
        )
        seg = ps.packed_segment_tables(
            esm2.make_segmented_apply_fn(config), params, token_list,
            row_len=64, chunk=2, super_chunks=2, window=32,
        )
        for a, (b_tab, s_tab) in enumerate(zip(base, seg)):
            np.testing.assert_allclose(
                s_tab, b_tab, atol=2e-3, err_msg=f"assay {a}"
            )

    def test_plan_rows_packs_tightly(self):
        from proteingym_tpu.models.packed_scoring import _plan_rows

        rows = _plan_rows({252: 8, 139: 3}, 1024, 28)
        assert sum(len(r) for r in rows) == 11
        assert all(sum(r) <= 1024 for r in rows)
        # FFD: four 252s fill the first row
        assert rows[0] == [252, 252, 252, 252]

    def test_scores_match_unpacked_cli_contract(self):
        from proteingym_tpu.models import packed_scoring as ps
        from proteingym_tpu.models.esm_scoring import (
            masked_marginal_table, score_mutants_from_table,
        )

        rs = np.random.RandomState(5)
        config = TINY
        params = esm2.init_params(jax.random.PRNGKey(2), config)
        seqs = _seqs(rs, [14, 26])
        assays = []
        for seq in seqs:
            muts = [
                f"{seq[p]}{p+1}{a}"
                for p in range(len(seq))
                for a in AA[:3]
                if a != seq[p]
            ][:12]
            assays.append((seq, muts))
        packed = ps.score_assays_packed(
            esm2.make_apply_fn(config), params, assays,
            seg_apply_fn=esm2.make_segmented_apply_fn(config),
            row_len=64, seg_chunk=2, super_chunks=2,
        )
        for (seq, muts), got in zip(assays, packed):
            table = masked_marginal_table(
                esm2.make_apply_fn(config), ALPHABET.tokenize(seq),
                chunk=8, params=params,
            )
            want = np.asarray(
                score_mutants_from_table(jnp.asarray(table), muts, seq)
            )
            np.testing.assert_allclose(got, want, atol=2e-3)
