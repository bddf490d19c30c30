"""Cross-assay packed masked-marginal scoring == per-assay harness."""

import numpy as np
import jax
import pytest

from proteingym_tpu.models.esm2 import (
    ALPHABET, EsmConfig, init_params, make_apply_fn,
)
from proteingym_tpu.models.esm_scoring import (
    masked_marginal_table, score_assay,
)
from proteingym_tpu.models.packed_scoring import (
    packed_masked_marginal_tables, score_assays_packed,
)

AA = "ACDEFGHIKLMNPQRSTVWY"


def _mk_model():
    cfg = EsmConfig(name="esm2_tiny", num_layers=2, embed_dim=64,
                    num_heads=4, dtype=np.float32, max_positions=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, make_apply_fn(cfg)


def _synth(seq_len, seed, n_mut=25):
    rs = np.random.RandomState(seed)
    seq = "".join(AA[i] for i in rs.randint(0, 20, seq_len))
    mutants = []
    for _ in range(n_mut):
        p = rs.randint(0, seq_len)
        m = AA[rs.randint(0, 20)]
        if m != seq[p]:
            mutants.append(f"{seq[p]}{p + 1}{m}")
    return seq, mutants


def test_packed_tables_match_per_assay_short():
    cfg, params, apply_fn = _mk_model()
    seqs = [_synth(n, s)[0] for n, s in [(11, 0), (19, 1), (13, 2), (30, 3)]]
    toks = [ALPHABET.tokenize(s) for s in seqs]
    packed = packed_masked_marginal_tables(
        apply_fn, params, toks, chunk=4, super_chunks=2,
        pad_to_multiple=8, window=40,
    )
    for t, tab in zip(toks, packed):
        ref = np.asarray(masked_marginal_table(
            apply_fn, t, chunk=4, params=params, pad_to_multiple=8,
            window=40,
        ))
        np.testing.assert_allclose(tab, ref, atol=1e-5)


def test_packed_tables_match_per_assay_long_window():
    cfg, params, apply_fn = _mk_model()
    # window=24 forces the optimal-window path for the L=40 sequence while
    # the short ones pack into their own buckets
    seqs = [_synth(40, 4)[0], _synth(12, 5)[0], _synth(38, 6)[0]]
    toks = [ALPHABET.tokenize(s) for s in seqs]
    packed = packed_masked_marginal_tables(
        apply_fn, params, toks, chunk=4, super_chunks=2,
        pad_to_multiple=8, window=24,
    )
    for t, tab in zip(toks, packed):
        ref = np.asarray(masked_marginal_table(
            apply_fn, t, chunk=4, params=params, pad_to_multiple=8,
            window=24,
        ))
        np.testing.assert_allclose(tab, ref, atol=1e-5)


def test_score_assays_packed_matches_score_assay():
    cfg, params, apply_fn = _mk_model()
    assays = [_synth(n, s) for n, s in [(14, 7), (22, 8), (14, 9)]]
    packed_scores = score_assays_packed(
        apply_fn, params, assays, chunk=4, super_chunks=2,
        pad_to_multiple=8, window=40,
    )
    for (seq, mutants), got in zip(assays, packed_scores):
        ref = score_assay(
            None, seq, mutants, strategy="masked-marginals", chunk=4,
            window=40, params=params, apply_fn=apply_fn, pad_to_multiple=8,
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_packed_single_assay_degenerate():
    cfg, params, apply_fn = _mk_model()
    seq, mutants = _synth(17, 10)
    got = score_assays_packed(
        apply_fn, params, [(seq, mutants)], chunk=4, super_chunks=2,
        pad_to_multiple=8, window=40,
    )[0]
    ref = score_assay(
        None, seq, mutants, strategy="masked-marginals", chunk=4,
        window=40, params=params, apply_fn=apply_fn, pad_to_multiple=8,
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cli_packed_scoring_matches_per_assay(tmp_path):
    """pgym score --packed == per-assay scoring, through the real CLI."""
    import pandas as pd

    from proteingym_tpu.pipeline.cli import main

    rs = np.random.RandomState(11)
    world = tmp_path / "world"
    (world / "dms").mkdir(parents=True)
    rows = []
    for i, L in enumerate((12, 19, 12)):
        seq = "".join(AA[j] for j in rs.randint(0, 20, L))
        muts = [f"{seq[p]}{p + 1}{'A' if seq[p] != 'A' else 'C'}"
                for p in range(L)]
        pd.DataFrame({"mutant": muts}).to_csv(
            world / "dms" / f"P{i}.csv", index=False)
        rows.append({"DMS_id": f"P{i}", "DMS_filename": f"P{i}.csv",
                     "UniProt_ID": f"UP{i}", "target_seq": seq,
                     "seq_len": L})
    pd.DataFrame(rows).to_csv(world / "ref.csv", index=False)

    common = ["--model", "esm", "--dms-reference", str(world / "ref.csv"),
              "--dms-dir", str(world / "dms"),
              "--checkpoint", "esm2_tiny", "--batch-size", "4", "--quiet"]
    rc = main(["score", *common, "--output-dir", str(world / "per_assay")])
    assert rc == 0
    rc = main(["score", *common, "--packed",
               "--output-dir", str(world / "packed")])
    assert rc == 0
    for i in range(3):
        a = pd.read_csv(world / "per_assay" / f"P{i}.csv")
        b = pd.read_csv(world / "packed" / f"P{i}.csv")
        col = [c for c in a.columns if c.endswith("_score")][0]
        np.testing.assert_allclose(b[col].to_numpy(), a[col].to_numpy(),
                                   atol=1e-4)


def test_packed_scoring_under_tp_mesh():
    """Packed cross-assay scoring composes with tensor-parallel sharded
    params (the big-model production combination): equality with the
    unsharded packed run on an 8-device CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    from proteingym_tpu.parallel.mesh import (
        esm_param_sharding, make_mesh, shard_params,
    )

    cfg, params, apply_fn = _mk_model()
    assays = [_synth(n, s) for n, s in [(13, 20), (21, 21)]]
    expected = score_assays_packed(
        apply_fn, params, assays, chunk=4, super_chunks=2,
        pad_to_multiple=8, window=40,
    )
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, esm_param_sharding(params, mesh))
    with mesh:
        got = score_assays_packed(
            apply_fn, sharded, assays, chunk=4, super_chunks=2,
            pad_to_multiple=8, window=40,
        )
    for e, g in zip(expected, got):
        np.testing.assert_allclose(g, e, atol=1e-4)


def test_packed_super_chunk_collapse_boundaries():
    """Tail collapse (pad n_chunks up to a super-chunk multiple when the
    waste is <= 1/8) must not change results on either side of the
    trigger: one bucket where the collapse fires (n_chunks % K == K-1 on
    a large bucket) and one where the waste is too big (small bucket
    keeps the K in {...,1} tail decomposition)."""
    cfg, params, apply_fn = _mk_model()
    # L=21 -> 23 tokens -> bucket 24 at pad 8; one masked row per position
    # => 23 rows/assay, chunk=4.
    # big: 10 assays x 23 = 230 rows -> 58 chunks; full = 60, waste 2 <=
    # 58//8 = 7 -> COLLAPSE fires (one K=4 program, no tail).
    # small: 23 rows -> 6 chunks; full = 8, waste 2 > 6//8 = 0 -> keeps
    # the K in {4,2} tail decomposition.
    seqs_big = [_synth(21, 100 + i)[0] for i in range(10)]   # 230 rows
    seqs_small = [_synth(21, 200)[0]]                        # 23 rows
    for seqs in (seqs_big, seqs_small):
        toks = [ALPHABET.tokenize(s) for s in seqs]
        packed = packed_masked_marginal_tables(
            apply_fn, params, toks, chunk=4, super_chunks=4,
            pad_to_multiple=8, window=40,
        )
        for t, tab in zip(toks, packed):
            ref = np.asarray(masked_marginal_table(
                apply_fn, t, chunk=4, params=params, pad_to_multiple=8,
                window=40,
            ))
            np.testing.assert_allclose(tab, ref, atol=1e-5)


def test_packed_collapse_always_policy(monkeypatch):
    """PGYM_PACKED_COLLAPSE=always (the accelerator default: every bucket
    rounds up to a full K=super_chunks grid, no tail programs) must
    produce identical tables to the CPU-auto policy, including on a small
    bucket where the relative rule would NOT collapse (6 chunks -> 8)."""
    cfg, params, apply_fn = _mk_model()
    toks = [ALPHABET.tokenize(_synth(21, 200)[0])]  # 23 rows -> 6 chunks
    base = packed_masked_marginal_tables(
        apply_fn, params, toks, chunk=4, super_chunks=4,
        pad_to_multiple=8, window=40,
    )
    monkeypatch.setenv("PGYM_PACKED_COLLAPSE", "always")
    collapsed = packed_masked_marginal_tables(
        apply_fn, params, toks, chunk=4, super_chunks=4,
        pad_to_multiple=8, window=40,
    )
    for b, c in zip(base, collapsed):
        np.testing.assert_allclose(c, b, atol=1e-6)


class TestKColumns:
    """Opt-in cols_per_forward=k: k max-stride columns masked per forward,
    each masked position's own logits read. k=1 is the reference-exact
    protocol (ref esm/compute_fitness.py:489-504); k>1 is the same table
    approximation as msa_transformer.masked_marginal_table_msa."""

    def test_k_equals_one_matches_default(self):
        cfg, params, apply_fn = _mk_model()
        toks = [ALPHABET.tokenize(_synth(n, s)[0])
                for n, s in [(11, 40), (19, 41)]]
        base = packed_masked_marginal_tables(
            apply_fn, params, toks, chunk=4, super_chunks=2,
            pad_to_multiple=8, window=40,
        )
        k1 = packed_masked_marginal_tables(
            apply_fn, params, toks, chunk=4, super_chunks=2,
            pad_to_multiple=8, window=40, cols_per_forward=1,
        )
        for b, t in zip(base, k1):
            np.testing.assert_allclose(t, b, atol=0)

    @staticmethod
    def _manual_parts(total, window, k):
        """The documented k>1 work grouping: positions grouped by their
        quantized optimal-window start, max-stride assigned to rows of
        k columns. Yields (qstart, cols) per work row."""
        from collections import defaultdict

        from proteingym_tpu.data.windows import get_optimal_window
        from proteingym_tpu.models.packed_scoring import _KCOL_START_QUANT

        q = max(1, min(_KCOL_START_QUANT, window // 2))
        parts = defaultdict(list)
        for i in range(total):
            start, _ = get_optimal_window(i, total, window)
            if total > window:
                snapped = start - start % q
                if i - snapped < window:
                    start = snapped
            else:
                start = 0
            parts[start].append(i)
        for qstart, pos in sorted(parts.items()):
            n_p = len(pos)
            n_rows = -(-n_p // k)
            idx = np.concatenate(
                [np.arange(n_p), np.zeros(n_rows * k - n_p, int)]
            ).reshape(k, n_rows).T
            valid = np.concatenate(
                [np.ones(n_p, bool), np.zeros(n_rows * k - n_p, bool)]
            ).reshape(k, n_rows).T
            for r in range(n_rows):
                yield qstart, np.asarray(pos)[idx[r][valid[r]]]

    def _check_vs_manual(self, seq_len, window, k):
        import jax.numpy as jnp

        cfg, params, apply_fn = _mk_model()
        toks = ALPHABET.tokenize(_synth(seq_len, 50)[0])
        total = toks.shape[0]
        (table,) = packed_masked_marginal_tables(
            apply_fn, params, [toks], chunk=2, super_chunks=2,
            pad_to_multiple=8, window=window, cols_per_forward=k,
        )
        # packed rows live in the bucket shape: round_up(total, pad) for
        # short assays, exactly `window` for long ones
        row_len = (window if total > window
                   else min(((total + 7) // 8) * 8, window))
        covered = set()
        for qstart, cols in self._manual_parts(total, window, k):
            row = np.array(toks[qstart:qstart + row_len])
            if row.shape[0] < row_len:
                row = np.pad(row, (0, row_len - row.shape[0]),
                             constant_values=ALPHABET.padding_idx)
            row[cols - qstart] = ALPHABET.mask_idx
            logps = np.asarray(jax.nn.log_softmax(
                apply_fn(params, jnp.asarray(row[None])).astype(
                    jnp.float32), -1))[0]
            for c in cols:
                np.testing.assert_allclose(
                    table[c], logps[c - qstart], atol=1e-4,
                    err_msg=f"start {qstart} col {c}")
                covered.add(int(c))
        assert covered == set(range(total))

    def test_bookkeeping_vs_manual_short(self):
        # total <= window: one part per assay, start 0, pure max-stride
        self._check_vs_manual(seq_len=21, window=40, k=4)

    def test_bookkeeping_vs_manual_long_window(self):
        # total > window: sliding optimal windows snap to the start
        # quantum (window//2 = 20 here) so rows can share k columns
        self._check_vs_manual(seq_len=56, window=40, k=4)

    def test_k_scores_agree_with_reference_protocol(self):
        from scipy.stats import spearmanr

        cfg, params, apply_fn = _mk_model()
        seq, _ = _synth(30, 60)
        muts = [f"{seq[p]}{p + 1}{a}" for p in range(len(seq))
                for a in AA[:5] if a != seq[p]]
        s1 = score_assays_packed(
            apply_fn, params, [(seq, muts)], chunk=4, super_chunks=2,
            pad_to_multiple=8, window=40,
        )[0]
        sk = score_assays_packed(
            apply_fn, params, [(seq, muts)], chunk=4, super_chunks=2,
            pad_to_multiple=8, window=40, cols_per_forward=4,
        )[0]
        rho = spearmanr(s1, sk).statistic
        # RANDOM-weights tiny ESM is the worst case for k>1: untrained
        # attention is diffuse, so co-masked columns ~8 apart interact
        # far more than in a trained LM (whose predictions are dominated
        # by local context — the MSA-T k=4 check on its tiny model holds
        # rho > 0.99). This bound catches bookkeeping-level breakage
        # (wrong rows scatter => rho collapses toward 0); per-model
        # fidelity at k>1 should be validated on real weights before
        # production use, as documented in packed_masked_marginal_tables.
        assert rho > 0.8, rho
        assert np.isfinite(sk).all()

    def test_k_rejects_segment_packing(self):
        cfg, params, apply_fn = _mk_model()
        with pytest.raises(ValueError, match="segment"):
            score_assays_packed(
                apply_fn, params, [("ACDEF", ["A1C"])],
                seg_apply_fn=lambda *a: None, cols_per_forward=2,
            )

    def test_k_scores_track_on_locally_trained_model(self):
        """The k>1 fidelity claim, demonstrated rather than assumed:
        after brief MLM training on first-order-Markov sequences (strong
        LOCAL structure, the regime trained protein LMs live in), the
        tiny model's masked predictions become context-local and the
        k=4 scores track the reference-exact k=1 protocol tightly
        (rho ~0.99 measured) — unlike the random-weights case above,
        where diffuse attention overstates co-masked column
        interaction. Slow tier (trains ~400 steps on CPU)."""
        import jax.numpy as jnp
        import optax
        from scipy.stats import spearmanr

        rs = np.random.RandomState(0)
        trans = np.full((20, 20), 1e-3)
        for i in range(20):
            nxt = rs.choice(20, 3, replace=False)
            trans[i, nxt] = [0.6, 0.3, 0.1]
        trans /= trans.sum(1, keepdims=True)

        def markov_seq(L, r):
            s = [r.randint(20)]
            for _ in range(L - 1):
                s.append(r.choice(20, p=trans[s[-1]]))
            return "".join(AA[i] for i in s)

        L = 30
        cfg, params, apply_fn = _mk_model()
        toks = np.stack(
            [ALPHABET.tokenize(markov_seq(L, rs)) for _ in range(256)])
        opt = optax.adam(1e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state, key, batch):
            def loss_fn(p):
                mask = jax.random.uniform(key, batch.shape) < 0.2
                mask = mask & (batch != ALPHABET.padding_idx)
                x = jnp.where(mask, ALPHABET.mask_idx, batch)
                lp = jax.nn.log_softmax(
                    apply_fn(p, x).astype(jnp.float32), -1)
                ll = jnp.take_along_axis(lp, batch[..., None], -1)[..., 0]
                return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, state = opt.update(g, state)
            return optax.apply_updates(params, up), state, loss

        key = jax.random.PRNGKey(1)
        batch_j = jnp.asarray(toks)
        first = last = None
        for i in range(400):
            key, k2 = jax.random.split(key)
            idx = rs.choice(256, 32, replace=False)
            params, state, loss = step(params, state, k2, batch_j[idx])
            first = float(loss) if first is None else first
            last = float(loss)
        assert last < 0.6 * first, (first, last)  # it actually learned

        seq = markov_seq(L, np.random.RandomState(99))
        muts = [f"{seq[p]}{p + 1}{a}" for p in range(L)
                for a in AA[:6] if a != seq[p]]
        common = dict(chunk=4, super_chunks=2, pad_to_multiple=8,
                      window=40)
        s1 = score_assays_packed(
            apply_fn, params, [(seq, muts)], **common)[0]
        sk = score_assays_packed(
            apply_fn, params, [(seq, muts)], cols_per_forward=4,
            **common)[0]
        rho = spearmanr(s1, sk).statistic
        assert rho > 0.98, rho
        assert np.max(np.abs(s1 - sk)) < 0.2 * (s1.max() - s1.min())
