"""Cross-assay packed masked-marginal scoring.

The reference scores one assay per process (SLURM array over --DMS_index,
ref proteingym/baselines/esm/compute_fitness.py:128-131) and its
masked-marginal hot loop runs L forwards per assay (:489-504). Our
per-assay harness (models/esm_scoring.py) already batches those forwards,
but it still dispatches each assay's table separately: partial chunks and
per-assay row padding are wasted compute, and each (length-bucket, assay)
pair pays its own dispatch tail.

Masked-marginal rows are INDEPENDENT across assays — a row is fully
described by (source tokens, masked offset). This module flattens the rows
of many assays into one work queue, groups them by row length (the only
shape that matters to the compiled program), and streams fixed-shape
super-chunks through one jitted kernel per row-length bucket:

  - short sequences (T <= window): the row is the assay's padded token
    vector with one position masked; rows from every assay in the same
    length bucket share forward batches, so the only padded-row waste is
    the final partial super-chunk of the whole GROUP, not of each assay.
  - long sequences (T > window): each masked position is scored inside its
    optimal ``window``-token slice (same math as ref :492-495); all long
    assays share the window-length bucket the same way.

Kernel shape: rows are built ON DEVICE from a stacked (S, T_bucket) token
matrix — each work item is (seq_id, start, offset) — so a dispatch ships
three small int vectors, not (rows, T) token tensors. ``lax.map`` over a
fixed (K, chunk) grid keeps one device program per super-chunk with zero
host round-trips in between; compile keys are (T_bucket, S_pad, K, chunk),
all bucketed, so a 217-assay production sweep compiles a handful of
programs total.
"""

from __future__ import annotations

import os
from collections import OrderedDict, defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.data.windows import get_optimal_window
from proteingym_tpu.models.esm2 import ALPHABET, EsmAlphabet
from proteingym_tpu.models.esm_scoring import score_mutants_from_table

# bounded cache of jitted packed kernels, keyed on (apply_fn, row_len)
_KERNEL_CACHE_MAX = 32
_KERNEL_CACHE: "OrderedDict" = OrderedDict()


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _collapse_to_full_grid(n_chunks: int, super_chunks: int) -> bool:
    """Should a bucket's chunk count be rounded up to a full
    ``super_chunks`` multiple so the whole bucket runs as ONE program
    shape (K = super_chunks) instead of a {K, K/2, ..., 1} tail cascade?

    On accelerators: always. Each distinct (T_bucket, K) pair is its own
    compiled executable, and on the tunneled TPU backend even a
    persistent-cache HIT costs 20-90 s to deserialize/upload for the
    650M trunk — while the padded-row compute the collapse trades away
    is bounded by (super_chunks - 1) * chunk rows, ~0.2 s of device time
    at T=128. The r4 slow-tunnel bench run timed out INSIDE the
    production-mix warmup with the old relative rule (a 2-assay T=128
    bucket cascaded into 3 extra program loads).

    On CPU (tests, smoke runs): padded chunks cost real seconds and
    compiles cost almost nothing, so collapse only when the waste is
    <= 1/8 of the bucket (the original rule).

    PGYM_PACKED_COLLAPSE={always,never,auto} overrides (contract tests
    force both branches off-TPU).
    """
    full = _round_up(n_chunks, super_chunks)
    if full == n_chunks:
        return False
    mode = os.environ.get("PGYM_PACKED_COLLAPSE", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    if jax.default_backend() != "cpu":
        return True
    return (full - n_chunks) <= n_chunks // 8


def _packed_kernel(apply_fn: Callable, row_len: int):
    """Jitted (params, stacked, sids, starts, offs, mask_val) -> (K*chunk, V).

    stacked: (S, T_b) int tokens; sids/starts/offs: (K, chunk) int32.
    Each work item's row is stacked[sid][start : start + row_len] with
    position ``off`` replaced by the mask token; the output row is the
    f32 log-softmax of the model's logits at that masked offset.
    """
    key = (apply_fn, row_len)
    if key in _KERNEL_CACHE:
        _KERNEL_CACHE.move_to_end(key)
        return _KERNEL_CACHE[key]

    from proteingym_tpu.ops.gather_logprobs import row_log_softmax_gather

    @jax.jit
    def wrapped(params, stacked, sids, starts, offs, mask_val):
        def body(args):
            sid, st, off = args

            def cut(s_, t_, o_):
                row = jax.lax.dynamic_slice(stacked[s_], (t_,), (row_len,))
                return row.at[o_].set(mask_val)

            rows = jax.vmap(cut)(sid, st, off)
            return row_log_softmax_gather(apply_fn(params, rows), off)

        out = jax.lax.map(body, (sids, starts, offs))  # (K, chunk, V)
        return out.reshape(-1, out.shape[-1])

    _KERNEL_CACHE[key] = wrapped
    while len(_KERNEL_CACHE) > _KERNEL_CACHE_MAX:
        _KERNEL_CACHE.popitem(last=False)
    return wrapped


# k>1 multi-column mode: window starts snap DOWN to this quantum so long
# assays' sliding windows coincide and k positions can share one forward
# row. Capped at window//2 so every position still fits its snapped
# window (off = i - start < window//2 + quantum <= window).
_KCOL_START_QUANT = 128


def _pack_k_columns(items: np.ndarray, k: int):
    """Group per-position work items (assay, sid, start, off) that share a
    source row (identical assay/sid/start) into work rows of k offsets
    with MAXIMUM STRIDE — row r of an n_rows-row part masks offsets
    {r, r + n_rows, r + 2*n_rows, ...}, so co-masked columns sit
    ~len(part)/k positions apart (the same assignment as
    msa_transformer.masked_marginal_table_msa). Returns
    (sids, starts, offs, scat_assay, scat_tpos, scat_valid); offs and the
    scat_* arrays are (n_rows_total, k). Padding slots repeat the part's
    first offset (masking a position twice is a no-op) with
    scat_valid False so they never scatter."""
    uniq, inv = np.unique(items[:, :3], axis=0, return_inverse=True)
    sids, starts = [], []
    offs, s_a, s_t, s_v = [], [], [], []
    for u in range(uniq.shape[0]):
        part = items[inv == u]
        n_p = part.shape[0]
        n_rows = -(-n_p // k)
        idx = np.concatenate(
            [np.arange(n_p), np.zeros(n_rows * k - n_p, np.int64)]
        ).reshape(k, n_rows).T  # (n_rows, k) max-stride
        valid = np.concatenate(
            [np.ones(n_p, bool), np.zeros(n_rows * k - n_p, bool)]
        ).reshape(k, n_rows).T
        # pad slots duplicate the ROW'S OWN first offset (slot 0 is
        # always valid): re-masking an already-masked position is a true
        # no-op, so tail rows never mask an extra unrelated column
        idx = np.where(valid, idx, idx[:, :1])
        sids.append(np.full(n_rows, part[0, 1], np.int32))
        starts.append(np.full(n_rows, part[0, 2], np.int32))
        offs.append(part[idx, 3].astype(np.int32))
        s_a.append(part[idx, 0].astype(np.int32))
        s_t.append((part[idx, 2] + part[idx, 3]).astype(np.int32))
        s_v.append(valid)
    return (np.concatenate(sids), np.concatenate(starts),
            np.concatenate(offs), np.concatenate(s_a),
            np.concatenate(s_t), np.concatenate(s_v))


def _packed_kernel_multi(apply_fn: Callable, row_len: int, k_cols: int):
    """Multi-column variant of _packed_kernel: offs is (K, chunk, k) and
    each work row masks all k of its offsets in ONE forward, reading each
    masked offset's own log-softmax row -> (K*chunk*k, V) in slot-major
    order. Same opt-in table approximation as
    msa_transformer.masked_marginal_table_msa(cols_per_forward=k)."""
    key = (apply_fn, row_len, k_cols, "kcol")
    if key in _KERNEL_CACHE:
        _KERNEL_CACHE.move_to_end(key)
        return _KERNEL_CACHE[key]

    from proteingym_tpu.ops.gather_logprobs import multi_log_softmax_gather

    @jax.jit
    def wrapped(params, stacked, sids, starts, offs, mask_val):
        def body(args):
            sid, st, off = args  # (chunk,), (chunk,), (chunk, k)

            def cut(s_, t_, o_):
                row = jax.lax.dynamic_slice(stacked[s_], (t_,), (row_len,))
                return row.at[o_].set(mask_val)

            rows = jax.vmap(cut)(sid, st, off)
            return multi_log_softmax_gather(apply_fn(params, rows), off)

        out = jax.lax.map(body, (sids, starts, offs))  # (K, chunk, k, V)
        return out.reshape(-1, out.shape[-1])

    _KERNEL_CACHE[key] = wrapped
    while len(_KERNEL_CACHE) > _KERNEL_CACHE_MAX:
        _KERNEL_CACHE.popitem(last=False)
    return wrapped


def packed_masked_marginal_tables(
    apply_fn: Callable,
    params,
    token_list: Sequence[np.ndarray],
    mask_idx: Optional[int] = None,
    pad_idx: Optional[int] = None,
    chunk: int = 32,
    super_chunks: int = 8,
    window: int = 1024,
    pad_to_multiple: int = 32,
    seqs_pad: int = 8,
    buckets: Optional[Sequence[int]] = None,
    cols_per_forward: int = 1,
) -> List[np.ndarray]:
    """Build every assay's (T_i, V) masked-marginal log-prob table in
    shared cross-assay forward batches.

    token_list: per-assay token vectors (cls + seq + eos, unpadded).
    Returns one (T_i, V) float32 table per input, bit-identical (up to
    attention-mask float noise) to models/esm_scoring.masked_marginal_table
    run per assay.

    ``buckets``: optional explicit row-length ladder (e.g. (160, 256, 512,
    1024)) — MXU/attention efficiency on TPU is strongly shape-dependent
    (measured on v5e: a T=448 forward runs at ~0.33 MFU vs ~0.50 at
    T=256), so snapping to a few known-good lengths can beat minimal
    padding. Falls back to round_up(pad_to_multiple) above the ladder.

    ``cols_per_forward`` (k): OPT-IN k-column masking — each forward
    masks k positions of one source row (max-stride assignment, so
    co-masked columns sit ~T/k apart) and reads each masked position's
    own logits, cutting the sweep to ~1/k of the forwards. k=1 (the
    default) is the reference's exact one-column-per-forward protocol
    (ref esm/compute_fitness.py:489-504) and leaves this function's
    behavior bit-identical to previous releases. k>1 additionally snaps
    long assays' optimal-window starts DOWN to _KCOL_START_QUANT so
    sliding windows coincide (each position's context shifts by
    < min(128, window//2) tokens from its optimal window). Agreement
    with k=1 is asserted in tests/test_packed_scoring.py.
    """
    mask_idx = ALPHABET.mask_idx if mask_idx is None else mask_idx
    pad_idx = ALPHABET.padding_idx if pad_idx is None else pad_idx
    k_cols = max(1, int(cols_per_forward))
    start_quant = max(1, min(_KCOL_START_QUANT, window // 2))
    n_assays = len(token_list)
    lengths = [int(np.asarray(t).shape[0]) for t in token_list]

    # --- group work by row-length bucket ---------------------------------
    # short seqs: bucket = round_up(T, pad_to_multiple); long seqs: window
    groups: Dict[int, dict] = defaultdict(
        lambda: {"seqs": [], "items": []}  # items: (assay, sid, start, off)
    )
    def bucket_of(total: int) -> int:
        if buckets:
            for b in sorted(buckets):
                if b >= total:
                    return min(b, window)
        return min(_round_up(total, pad_to_multiple), window)

    for a, toks in enumerate(token_list):
        toks = np.asarray(toks)
        total = lengths[a]
        if total <= window:
            row_len = bucket_of(total)
            g = groups[row_len]
            sid = len(g["seqs"])
            padded = np.concatenate(
                [toks, np.full(row_len - total, pad_idx, toks.dtype)]
            )
            g["seqs"].append(padded)
            for off in range(total):
                g["items"].append((a, sid, 0, off))
        else:
            g = groups[window]
            sid = len(g["seqs"])
            t_pad = _round_up(total, pad_to_multiple)
            padded = np.concatenate(
                [toks, np.full(t_pad - total, pad_idx, toks.dtype)]
            )
            g["seqs"].append(padded)
            for i in range(total):
                start, _end = get_optimal_window(i, total, window)
                if k_cols > 1:
                    # snap the window start down to the quantum so rows
                    # coincide — but never past the point where the
                    # position falls out of the window (end-clamped
                    # starts can sit just under a quantum boundary)
                    snapped = start - start % start_quant
                    if i - snapped < window:
                        start = snapped
                g["items"].append((a, sid, start, i - start))

    tables = [None] * n_assays
    vocab = None
    for row_len, g in sorted(groups.items()):
        # stack sources, padding the per-seq length to the group max and
        # the seq COUNT to a bucket so compile keys stay bounded
        t_max = max(s.shape[0] for s in g["seqs"])
        t_max = max(t_max, row_len)
        s_pad = _round_up(len(g["seqs"]), seqs_pad)
        stacked = np.full((s_pad, t_max), pad_idx, g["seqs"][0].dtype)
        for i, s in enumerate(g["seqs"]):
            stacked[i, : s.shape[0]] = s

        items = np.asarray(g["items"], dtype=np.int32)  # (N, 4)
        if k_cols > 1:
            (w_sids, w_starts, w_offs,
             sc_a, sc_t, sc_v) = _pack_k_columns(items, k_cols)
            n = w_sids.shape[0]
        else:
            w_sids, w_starts = items[:, 1], items[:, 2]
            w_offs = items[:, 3]
            n = items.shape[0]
        # pad the work queue only to a CHUNK multiple; full K-chunk
        # super-dispatches amortize dispatch overhead, and the tail runs
        # as single-chunk dispatches (K=1 grid) so a group never pays for
        # more than chunk-1 padded rows — padding to K*chunk cost 27%
        # wasted compute on single-assay buckets
        n_pad = _round_up(n, chunk)
        n_chunks = n_pad // chunk
        # ...EXCEPT when one program shape (K = super_chunks) should
        # cover the whole bucket so the tail programs (K in {4, 2, 1})
        # never exist — see _collapse_to_full_grid for the
        # backend-dependent policy (program count dominates on
        # accelerators, padded compute dominates on CPU).
        if _collapse_to_full_grid(n_chunks, super_chunks):
            n_chunks = _round_up(n_chunks, super_chunks)
            n_pad = n_chunks * chunk
        if n_pad != n:
            pad = n_pad - n
            w_sids = np.concatenate([w_sids, np.zeros(pad, np.int32)])
            w_starts = np.concatenate([w_starts, np.zeros(pad, np.int32)])
            w_offs = np.concatenate(
                [w_offs, np.zeros((pad,) + w_offs.shape[1:], np.int32)]
            )
            if k_cols > 1:
                sc_a = np.concatenate([sc_a, np.zeros((pad, k_cols),
                                                      np.int32)])
                sc_t = np.concatenate([sc_t, np.zeros((pad, k_cols),
                                                      np.int32)])
                sc_v = np.concatenate([sc_v, np.zeros((pad, k_cols), bool)])
        sids = w_sids.reshape(n_chunks, chunk)
        starts = w_starts.reshape(n_chunks, chunk)
        offs = w_offs.reshape((n_chunks, chunk) + w_offs.shape[1:])

        if k_cols > 1:
            kernel = _packed_kernel_multi(apply_fn, row_len, k_cols)
        else:
            kernel = _packed_kernel(apply_fn, row_len)
        stacked_j = jnp.asarray(stacked)
        mask_j = jnp.asarray(mask_idx, stacked.dtype)
        outs = []
        c = 0
        while c < n_chunks:
            # full K-grid super-dispatches, then the tail decomposed into
            # descending powers of two (K in {8, 4, 2, 1}): K=1 singles
            # each pay a full tunnel round trip, while arbitrary exact-K
            # grids would compile one program per tail size (and exotic
            # map lengths have shown pathological compile times)
            k = super_chunks
            while k > n_chunks - c:
                k //= 2
            outs.append(kernel(
                params, stacked_j, jnp.asarray(sids[c:c + k]),
                jnp.asarray(starts[c:c + k]), jnp.asarray(offs[c:c + k]),
                mask_j,
            ))
            c += k
        if k_cols > 1:
            # multi-column output is (n_pad * k, V) slot-major; the
            # scat_* arrays carry each slot's target (padding slots have
            # scat_valid False and never land)
            out = np.asarray(jnp.concatenate(outs, axis=0))
            vocab = out.shape[-1]
            flat_a = sc_a.reshape(-1)
            flat_t = sc_t.reshape(-1)
            flat_v = sc_v.reshape(-1)
            for a in np.unique(flat_a[flat_v]):
                sel = flat_v & (flat_a == a)
                tab = np.zeros((lengths[a], vocab), np.float32)
                tab[flat_t[sel]] = out[sel]
                tables[a] = tab
            continue
        out = np.asarray(jnp.concatenate(outs, axis=0)[:n])
        vocab = out.shape[-1]

        # scatter back into per-assay tables
        assay_ids = np.asarray([it[0] for it in g["items"]], np.int32)
        table_pos = np.asarray(
            [it[2] + it[3] for it in g["items"]], np.int32
        )
        for a in np.unique(assay_ids):
            sel = assay_ids == a
            tab = np.zeros((lengths[a], vocab), np.float32)
            tab[table_pos[sel]] = out[sel]
            tables[a] = tab
    return tables


def _segment_kernel(apply_fn: Callable, row_len: int, slots: int):
    """Jitted segment-packed table kernel.

    (params, stacked, sids, starts, begins, lens, offs, mask_val, pad_val)
    -> (K*chunk*slots, V). sids/starts/begins/lens/offs: (K, chunk, slots)
    int32 — slot s of a row holds stacked[sid][start : start + len] placed
    at row position ``begin``, with segment-relative position ``off``
    masked; len == 0 marks an empty slot. Rows and segment-id maps are
    built ON DEVICE from those scalars (a dispatch ships five small int
    tensors, never (rows, T) tokens), and each row's forward runs with
    block-diagonal segment attention so every packed segment scores
    exactly as if it were alone (ref esm/compute_fitness.py:489-504
    semantics per segment).
    """
    key = (apply_fn, row_len, slots, "seg")
    if key in _KERNEL_CACHE:
        _KERNEL_CACHE.move_to_end(key)
        return _KERNEL_CACHE[key]

    from proteingym_tpu.ops.gather_logprobs import multi_log_softmax_gather

    @jax.jit
    def wrapped(params, stacked, sids, starts, begins, lens, offs,
                mask_val, pad_val):
        t_src = stacked.shape[1]
        t = jnp.arange(row_len, dtype=jnp.int32)

        def build(sid_r, st_r, bg_r, ln_r, off_r):  # each (slots,)
            in_slot = (t[None, :] >= bg_r[:, None]) & (
                t[None, :] < (bg_r + ln_r)[:, None]
            )  # (slots, T)
            slot = jnp.argmax(in_slot, axis=0)
            valid = jnp.any(in_slot, axis=0)
            src_pos = jnp.clip(t - bg_r[slot] + st_r[slot], 0, t_src - 1)
            row = stacked[sid_r[slot], src_pos]
            row = jnp.where(valid, row, pad_val)
            gm = jnp.where(ln_r > 0, bg_r + off_r, row_len)  # (slots,)
            row = row.at[gm].set(mask_val, mode="drop")
            seg = jnp.where(valid, slot + 1, 0).astype(jnp.int32)
            return row, seg, gm

        def body(args):
            rows, segs, gms = jax.vmap(build)(*args)
            logits = apply_fn(params, rows, segs)
            return multi_log_softmax_gather(logits, gms)  # (chunk, S, V)

        out = jax.lax.map(body, (sids, starts, begins, lens, offs))
        return out.reshape(-1, out.shape[-1])

    _KERNEL_CACHE[key] = wrapped
    while len(_KERNEL_CACHE) > _KERNEL_CACHE_MAX:
        _KERNEL_CACHE.popitem(last=False)
    return wrapped


def _plan_rows(
    counts: Dict[int, int], row_len: int, max_slots: int
) -> List[List[int]]:
    """Greedy bin packing of segment lengths into rows.

    counts: {segment_length: how_many}. Returns one list of segment
    lengths per row. Repeatedly fills a row with the LARGEST remaining
    length that fits (first-fit-decreasing over a handful of distinct
    lengths — one per assay — so this is O(rows * lengths))."""
    remaining = dict(counts)
    rows: List[List[int]] = []
    lengths = sorted(remaining, reverse=True)
    if lengths and lengths[0] > row_len:
        # an unplaceable length would otherwise spin this loop forever
        raise ValueError(
            f"segment length {lengths[0]} exceeds row_len {row_len}"
        )
    while any(remaining.values()):
        free, used = row_len, []
        while len(used) < max_slots:
            pick = next(
                (L for L in lengths if remaining.get(L, 0) and L <= free),
                None,
            )
            if pick is None:
                break
            used.append(pick)
            remaining[pick] -= 1
            free -= pick
        rows.append(used)
    return rows


def packed_segment_tables(
    seg_apply_fn: Callable,
    params,
    token_list: Sequence[np.ndarray],
    mask_idx: Optional[int] = None,
    pad_idx: Optional[int] = None,
    row_len: int = 1024,
    chunk: int = 8,
    super_chunks: int = 8,
    window: int = 1024,
    max_slots: Optional[int] = None,
) -> List[np.ndarray]:
    """Segment-packed cross-assay masked-marginal tables.

    Packs masked rows from EVERY assay — any length mix — into fixed
    ``row_len`` rows with block-diagonal segment attention, so the whole
    scoring workload runs as one compiled program shape at the MXU
    sweet spot instead of one shape per length bucket, and short-assay
    rows stop paying bucket padding (a 139-token assay wastes ~45% of a
    160-bucket row; packed, seven of them share a 1024 row at ~95% fill).
    Semantically identical per assay to ``packed_masked_marginal_tables``
    (each segment scores as if alone; ref esm/compute_fitness.py:489-504).

    seg_apply_fn: STABLE (params, tokens, segment_ids) -> logits (e.g.
    esm2.make_segmented_apply_fn). Sequences longer than ``window`` score
    through optimal windows (ref :492-495) which pack like any other
    segment.
    """
    from proteingym_tpu.models.esm2 import MAX_ROW_SEGMENTS

    mask_idx = ALPHABET.mask_idx if mask_idx is None else mask_idx
    pad_idx = ALPHABET.padding_idx if pad_idx is None else pad_idx
    if max_slots is None:
        max_slots = MAX_ROW_SEGMENTS
    max_slots = min(max_slots, MAX_ROW_SEGMENTS)
    window = min(window, row_len)
    n_assays = len(token_list)
    lengths = [int(np.asarray(tk).shape[0]) for tk in token_list]

    # --- flatten every assay into (assay, sid, start, off, seg_len) ------
    seqs: List[np.ndarray] = []
    items: List[Tuple[int, int, int, int, int]] = []
    for a, toks in enumerate(token_list):
        toks = np.asarray(toks)
        total = lengths[a]
        sid = len(seqs)
        seqs.append(toks)
        if total <= window:
            for off in range(total):
                items.append((a, sid, 0, off, total))
        else:
            for i in range(total):
                start, _end = get_optimal_window(i, total, window)
                items.append((a, sid, start, i - start, window))

    # --- plan rows, assign items to slots --------------------------------
    counts: Dict[int, int] = defaultdict(int)
    for it in items:
        counts[it[4]] += 1
    plan = _plan_rows(counts, row_len, max_slots)
    slots = max((len(r) for r in plan), default=1)
    slots = min(_round_up(max(slots, 1), 4), max_slots)

    by_len: Dict[int, List[Tuple[int, int, int, int, int]]] = defaultdict(list)
    for it in items:
        by_len[it[4]].append(it)

    n_rows = len(plan)
    n_rows_pad = _round_up(n_rows, chunk)
    # collapse to one program shape (K = super_chunks) per the
    # backend-dependent policy (program count dominates cold /
    # tunneled-backend cost — see _collapse_to_full_grid)
    if _collapse_to_full_grid(n_rows_pad // chunk, super_chunks):
        n_rows_pad = _round_up(n_rows_pad // chunk, super_chunks) * chunk
    sids = np.zeros((n_rows_pad, slots), np.int32)
    starts = np.zeros((n_rows_pad, slots), np.int32)
    begins = np.zeros((n_rows_pad, slots), np.int32)
    lens = np.zeros((n_rows_pad, slots), np.int32)
    offs = np.zeros((n_rows_pad, slots), np.int32)
    # (assay, table_pos) per (row, slot); -1 = empty
    meta = np.full((n_rows_pad, slots, 2), -1, np.int64)
    for r, row_plan in enumerate(plan):
        begin = 0
        for s, seg_len in enumerate(row_plan):
            a, sid, start, off, _ = by_len[seg_len].pop()
            sids[r, s] = sid
            starts[r, s] = start
            begins[r, s] = begin
            lens[r, s] = seg_len
            offs[r, s] = off
            meta[r, s] = (a, start + off)
            begin += seg_len
    assert all(not v for v in by_len.values())

    # --- stack sources (seq count padded for bounded compile keys) -------
    t_max = _round_up(max(s.shape[0] for s in seqs), 32)
    s_pad = _round_up(len(seqs), 8)
    stacked = np.full((s_pad, t_max), pad_idx, seqs[0].dtype)
    for i, s in enumerate(seqs):
        stacked[i, : s.shape[0]] = s

    kernel = _segment_kernel(seg_apply_fn, row_len, slots)
    stacked_j = jnp.asarray(stacked)
    mask_j = jnp.asarray(mask_idx, stacked.dtype)
    pad_j = jnp.asarray(pad_idx, stacked.dtype)
    n_chunks = n_rows_pad // chunk

    def grid(arr):
        return arr.reshape(n_chunks, chunk, slots)

    g_sids, g_starts, g_begins = grid(sids), grid(starts), grid(begins)
    g_lens, g_offs = grid(lens), grid(offs)
    outs = []
    c = 0
    while c < n_chunks:
        k = super_chunks
        while k > n_chunks - c:
            k //= 2
        sl = slice(c, c + k)
        outs.append(kernel(
            params, stacked_j, jnp.asarray(g_sids[sl]),
            jnp.asarray(g_starts[sl]), jnp.asarray(g_begins[sl]),
            jnp.asarray(g_lens[sl]), jnp.asarray(g_offs[sl]),
            mask_j, pad_j,
        ))
        c += k
    out = np.asarray(jnp.concatenate(outs, axis=0))  # (rows_pad*slots, V)
    vocab = out.shape[-1]

    flat_meta = meta.reshape(-1, 2)
    tables = [
        np.zeros((lengths[a], vocab), np.float32) for a in range(n_assays)
    ]
    live = flat_meta[:, 0] >= 0
    for a in range(n_assays):
        sel = live & (flat_meta[:, 0] == a)
        tables[a][flat_meta[sel, 1]] = out[sel]
    return tables


def score_assays_packed(
    apply_fn: Callable,
    params,
    assays: Sequence[Tuple[str, Sequence[str]]],
    alphabet: EsmAlphabet = ALPHABET,
    offset_idx: int = 1,
    chunk: int = 32,
    super_chunks: int = 8,
    window: int = 1024,
    pad_to_multiple: int = 32,
    buckets: Optional[Sequence[int]] = None,
    seg_apply_fn: Optional[Callable] = None,
    row_len: int = 1024,
    seg_chunk: int = 8,
    cols_per_forward: int = 1,
) -> List[np.ndarray]:
    """Masked-marginal scoring of many (sequence, mutants) assays with
    cross-assay row packing. Per-assay scores match
    models/esm_scoring.score_assay(strategy='masked-marginals').

    With ``seg_apply_fn`` (a segment-aware apply, e.g.
    esm2.make_segmented_apply_fn), rows additionally pack SEGMENTS of
    different assays into fixed ``row_len`` rows (block-diagonal
    attention) — one compiled shape for the whole sweep.

    ``cols_per_forward`` > 1 enables the opt-in k-column table
    approximation (see packed_masked_marginal_tables); it applies to the
    bucketed path only and cannot combine with ``seg_apply_fn``.
    """
    if cols_per_forward > 1 and seg_apply_fn is not None:
        raise ValueError(
            "cols_per_forward > 1 does not combine with segment packing"
        )
    token_list = [alphabet.tokenize(seq) for seq, _ in assays]
    if seg_apply_fn is not None:
        tables = packed_segment_tables(
            seg_apply_fn, params, token_list,
            mask_idx=alphabet.mask_idx, pad_idx=alphabet.padding_idx,
            row_len=row_len, chunk=seg_chunk, super_chunks=super_chunks,
            window=window,
        )
    else:
        tables = packed_masked_marginal_tables(
            apply_fn, params, token_list,
            mask_idx=alphabet.mask_idx, pad_idx=alphabet.padding_idx,
            chunk=chunk, super_chunks=super_chunks, window=window,
            pad_to_multiple=pad_to_multiple, buckets=buckets,
            cols_per_forward=cols_per_forward,
        )
    return [
        np.asarray(score_mutants_from_table(
            jnp.asarray(tables[i]), mutants, seq,
            offset_idx=offset_idx, alphabet=alphabet,
        ))
        for i, (seq, mutants) in enumerate(assays)
    ]
