"""Exact long-match (substring) dedup — north-star third dedup path.

Finds document pairs sharing an exact byte run of at least ``min_len``
characters even when overall Jaccard is far below tau (e.g. a quoted
paragraph) — the class of duplication the MinHash stage deliberately
ignores.  Scalable design (no global suffix array):

1. per-doc winnowing fingerprints (MOSS-style): rolling polynomial hashes of
   every ``kgram``-char window, then the minimum hash in each window of
   ``w`` consecutive grams is selected.  Two docs sharing a run of length
   >= kgram + w - 1 are GUARANTEED to share a selected fingerprint,
   independent of alignment.  Defaults derive from ``min_len``:
   kgram = max(min_len // 2, 16) and w = min_len - kgram + 1, so detection
   is guaranteed at min_len and beyond.
2. (anchor_hash, doc_id) rows -> hash-partition -> bucket pair emission —
   the same keyed-shuffle skeleton as the LSH stage.
3. verify: recompute stride-1 gram hashes for both docs of a candidate pair
   and find the longest DIAGONAL run of matching gram positions (equal gram
   hash at positions (i, j) with constant j - i): a contiguous shared run of
   R bytes shows up as R - kgram + 1 consecutive same-diagonal matches.
   Matching on gram *membership* alone (np.isin) would false-positive on
   repetitive documents whose consecutive A-grams each match at scattered B
   positions.

The per-partition rolling-hash + sliding-min computation is the
memory-bounded stand-in for a per-partition suffix array (SURVEY.md §7 M7 /
hard part 6): O(doc bytes) per doc, vectorized.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from dynaalign_ray.hashing import U64, mix64, to_id63
from dynaalign_ray.joins import hash_join

_P = U64(0x100000001B3)
_PINV = U64(pow(0x100000001B3, -1, 1 << 64))


def _gram_hashes(text: str, kgram: int) -> np.ndarray:
    """Rolling polynomial hashes of every kgram-char window (stride 1),
    O(n) via prefix sums in the 2^64 ring (P is odd => invertible)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(U64)
    n = len(b)
    if n < kgram:
        return np.empty(0, dtype=U64)
    pows = np.ones(n, dtype=U64)
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _P, dtype=U64), out=pows[1:])
    pre = np.zeros(n + 1, dtype=U64)
    np.cumsum(b * pows, out=pre[1:], dtype=U64)
    win = pre[kgram:] - pre[:-kgram]
    m = n - kgram + 1
    inv = np.ones(m, dtype=U64)
    if m > 1:
        np.multiply.accumulate(np.full(m - 1, _PINV, dtype=U64), out=inv[1:])
    return mix64(win * inv)


def _winnow(grams: np.ndarray, w: int) -> np.ndarray:
    """Select the min gram hash of every window of w consecutive grams
    (deduplicated) — the standard winnowing fingerprint set."""
    if len(grams) == 0:
        return grams
    if len(grams) <= w:
        return np.unique(grams.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(grams, w)
    return np.unique(sw.min(axis=1))


def _gram_hashes_batch(col, kgram: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling gram hashes for a WHOLE Arrow string column in one pass over
    the concatenated utf-8 data buffer (zero-copy, no Python strings) —
    bit-identical to ``_gram_hashes`` per doc.

    Why one global pass is exact: with global prefix sums over P-powers,
    the window hash at global byte position g is
    (pre[g+kgram] - pre[g]) * P^-g; for a doc starting at byte s the
    doc-local value at i = g - s carries P^-(s+i) after its own prefix
    rebase, and the P^s factors cancel — the two expressions are equal in
    the 2^64 ring.  Windows crossing a doc boundary are masked out exactly
    as the shingle window-combine does.

    Returns (hashes concatenated in doc order, per-doc gram counts with
    counts[d] == max(byte_len(d) - kgram + 1, 0))."""
    from dynaalign_ray.shingles import varlen_offsets

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n_docs = len(col)
    if n_docs == 0:
        return np.empty(0, dtype=U64), np.zeros(0, dtype=np.int64)
    offs = varlen_offsets(col).astype(np.int64)
    lens = np.diff(offs)
    counts = np.maximum(lens - kgram + 1, 0)
    bufs = col.buffers()
    if bufs[2] is None:
        return np.empty(0, dtype=U64), counts
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    b = data[offs[0] : offs[-1]].astype(U64)
    n = len(b)
    if n < kgram:
        return np.empty(0, dtype=U64), counts
    pows = np.ones(n, dtype=U64)
    np.multiply.accumulate(np.full(n - 1, _P, dtype=U64), out=pows[1:])
    pre = np.zeros(n + 1, dtype=U64)
    np.cumsum(b * pows, out=pre[1:], dtype=U64)
    win = pre[kgram:] - pre[:-kgram]
    m = n - kgram + 1
    inv = np.ones(m, dtype=U64)
    if m > 1:
        np.multiply.accumulate(np.full(m - 1, _PINV, dtype=U64), out=inv[1:])
    h = mix64(win * inv)
    ends = np.cumsum(lens)  # doc-end byte positions, local to the slice
    starts_idx = np.arange(m, dtype=np.int64)
    doc_of = np.searchsorted(ends, starts_idx, side="right")
    valid = (starts_idx + kgram) <= ends[doc_of]
    return h[valid], counts


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _sliding_min_1d(a: np.ndarray, w: int) -> np.ndarray:
    """Min of every window of w consecutive values, O(n) (block prefix/
    suffix mins — the two-pass deque replacement), never O(n*w)."""
    n = len(a)
    if w <= 1:
        return a
    m = n - w + 1
    if m <= 0:
        return a[:0]
    pad = (-n) % w
    ap = np.concatenate([a, np.full(pad, _U64_MAX, dtype=U64)]) if pad else a
    blocks = ap.reshape(-1, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()
    suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suf[:m], pref[w - 1 : w - 1 + m])


def winnow_batch(col, kgram: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing fingerprints for a whole Arrow string column, batched:
    one zero-copy gram pass (``_gram_hashes_batch``), one O(total grams)
    sliding-min, one lexsort for the per-doc distinct — no per-doc Python.

    Returns (doc_index, fingerprint_u64) rows, distinct per doc, with the
    exact anchor SETS of ``_winnow(_gram_hashes(text, kgram), w)``."""
    grams, gcounts = _gram_hashes_batch(col, kgram)
    n_docs = len(gcounts)
    gends = np.cumsum(gcounts)
    gstarts = gends - gcounts
    total = int(gends[-1]) if n_docs else 0
    parts_doc: list[np.ndarray] = []
    parts_val: list[np.ndarray] = []
    # docs with 0 < grams < w: the single min over all their grams
    # (_winnow's small path; == w docs produce the identical single
    # window via the sliding path below)
    nonempty = gcounts > 0
    small = nonempty & (gcounts < w)
    if small.any():
        mins_all = np.minimum.reduceat(grams, gstarts[nonempty])
        parts_doc.append(np.flatnonzero(small))
        parts_val.append(mins_all[small[nonempty]])
    if total >= w:
        sm = _sliding_min_1d(grams, w)
        starts_idx = np.arange(len(sm), dtype=np.int64)
        doc_of = np.searchsorted(gends, starts_idx, side="right")
        valid = (starts_idx + w) <= gends[doc_of]
        parts_doc.append(doc_of[valid])
        parts_val.append(sm[valid])
    if not parts_doc:
        return np.zeros(0, dtype=np.int64), np.empty(0, dtype=U64)
    doc_idx = np.concatenate(parts_doc)
    vals = np.concatenate(parts_val)
    order = np.lexsort((vals, doc_idx))
    doc_idx = doc_idx[order]
    vals = vals[order]
    keep = np.empty(len(doc_idx), dtype=bool)
    keep[0] = True
    keep[1:] = (doc_idx[1:] != doc_idx[:-1]) | (vals[1:] != vals[:-1])
    return doc_idx[keep], vals[keep]


def fingerprint_batch(batch: pa.Table, *, min_len: int) -> pa.Table:
    """docs -> (anchor, doc_id) winnowing fingerprint rows — the batched
    winnower (one zero-copy gram pass + O(n) sliding min over the whole
    column), anchor sets identical to the per-doc ``_winnow`` path."""
    kgram = max(min_len // 2, 16)
    w = min_len - kgram + 1
    doc_ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    doc_idx, anchors = winnow_batch(batch.column("text"), kgram, w)
    return pa.table(
        {
            "anchor": pa.array(to_id63(anchors), type=pa.int64()),
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.int64()),
        }
    )


def _emit_bucket_pairs(batch: pa.Table, *, pair_cap: int) -> pa.Table:
    from dynaalign_ray.stages.bands import emit_pairs_block

    renamed = pa.table(
        {"band_key": batch.column("anchor"), "doc_id": batch.column("doc_id")}
    )
    return emit_pairs_block(renamed, pair_cap=pair_cap)


_OCC_CAP = 64  # per-gram B-position cap in the diagonal expansion: bounds the
# match matrix at occ_cap * len(A-grams) for pathological repetitive docs
# (a run surviving the cap still matches on the diagonal of its first
# occurrences; only >64-fold-repeated grams can theoretically hide a run)


def _longest_diagonal_run(ga: np.ndarray, gb: np.ndarray) -> int:
    """Longest run of consecutive same-diagonal gram matches between two
    stride-1 gram-hash arrays — fully vectorized (no per-element Python).

    A contiguous shared byte run of R chars appears as R - kgram + 1 matches
    (ga[i] == gb[i + d] for consecutive i at fixed diagonal d)."""
    order = np.argsort(gb, kind="stable")
    gbs = gb[order]
    left = np.searchsorted(gbs, ga, side="left")
    right = np.searchsorted(gbs, ga, side="right")
    cnt = np.minimum(right - left, _OCC_CAP)
    total = int(cnt.sum())
    if total == 0:
        return 0
    ii = np.repeat(np.arange(len(ga), dtype=np.int64), cnt)
    ends = np.cumsum(cnt)
    offs = np.arange(total, dtype=np.int64) - np.repeat(ends - cnt, cnt)
    jj = order[np.repeat(left, cnt) + offs]
    diag = jj - ii
    o2 = np.lexsort((ii, diag))
    d_s, i_s = diag[o2], ii[o2]
    # a match continues its run when the diagonal is unchanged and the A
    # position is the immediate successor
    brk = np.ones(total, dtype=bool)
    brk[1:] = (d_s[1:] != d_s[:-1]) | (i_s[1:] != i_s[:-1] + 1)
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, total))
    return int(lens.max())


def verify_substring_batch(batch: pa.Table, *, min_len: int) -> pa.Table:
    """(a, b, text_a, text_b) -> rows with an exact shared run >= min_len,
    plus the measured longest contiguous shared run length in chars.

    Gram hashes are computed once per distinct doc in the batch (docs appear
    in many candidate pairs); the run scan is the vectorized diagonal kernel
    above."""
    kgram = max(min_len // 2, 16)
    need = min_len - kgram + 1  # consecutive same-diagonal matches required
    a_ids = np.asarray(batch.column("a")).astype(np.int64)
    b_ids = np.asarray(batch.column("b")).astype(np.int64)
    ta = batch.column("text_a").combine_chunks()
    tb = batch.column("text_b").combine_chunks()
    # gram hashes for every DISTINCT doc of the batch in one batched pass
    # (docs appear in many candidate pairs); slices index the shared array
    ids_all = np.concatenate([a_ids, b_ids])
    uniq_ids, first_idx = np.unique(ids_all, return_index=True)
    texts_all = pa.chunked_array([ta, tb]).combine_chunks()
    hashes, gcounts = _gram_hashes_batch(
        texts_all.take(pa.array(first_idx, type=pa.int64())), kgram
    )
    gends = np.cumsum(gcounts)
    grams = {
        int(uniq_ids[i]): hashes[gends[i] - gcounts[i] : gends[i]]
        for i in range(len(uniq_ids))
    }

    out_a, out_b, out_len = [], [], []
    for i in range(batch.num_rows):
        ga = grams[int(a_ids[i])]
        gb = grams[int(b_ids[i])]
        if len(ga) == 0 or len(gb) == 0:
            continue
        best = _longest_diagonal_run(ga, gb)
        if best >= need:
            out_a.append(a_ids[i])
            out_b.append(b_ids[i])
            out_len.append(best + kgram - 1)
    return pa.table(
        {
            "a": pa.array(out_a, type=pa.int64()),
            "b": pa.array(out_b, type=pa.int64()),
            "match_len": pa.array(out_len, type=pa.int64()),
        }
    )


def substring_edges(docs_ds, num_partitions: int, *, min_len: int = 200, pair_cap: int = 64):
    """docs -> verified substring-dup edges (a, b, match_len)."""
    fp = docs_ds.map_batches(
        functools.partial(fingerprint_batch, min_len=min_len),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = fp.repartition(num_blocks=num_partitions, keys=["anchor"]).map_batches(
        functools.partial(_emit_bucket_pairs, pair_cap=pair_cap),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from dynaalign_ray.stages.bands import dedup_pairs_block

    pairs = pairs.repartition(num_blocks=num_partitions, keys=["a", "b"]).map_batches(
        dedup_pairs_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    texts = docs_ds.select_columns(["doc_id", "text"])

    def _t(name):
        def project(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b.column("doc_id"), name: b.column("text")})

        return texts.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    j1 = hash_join(
        pairs,
        _t("text_a"),
        left_on="a",
        right_on="doc_id",
        left_schema=pairs_schema,
        right_schema=pa.schema([("doc_id", pa.int64()), ("text_a", pa.string())]),
        num_partitions=num_partitions,
    )
    j2 = hash_join(
        j1,
        _t("text_b"),
        left_on="b",
        right_on="doc_id",
        left_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("text_a", pa.string())]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("text_b", pa.string())]),
        num_partitions=num_partitions,
    )
    return j2.map_batches(
        functools.partial(verify_substring_batch, min_len=min_len),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
