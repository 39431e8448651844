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


def fingerprint_batch(batch: pa.Table, *, min_len: int) -> pa.Table:
    """docs -> (anchor, doc_id) winnowing fingerprint rows."""
    kgram = max(min_len // 2, 16)
    w = min_len - kgram + 1
    doc_ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    out_anchor: list[np.ndarray] = []
    out_doc: list[np.ndarray] = []
    for i, text in enumerate(batch.column("text").to_pylist()):
        anchors = _winnow(_gram_hashes(text, kgram), w)
        if len(anchors):
            out_anchor.append(to_id63(anchors))
            out_doc.append(np.full(len(anchors), doc_ids[i], dtype=np.int64))
    if not out_anchor:
        return pa.table(
            {
                "anchor": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "anchor": pa.array(np.concatenate(out_anchor), type=pa.int64()),
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
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
    ta, tb = batch.column("text_a"), batch.column("text_b")
    grams: dict[int, np.ndarray] = {}

    def doc_grams(doc_id: int, col, i: int) -> np.ndarray:
        g = grams.get(doc_id)
        if g is None:
            g = _gram_hashes(col[i].as_py(), kgram)
            grams[doc_id] = g
        return g

    out_a, out_b, out_len = [], [], []
    for i in range(batch.num_rows):
        ga = doc_grams(int(a_ids[i]), ta, i)
        gb = doc_grams(int(b_ids[i]), tb, i)
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
