"""Exact long-match span REMOVAL — the "deduplicating training data"
ExactSubstr operator (Lee et al. 2022): any byte span of at least ``k``
characters that appears more than once in the corpus is removed from every
occurrence except the lexicographic-first one, and documents are re-emitted
with the duplicated bytes cut out.

This completes the substring-dedup family: ``stages/substring.py`` finds
document PAIRS sharing a long run (winnowing + diagonal verify); this stage
performs the per-byte removal the north star calls "exact long-match
removal".

Algorithm (fixed-threshold specialization of the suffix-array formulation):
a span of length >= k is duplicated iff some stride-1 k-gram window inside
it has a colliding occurrence elsewhere, so adjacent-suffix LCP >= k
detection reduces exactly to duplicate k-gram-hash detection — no global
suffix array needed, and every step is a vectorized rolling-hash kernel
(``substring._gram_hashes``, O(n) per doc in the 2^64 ring).

1. explode: every (window_hash, enc) int64 pair, enc = doc_id * 2^POS_BITS
   + byte_pos (lexicographic (doc_id, pos) order preserved; guarded).
2. hash-repartition by win_hash + one Arrow group_by per block:
   per hash -> (min enc, count); keep count >= 2 only.
3. broadcast the duplicate-winner table (size-gated); second pass re-derives
   window hashes per batch, marks bytes covered by LOSER windows
   (occurrence enc != winner enc), and re-emits the surviving bytes.

Keep-first guarantee: for a duplicated span of L >= k bytes, every one of
its L-k+1 windows loses in every non-first occurrence, so the union of
loser windows covers the whole span — the copy is removed in full while the
first occurrence is untouched.

Scale shape: stride-1 emission is O(corpus bytes) rows of two int64s — the
exact form, run per corpus shard.  At 10^12 docs the discovery step instead
goes through the winnowing candidate-pair stage (``substring_edges``) and
this kernel runs only on pair members; the broadcast gate raises
NotImplementedError past ``max_broadcast_rows`` to keep that boundary
explicit.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from dynaalign_ray.stages.substring import _gram_hashes

_POS_BITS = 26  # byte offset within doc (64 MiB cap per doc)
_POS_CAP = 1 << _POS_BITS
_DOC_CAP = 1 << (63 - _POS_BITS)


def window_keys_batch(batch: pa.Table, *, k: int) -> pa.Table:
    """docs -> (win_hash, enc) rows for every stride-1 k-byte window."""
    doc_ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    if len(doc_ids) and int(doc_ids.max()) >= _DOC_CAP:
        raise ValueError(f"doc_id >= 2^{63 - _POS_BITS}: enc key would overflow")
    out_h: list[np.ndarray] = []
    out_e: list[np.ndarray] = []
    for i, text in enumerate(batch.column("text").to_pylist()):
        g = _gram_hashes(text, k)
        if not len(g):
            continue
        if len(g) > _POS_CAP:
            raise ValueError(f"doc longer than 2^{_POS_BITS} bytes: raise _POS_BITS")
        out_h.append((g >> np.uint64(1)).astype(np.int64))
        out_e.append(
            doc_ids[i] * _POS_CAP + np.arange(len(g), dtype=np.int64)
        )
    if not out_h:
        empty = pa.array([], type=pa.int64())
        return pa.table({"win_hash": empty, "enc": empty})
    return pa.table(
        {
            "win_hash": pa.array(np.concatenate(out_h), type=pa.int64()),
            "enc": pa.array(np.concatenate(out_e), type=pa.int64()),
        }
    )


def duplicate_window_table(docs_ds, num_partitions: int, *, k: int):
    """docs -> (win_hash, winner_enc) for window hashes with >= 2 occurrences.

    Hash-repartition by win_hash then ONE Arrow ``group_by`` per block
    (``batch_size=None`` = whole block, so each key is wholly local) — 7x
    faster than Ray's groupby().aggregate() at ~10^6 distinct keys, where
    per-key aggregate state dominates."""
    import pyarrow.compute as pc

    ex = docs_ds.map_batches(
        functools.partial(window_keys_batch, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def group_dups(b: pa.Table) -> pa.Table:
        g = b.group_by("win_hash").aggregate([("enc", "min"), ("enc", "count")])
        g = g.filter(pc.greater(g.column("enc_count"), 1))
        return pa.table(
            {"win_hash": g.column("win_hash"), "winner_enc": g.column("enc_min")}
        )

    return ex.repartition(num_blocks=num_partitions, keys=["win_hash"]).map_batches(
        group_dups,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class _ApplySpanDedup:
    """Second pass: cut every byte covered by a loser duplicate window.

    The mask construction is a difference-array pass (add 1 at loser window
    start, subtract 1 after its end, cumulative sum > 0 = covered) — O(doc
    bytes), no per-byte Python."""

    def __init__(self, dup_ref, *, k: int):
        import ray

        self.dup_hashes, self.winner_enc = ray.get(dup_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        doc_ids = np.asarray(batch.column("doc_id")).astype(np.int64)
        texts = batch.column("text").to_pylist()
        clean, removed, dup_windows = [], [], []
        for i, text in enumerate(texts):
            raw = text.encode("utf-8")
            g = _gram_hashes(text, k)
            h = (g >> np.uint64(1)).astype(np.int64)
            if len(self.dup_hashes) and len(h):
                pos = np.minimum(
                    np.searchsorted(self.dup_hashes, h), len(self.dup_hashes) - 1
                )
                enc = doc_ids[i] * _POS_CAP + np.arange(len(h), dtype=np.int64)
                lose = (self.dup_hashes[pos] == h) & (self.winner_enc[pos] != enc)
            else:
                lose = np.zeros(len(h), dtype=bool)
            starts = np.flatnonzero(lose)
            if len(starts):
                diff = np.zeros(len(raw) + 1, dtype=np.int32)
                np.add.at(diff, starts, 1)
                np.add.at(diff, starts + k, -1)
                covered = np.cumsum(diff[:-1]) > 0
                kept = np.frombuffer(raw, dtype=np.uint8)[~covered]
                clean.append(kept.tobytes().decode("utf-8", errors="ignore"))
                removed.append(int(covered.sum()))
            else:
                clean.append(text)
                removed.append(0)
            dup_windows.append(int(len(starts)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": pa.array(clean, type=pa.string()),
                "n_removed_bytes": pa.array(removed, type=pa.int64()),
                "n_dup_windows": pa.array(dup_windows, type=pa.int64()),
            }
        )


def span_dedup(
    docs_ds,
    num_partitions: int,
    *,
    k: int = 100,
    max_broadcast_rows: int = 50_000_000,
):
    """docs -> (doc_id, clean_text, n_removed_bytes, n_dup_windows) with every
    non-first occurrence of a duplicated >=k-byte span removed."""
    import ray

    dups = duplicate_window_table(docs_ds, num_partitions, k=k)
    parts = [t for t in (ray.get(r) for r in dups.to_arrow_refs()) if t.num_rows]
    dup_tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "win_hash": pa.array([], type=pa.int64()),
                "winner_enc": pa.array([], type=pa.int64()),
            }
        )
    )
    if dup_tbl.num_rows > max_broadcast_rows:
        raise NotImplementedError(
            "duplicate-window table exceeds the broadcast gate; at this scale "
            "route discovery through substring_edges (winnowing pairs) and run "
            "the removal kernel on pair members only"
        )
    hashes = np.asarray(dup_tbl.column("win_hash")).astype(np.int64)
    winners = np.asarray(dup_tbl.column("winner_enc")).astype(np.int64)
    order = np.argsort(hashes, kind="stable")
    dup_ref = ray.put((hashes[order], winners[order]))
    return docs_ds.map_batches(
        _ApplySpanDedup,
        fn_constructor_kwargs={"dup_ref": dup_ref, "k": k},
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
