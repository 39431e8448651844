"""Chunk-level exact dedup — the CCNet / RefinedWeb "paragraph dedup" step
re-expressed for Ray Data.

Real web corpora dedup at sub-document granularity: every paragraph (or
line) is hashed, duplicate units are dropped corpus-wide keeping exactly one
occurrence, and documents are re-assembled from their surviving units.  The
reference engine has no sub-document dedup (its ``distinct(sequence)``
operates on whole sequences, /root/reference/workspace/troyWspc.Rmd:34); this
stage is an engine addition for the webtext tier.

Unit granularity is pluggable:

- ``unit="line"``   — newline-delimited lines (the CCNet form).
- ``unit="words"``  — consecutive ``chunk_words``-word windows.  The driver
  testdata has no newlines, so the oracle-checked queries use this unit;
  whitespace is normalised (split + single-space re-join) identically on
  the engine and DuckDB sides.

Keep-first rule: a chunk occurrence survives iff its ``(doc_id, chunk_no)``
is the lexicographic minimum over all occurrences of that exact chunk
string.  ``doc_id`` ties cannot happen (doc_id is unique), so the winner's
doc is simply ``min(doc_id)``.

Scale shape (10^12 docs): the explode emits only ``(chunk_hash, enc)``
int64 pairs (plus one representative chunk string) into a hash
repartition by chunk_hash followed by one local Arrow ``group_by`` per
block — each key lands wholly in one block, so the local result is the
global one.
The duplicate-winner table (hashes with count >= 2 only) is broadcast once
via ``ray.put`` and probed per batch with a binary search; the second pass
re-derives chunks per batch and re-assembles documents with zero-copy Arrow
``binary_join`` — no text ever shuffles.  The broadcast is size-gated
(``max_broadcast_rows``); above the gate the dup table would move to a
partitioned join + per-partition reassembly (not needed at bench scale).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dynaalign_ray.hashing import content_hash

# enc = doc_id * 2^20 + chunk_no: lexicographic (doc_id, chunk_no) order is
# preserved iff every chunk_no < 2^20 and doc_id < 2^43 — guarded per batch.
_CHUNK_BITS = 20
_CHUNK_CAP = 1 << _CHUNK_BITS
_DOC_CAP = 1 << (63 - _CHUNK_BITS)


def _split_chunks(texts: pa.ChunkedArray | pa.Array, *, unit: str, chunk_words: int):
    """texts -> (flat chunk strings, parent doc index, chunk_no) numpy/Arrow.

    Returns ``(chunks: pa.Array[string], parent: np.int64, chunk_no: np.int64)``
    where ``parent`` indexes into the input batch.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if unit == "line":
        lists = pc.split_pattern(texts, "\n")
        flat = lists.flatten()
        parent = np.asarray(pc.list_parent_indices(lists)).astype(np.int64)
        offsets = np.asarray(lists.offsets).astype(np.int64)
        chunk_no = np.arange(len(flat), dtype=np.int64) - offsets[:-1][parent]
        return flat, parent, chunk_no
    if unit != "words":
        raise ValueError(f"unknown unit {unit!r}")
    lists = pc.split_pattern_regex(texts, r"\s+")
    flat = lists.flatten()
    parent = np.asarray(pc.list_parent_indices(lists)).astype(np.int64)
    # split_pattern_regex emits empty strings at leading/trailing whitespace;
    # drop them so the word stream matches DuckDB's regexp_extract_all('\S+')
    nonempty = np.asarray(pc.utf8_length(flat)).astype(np.int64) > 0
    if not nonempty.all():
        keep = np.flatnonzero(nonempty)
        flat = flat.take(pa.array(keep))
        parent = parent[keep]
    total = len(parent)
    if total == 0:
        return flat, parent, np.empty(0, dtype=np.int64)
    # word_no within doc (parent is non-decreasing in flatten order)
    n_docs = int(parent[-1]) + 1
    counts = np.bincount(parent, minlength=n_docs)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    word_no = np.arange(total, dtype=np.int64) - starts[parent]
    # chunk boundaries: every chunk_words-th word of each doc
    bnd = np.flatnonzero(word_no % chunk_words == 0)
    offsets = np.concatenate([bnd, [total]]).astype(np.int32)
    chunk_lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat)
    chunks = pc.binary_join(chunk_lists, " ")
    return chunks, parent[bnd], word_no[bnd] // chunk_words


def _enc_keys(batch: pa.Table, parent: np.ndarray, chunk_no: np.ndarray) -> np.ndarray:
    doc_ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    if len(chunk_no) and int(chunk_no.max()) >= _CHUNK_CAP:
        raise ValueError(
            f"chunk_no >= 2^{_CHUNK_BITS}; raise _CHUNK_BITS or shrink docs"
        )
    if len(doc_ids) and int(doc_ids.max()) >= _DOC_CAP:
        raise ValueError(f"doc_id >= 2^{63 - _CHUNK_BITS}; enc key would overflow")
    return doc_ids[parent] * _CHUNK_CAP + chunk_no


def explode_chunk_keys(
    batch: pa.Table, *, unit: str, chunk_words: int, with_text: bool = False
) -> pa.Table:
    """docs -> (chunk_hash, enc[, chunk]) rows — the shuffle payload."""
    chunks, parent, chunk_no = _split_chunks(
        batch.column("text"), unit=unit, chunk_words=chunk_words
    )
    h = content_hash(chunks.to_pylist())
    cols = {
        "chunk_hash": pa.array(h, type=pa.int64()),
        "enc": pa.array(_enc_keys(batch, parent, chunk_no), type=pa.int64()),
    }
    if with_text:
        cols["chunk"] = chunks
    return pa.table(cols)


def duplicate_chunk_groups(docs_ds, num_partitions: int, *, unit: str, chunk_words: int):
    """docs -> (chunk_hash, winner_enc, n_occ, chunk) for chunks with >= 2
    occurrences.  ``chunk`` rides through the aggregate as min over a column
    of identical strings (one representative per group).

    Hash-repartition by chunk_hash then ONE Arrow ``group_by`` per block
    (``batch_size=None`` = whole block, so each key is wholly local) — far
    faster than Ray's groupby().aggregate() at ~10^6 distinct keys, where
    per-key aggregate state dominates."""

    ex = docs_ds.map_batches(
        functools.partial(
            explode_chunk_keys, unit=unit, chunk_words=chunk_words, with_text=True
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def group_dups(b: pa.Table) -> pa.Table:
        g = b.group_by("chunk_hash").aggregate(
            [("enc", "min"), ("enc", "count"), ("chunk", "min")]
        )
        g = g.filter(pc.greater(g.column("enc_count"), 1))
        return pa.table(
            {
                "chunk_hash": g.column("chunk_hash"),
                "winner_enc": g.column("enc_min"),
                "n_occ": g.column("enc_count"),
                "chunk": g.column("chunk_min"),
            }
        )

    return ex.repartition(num_blocks=num_partitions, keys=["chunk_hash"]).map_batches(
        group_dups,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def chunk_dup_stats(docs_ds, num_partitions: int, *, unit: str = "words", chunk_words: int = 10):
    """Corpus duplicate-chunk stats: (chunk, n_occ, first_doc)."""
    dups = duplicate_chunk_groups(
        docs_ds, num_partitions, unit=unit, chunk_words=chunk_words
    )

    def project(b: pa.Table) -> pa.Table:
        winner = np.asarray(b.column("winner_enc")).astype(np.int64)
        return pa.table(
            {
                "chunk": b.column("chunk"),
                "n_occ": pc.cast(b.column("n_occ"), pa.int64()),
                "first_doc": pa.array(winner // _CHUNK_CAP, type=pa.int64()),
            }
        )

    return dups.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


class _ApplyChunkDedup:
    """Actor-pool second pass: re-derive chunks per batch, drop loser
    occurrences via binary search in the broadcast dup table, re-assemble
    documents with Arrow binary_join.  The broadcast object is fetched once
    per actor (zero-copy plasma read), not per batch."""

    def __init__(self, dup_ref, *, unit: str, chunk_words: int):
        import ray

        dup_hashes, winner_enc = ray.get(dup_ref)
        self.dup_hashes = dup_hashes  # sorted int64
        self.winner_enc = winner_enc
        self.unit = unit
        self.chunk_words = chunk_words
        self.joiner = "\n" if unit == "line" else " "

    def __call__(self, batch: pa.Table) -> pa.Table:
        chunks, parent, chunk_no = _split_chunks(
            batch.column("text"), unit=self.unit, chunk_words=self.chunk_words
        )
        n_docs = batch.num_rows
        h = content_hash(chunks.to_pylist())
        enc = _enc_keys(batch, parent, chunk_no)
        if len(self.dup_hashes):
            pos = np.minimum(
                np.searchsorted(self.dup_hashes, h), len(self.dup_hashes) - 1
            )
            drop = (self.dup_hashes[pos] == h) & (self.winner_enc[pos] != enc)
        else:
            drop = np.zeros(len(h), dtype=bool)
        keep = ~drop
        kept_counts = np.bincount(parent[keep], minlength=n_docs)
        offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
        kept_chunks = chunks.take(pa.array(np.flatnonzero(keep)))
        lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_chunks)
        clean = pc.binary_join(lists, self.joiner)
        # binary_join of an empty list yields "" (never null) — matches the
        # oracle's coalesce('')
        n_chunks = np.bincount(parent, minlength=n_docs)
        n_removed = np.bincount(parent[drop], minlength=n_docs)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": clean,
                "n_chunks": pa.array(n_chunks, type=pa.int64()),
                "n_removed": pa.array(n_removed, type=pa.int64()),
            }
        )


def chunk_dedup(
    docs_ds,
    num_partitions: int,
    *,
    unit: str = "words",
    chunk_words: int = 10,
    max_broadcast_rows: int = 50_000_000,
):
    """docs -> (doc_id, clean_text, n_chunks, n_removed) with duplicate chunk
    occurrences removed corpus-wide (keep lexicographic-first)."""
    import ray

    dups = duplicate_chunk_groups(
        docs_ds, num_partitions, unit=unit, chunk_words=chunk_words
    ).select_columns(["chunk_hash", "winner_enc"])
    parts = [t for t in (ray.get(r) for r in dups.to_arrow_refs()) if t.num_rows]
    dup_tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "chunk_hash": pa.array([], type=pa.int64()),
                "winner_enc": pa.array([], type=pa.int64()),
            }
        )
    )
    if dup_tbl.num_rows > max_broadcast_rows:
        raise NotImplementedError(
            "duplicate-chunk table exceeds the broadcast gate; the partitioned "
            "join + per-partition reassembly path is the 100 TB fallback"
        )
    hashes = np.asarray(dup_tbl.column("chunk_hash")).astype(np.int64)
    winners = np.asarray(dup_tbl.column("winner_enc")).astype(np.int64)
    order = np.argsort(hashes, kind="stable")
    dup_ref = ray.put((hashes[order], winners[order]))
    return docs_ds.map_batches(
        _ApplyChunkDedup,
        fn_constructor_kwargs={
            "dup_ref": dup_ref,
            "unit": unit,
            "chunk_words": chunk_words,
        },
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
