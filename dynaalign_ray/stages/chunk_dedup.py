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

Exactness discipline: the shuffle is ROUTED by the 64-bit content hash but
GROUPED by the chunk string inside each block, and the broadcast-plan probe
string-verifies every hash hit against the winner's representative chunk —
a cross-string hash collision can co-locate two chunks in one block but can
never delete a non-duplicate (the repo-wide "exactness never depends on
hash injectivity" rule).

Physical plans (size-gated, both exact):

- ``plan="broadcast"`` (default while the duplicate-winner table fits
  ``max_broadcast_rows``): the winner table — (chunk_hash, winner_enc,
  chunk) for chunk strings with >= 2 occurrences — is ``ray.put`` once and
  probed per batch with a binary search + string verify; documents are
  re-assembled with zero-copy Arrow ``binary_join``.
- ``plan="join"`` (the 10^12-doc fallback, chosen automatically above the
  gate): LOSER occurrences (every occurrence of a duplicated chunk except
  the winner) are emitted directly from the same keyed winner blocks —
  each chunk string's rows are wholly local after the one hash shuffle, so
  no second join against the corpus is needed — grouped per ``doc_id``
  into drop lists, and ``joins.hash_join``-ed against the docs; the apply
  pass cuts the listed chunk_nos.  Nothing is ever broadcast; every table
  in the plan scales with the number of DUPLICATE occurrences, not the
  corpus.
"""

from __future__ import annotations

from dynaalign_ray.exec import broadcast_put

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


def _winner_groups_block(b: pa.Table) -> pa.Table:
    """One keyed block -> duplicated-chunk winner groups, grouped by the
    chunk STRING (hash only routed the shuffle): (chunk_hash, winner_enc,
    n_occ, chunk)."""
    g = b.group_by("chunk").aggregate(
        [("enc", "min"), ("enc", "count"), ("chunk_hash", "min")]
    )
    g = g.filter(pc.greater(g.column("enc_count"), 1))
    return pa.table(
        {
            "chunk_hash": g.column("chunk_hash_min"),
            "winner_enc": g.column("enc_min"),
            "n_occ": pc.cast(g.column("enc_count"), pa.int64()),
            "chunk": g.column("chunk"),
        }
    )


def duplicate_chunk_groups(docs_ds, num_partitions: int, *, unit: str, chunk_words: int):
    """docs -> (chunk_hash, winner_enc, n_occ, chunk) for chunk strings with
    >= 2 occurrences.

    Hash-repartition by chunk_hash then ONE Arrow ``group_by`` (on the chunk
    string) per block (``batch_size=None`` = whole block, so each key is
    wholly local) — far faster than Ray's groupby().aggregate() at ~10^6
    distinct keys, where per-key aggregate state dominates."""

    ex = docs_ds.map_batches(
        functools.partial(
            explode_chunk_keys, unit=unit, chunk_words=chunk_words, with_text=True
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ex.repartition(num_blocks=num_partitions, keys=["chunk_hash"]).map_batches(
        _winner_groups_block,
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


def _dup_and_losers(docs_ds, num_partitions: int, *, unit: str, chunk_words: int):
    """One explode + ONE keyed shuffle -> a tagged union per block:

    - kind=0 rows: winner groups (chunk_hash, enc=winner_enc, n_occ, chunk)
    - kind=1 rows: LOSER occurrences (enc) — every occurrence of a
      duplicated chunk string except its winner.

    Each chunk string's occurrences are wholly local after the shuffle, so
    losers come from an in-block Arrow join — no corpus-sized second pass.
    Both physical plans of :func:`chunk_dedup` read from this one dataset."""
    ex = docs_ds.map_batches(
        functools.partial(
            explode_chunk_keys, unit=unit, chunk_words=chunk_words, with_text=True
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def split_block(b: pa.Table) -> pa.Table:
        w = _winner_groups_block(b)
        winners = pa.table(
            {
                "kind": pa.array(np.zeros(w.num_rows, dtype=np.int8)),
                "chunk_hash": w.column("chunk_hash"),
                "enc": w.column("winner_enc"),
                "n_occ": w.column("n_occ"),
                "chunk": w.column("chunk"),
            }
        )
        # losers: in-block string join of occurrences against winner mins
        occ = pa.table({"chunk": b.column("chunk"), "enc": b.column("enc")})
        win_keys = pa.table(
            {"chunk": w.column("chunk"), "wenc": w.column("winner_enc")}
        )
        j = occ.join(win_keys, keys=["chunk"], join_type="inner")
        j = j.filter(pc.not_equal(j.column("enc"), j.column("wenc")))
        n = j.num_rows
        losers = pa.table(
            {
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "chunk_hash": pa.nulls(n, type=pa.int64()),
                "enc": j.column("enc"),
                "n_occ": pa.nulls(n, type=pa.int64()),
                "chunk": pa.nulls(n, type=pa.string()),
            }
        )
        return pa.concat_tables([winners, losers]).combine_chunks()

    return ex.repartition(num_blocks=num_partitions, keys=["chunk_hash"]).map_batches(
        split_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class _ApplyChunkDedup:
    """Actor-pool second pass (broadcast plan): re-derive chunks per batch,
    drop loser occurrences via binary search in the broadcast dup table —
    every hash hit is STRING-VERIFIED against the winner's representative
    chunk, so a 64-bit collision can never delete a non-duplicate — then
    re-assemble documents with Arrow binary_join.  The broadcast object is
    fetched once per actor (zero-copy plasma read), not per batch."""

    def __init__(self, dup_ref, *, unit: str, chunk_words: int):
        import ray

        dup_hashes, winner_enc, dup_chunks = ray.get(dup_ref)
        self.dup_hashes = dup_hashes  # sorted int64
        self.winner_enc = winner_enc
        self.dup_chunks = dup_chunks  # object ndarray aligned with dup_hashes
        self.unit = unit
        self.chunk_words = chunk_words
        self.joiner = "\n" if unit == "line" else " "

    def __call__(self, batch: pa.Table) -> pa.Table:
        chunks, parent, chunk_no = _split_chunks(
            batch.column("text"), unit=self.unit, chunk_words=self.chunk_words
        )
        n_docs = batch.num_rows
        chunk_list = chunks.to_pylist()
        h = content_hash(chunk_list)
        enc = _enc_keys(batch, parent, chunk_no)
        nh = len(self.dup_hashes)
        if nh and len(h):
            cand = np.searchsorted(self.dup_hashes, h, side="left")
            in_range = cand < nh
            cand = np.minimum(cand, nh - 1)
            hit = in_range & (self.dup_hashes[cand] == h)
            # string-verify every hash hit (collision safety); equal-hash
            # runs longer than 1 are ~2^-64-rare — scan them individually
            hit_idx = np.flatnonzero(hit)
            if len(hit_idx):
                occ = np.asarray(chunk_list, dtype=object)
                eq = self.dup_chunks[cand[hit_idx]] == occ[hit_idx]
                for t in hit_idx[~eq]:
                    p = int(cand[t]) + 1
                    hv = h[t]
                    hit[t] = False
                    while p < nh and self.dup_hashes[p] == hv:
                        if self.dup_chunks[p] == chunk_list[t]:
                            hit[t] = True
                            cand[t] = p
                            break
                        p += 1
            drop = hit & (self.winner_enc[cand] != enc)
        else:
            drop = np.zeros(len(h), dtype=bool)
        return _reassemble(batch, chunks, parent, drop, n_docs, self.joiner)


def _reassemble(
    batch: pa.Table,
    chunks: pa.Array,
    parent: np.ndarray,
    drop: np.ndarray,
    n_docs: int,
    joiner: str,
) -> pa.Table:
    """Shared re-assembly: cut dropped chunk occurrences, binary_join the
    survivors per document (empty survivor list yields "", never null —
    matches the oracle's coalesce(''))."""
    keep = ~drop
    kept_counts = np.bincount(parent[keep], minlength=n_docs)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
    kept_chunks = chunks.take(pa.array(np.flatnonzero(keep)))
    lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_chunks)
    clean = pc.binary_join(lists, joiner)
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


def _chunk_dedup_join_plan(docs_ds, losers_ds, num_partitions: int, *, unit, chunk_words):
    """Partitioned plan: loser encs -> per-doc drop lists -> hash_join against
    the docs -> per-batch cut.  No broadcast; every intermediate scales with
    the duplicate-occurrence count."""
    from dynaalign_ray.joins import hash_join, pack_int64_list, unpack_int64_blob

    def derive(b: pa.Table) -> pa.Table:
        enc = np.asarray(b.column("enc")).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(enc // _CHUNK_CAP, type=pa.int64()),
                "chunk_no": pa.array(enc % _CHUNK_CAP, type=pa.int64()),
            }
        )

    def to_lists(b: pa.Table) -> pa.Table:
        # list payloads ride the join as packed int64 bytes (acero rejects
        # nested non-key types; see joins.pack_int64_list)
        g = b.group_by("doc_id").aggregate([("chunk_no", "list")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "drop_blob": pack_int64_list(g.column("chunk_no_list")),
            }
        )

    loser_lists = (
        losers_ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["doc_id"])
        .map_batches(
            to_lists, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    joined = hash_join(
        docs_ds.select_columns(["doc_id", "text"]),
        loser_lists,
        left_on="doc_id",
        right_on="doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("drop_blob", pa.binary())]),
        num_partitions=num_partitions,
        how="left outer",
    )
    joiner = "\n" if unit == "line" else " "

    def apply(batch: pa.Table) -> pa.Table:
        chunks, parent, chunk_no = _split_chunks(
            batch.column("text"), unit=unit, chunk_words=chunk_words
        )
        n_docs = batch.num_rows
        dl = batch.column("drop_blob")
        if isinstance(dl, pa.ChunkedArray):
            dl = dl.combine_chunks()
        valid = np.flatnonzero(np.asarray(pc.is_valid(dl)))
        if len(valid):
            blobs = [unpack_int64_blob(dl[int(i)].as_py()) for i in valid]
            drop_parent = np.repeat(valid, [len(x) for x in blobs]).astype(np.int64)
            drop_nos = np.concatenate(blobs)
            drop_keys = np.sort(drop_parent * _CHUNK_CAP + drop_nos)
            occ_keys = parent * _CHUNK_CAP + chunk_no
            if len(occ_keys):
                pos = np.minimum(
                    np.searchsorted(drop_keys, occ_keys), len(drop_keys) - 1
                )
                drop = drop_keys[pos] == occ_keys
            else:
                drop = np.zeros(0, dtype=bool)
        else:
            drop = np.zeros(len(parent), dtype=bool)
        return _reassemble(batch, chunks, parent, drop, n_docs, joiner)

    return joined.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def chunk_dedup(
    docs_ds,
    num_partitions: int,
    *,
    unit: str = "words",
    chunk_words: int = 10,
    max_broadcast_rows: int = 50_000_000,
    plan: str | None = None,
):
    """docs -> (doc_id, clean_text, n_chunks, n_removed) with duplicate chunk
    occurrences removed corpus-wide (keep lexicographic-first).

    ``plan``: None = auto (broadcast while the winner table fits
    ``max_broadcast_rows``, else the partitioned join plan), or force
    "broadcast" / "join" (plan-agreement tests pin each)."""
    import ray

    if plan not in (None, "broadcast", "join"):
        raise ValueError(f"unknown plan {plan!r}")
    both = _dup_and_losers(
        docs_ds, num_partitions, unit=unit, chunk_words=chunk_words
    ).materialize()

    def _only(kind: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("kind"), kind))

        return f

    winners_ds = both.map_batches(
        _only(0), batch_format="pyarrow", zero_copy_batch=True
    )
    if plan is None:
        n_winners = winners_ds.count()
        plan = "broadcast" if n_winners <= max_broadcast_rows else "join"
    if plan == "join":
        losers_ds = both.map_batches(
            _only(1), batch_format="pyarrow", zero_copy_batch=True
        ).select_columns(["enc"])
        return _chunk_dedup_join_plan(
            docs_ds, losers_ds, num_partitions, unit=unit, chunk_words=chunk_words
        )

    from dynaalign_ray.joins import collect_arrow

    dup_tbl = collect_arrow(winners_ds.select_columns(["chunk_hash", "enc", "chunk"]))
    if dup_tbl.num_rows == 0:
        dup_tbl = pa.table(
            {
                "chunk_hash": pa.array([], type=pa.int64()),
                "enc": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            }
        )
    hashes = np.asarray(dup_tbl.column("chunk_hash")).astype(np.int64)
    winners = np.asarray(dup_tbl.column("enc")).astype(np.int64)
    chunks_rep = np.asarray(dup_tbl.column("chunk").to_pylist(), dtype=object)
    order = np.argsort(hashes, kind="stable")
    dup_ref = broadcast_put((hashes[order], winners[order], chunks_rep[order]))
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
