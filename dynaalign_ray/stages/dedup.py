"""Exact / normalized dedup — the reference ecosystem's ``distinct(sequence)``
preprocessing (/root/reference/workspace/troyWspc.Rmd:34,159) as a
distributed groupby: content-hash each text in a vectorized map, then a
hash repartition by text_hash + one local Arrow group_by per block keeps
the min doc_id per hash (the shuffle carries only (hash, doc_id) pairs,
never text)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dynaalign_ray.hashing import content_hash


def add_content_hash(batch: pa.Table, *, normalize: bool = False, col: str = "text") -> pa.Table:
    """Append an int63 ``text_hash`` column.  ``normalize=True`` lowercases
    and collapses whitespace first (near-trivial-dup variant)."""
    texts = batch.column(col)
    if normalize:
        texts = pc.utf8_lower(texts)
        texts = pc.replace_substring_regex(texts, r"\s+", " ")
        texts = pc.utf8_trim_whitespace(texts)
    h = content_hash(texts.to_pylist())
    return batch.append_column("text_hash", pa.array(h, type=pa.int64()))


def exact_dedup_groups(docs_ds, num_partitions: int, normalize: bool = False):
    """docs -> (text_hash, doc_id=min over group, n_dups).

    The representative (min doc_id) is permutation-invariant, matching the
    near-dup stage's cluster_id convention.
    """
    import functools

    hashed = docs_ds.map_batches(
        functools.partial(add_content_hash, normalize=normalize),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["text_hash", "doc_id"])

    # one distinct key per unique doc: hash-repartition + one local Arrow
    # group_by per whole block beats Ray's aggregate (per-key state) ~7x at
    # 10^6 keys; each key lands wholly in one block so local == global
    def group_block(b: pa.Table) -> pa.Table:
        g = b.group_by("text_hash").aggregate([("doc_id", "min"), ("doc_id", "count")])
        return pa.table(
            {
                "text_hash": g.column("text_hash"),
                "doc_id": g.column("doc_id_min"),
                "n_dups": g.column("doc_id_count"),
            }
        )

    return hashed.repartition(
        num_blocks=num_partitions, keys=["text_hash"]
    ).map_batches(
        group_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def exact_dedup_decisions(docs_ds, num_partitions: int, normalize: bool = False):
    """docs -> (doc_id, keep, duplicate_of): keep iff the doc is its group's
    min doc_id.  One extra join ships only (text_hash, min_doc)."""
    import functools

    from dynaalign_ray.joins import hash_join

    groups = exact_dedup_groups(docs_ds, num_partitions, normalize)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"text_hash": batch.column("text_hash"), "rep_id": batch.column("doc_id")}
        )

    reps = groups.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    hashed = docs_ds.map_batches(
        functools.partial(add_content_hash, normalize=normalize),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["doc_id", "text_hash"])
    joined = hash_join(
        hashed,
        reps,
        left_on="text_hash",
        right_on="text_hash",
        left_schema=pa.schema([("text_hash", pa.int64()), ("doc_id", pa.int64())]),
        right_schema=pa.schema([("text_hash", pa.int64()), ("rep_id", pa.int64())]),
        num_partitions=num_partitions,
    )

    def decide(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch.column("doc_id")).astype(np.int64)
        rep = np.asarray(batch.column("rep_id")).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "keep": pa.array(doc == rep),
                "duplicate_of": pa.array(rep, type=pa.int64()),
            }
        )

    return joined.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True)
