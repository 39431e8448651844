"""TF-IDF term scoring — the "most distinctive term per document" operator a
curation pipeline uses for topic tagging / boilerplate spotting.

The reference has no TF-IDF, but its vocabulary machinery (create_vocab,
/root/reference/R/minHash.R:38-41) is the same global-distinct-over-tokens
shape; this operator adds the per-document weighting on top.

Physical plan (all Arrow-C / numpy, no per-row Python):

1. ``term_frequencies``: per batch, ``split_pattern_regex`` + list-flatten +
   one Arrow ``group_by(doc_id, term)`` — a doc is one row, so per-batch
   counts are globally exact.
2. ``document_frequencies``: tf rows are unique per (doc, term), so
   df(term) = row count per term.  Routed by ``hash(term)`` (the int63
   repartition key) but GROUPED by the term string inside each block —
   exactness never depends on hash injectivity; a collision only co-locates
   two terms in the same block.
3. ``top_terms``: broadcast the (term-sorted) df table, score each tf row
   ``tf * n_docs / df`` (rarity-weighted frequency — the log-free idf
   variant: integer inputs, one IEEE multiply + divide, so the score is
   bit-identical across engines, which the hash-exact oracle requires;
   log-idf is a one-line swap where cross-engine determinism isn't needed),
   then one keyed repartition by doc_id + per-block Arrow sort picks each
   doc's best (score desc, term asc) row.

Scale: the broadcast df table is vocabulary-sized; past
``joins.BROADCAST_ROW_LIMIT`` the plan switches automatically to a
partitioned ``joins.hash_join`` on ``hash(term)`` with a post-join
string-equality filter — exact regardless of hash collisions (a collision
only produces an extra joined row that the string check drops).  Both
plans are pin-able via ``plan=`` for the plan-agreement tests.
"""

from __future__ import annotations

from dynaalign_ray.exec import broadcast_put

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dynaalign_ray.hashing import hash_strings, to_id63

_SPLIT_WS = r"\s+"


def _flat_tokens(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """(doc_id per token, token) for whitespace tokens, empties dropped."""
    txt = batch.column("text").combine_chunks()
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.chunk(0) if txt.num_chunks else pa.array([], type=pa.string())
    lists = pc.split_pattern_regex(txt, pattern=_SPLIT_WS)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    doc_ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    return doc_ids[parent], flat


def term_frequencies(docs_ds):
    """docs -> (doc_id, term, tf) — one row per distinct (doc, term)."""

    def tf_block(batch: pa.Table) -> pa.Table:
        doc_per_tok, terms = _flat_tokens(batch)
        t = pa.table(
            {"doc_id": pa.array(doc_per_tok, type=pa.int64()), "term": terms}
        )
        g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "term": g.column("term"),
                "tf": g.column("count_all").cast(pa.int64()),
            }
        )

    return docs_ds.map_batches(
        tf_block, batch_format="pyarrow", zero_copy_batch=True
    )


def document_frequencies(tf_ds, num_partitions: int):
    """tf rows -> (term, df).  Hash-routed, string-grouped (see module doc)."""

    def add_route(batch: pa.Table) -> pa.Table:
        h = to_id63(hash_strings(batch.column("term").to_pylist()))
        return batch.append_column("term_hash", pa.array(h, type=pa.int64()))

    def df_block(b: pa.Table) -> pa.Table:
        g = b.group_by("term").aggregate([([], "count_all")])
        return pa.table(
            {"term": g.column("term"), "df": g.column("count_all").cast(pa.int64())}
        )

    return (
        tf_ds.select_columns(["term"])
        .map_batches(add_route, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["term_hash"])
        .map_batches(
            df_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def _scored_tf_broadcast(tf, df_ds, n: float):
    """tf rows scored against a BROADCAST df table (one plasma replica)."""
    import ray

    from dynaalign_ray.joins import collect_arrow

    df_tbl = collect_arrow(df_ds)
    order = pc.sort_indices(df_tbl, sort_keys=[("term", "ascending")])
    df_tbl = df_tbl.take(order)
    terms_sorted = np.asarray(df_tbl.column("term").to_pylist(), dtype=object)
    df_sorted = np.asarray(df_tbl.column("df")).astype(np.int64)
    ref = broadcast_put((terms_sorted, df_sorted))

    def score_block(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ts, dfs = ray.get(ref)
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        # every tf term exists in the df table by construction; pd.Index
        # get_indexer = C hash-table lookup (no per-term Python compares)
        pos = pd.Index(ts).get_indexer(terms)
        dfv = dfs[pos]
        tfv = np.asarray(batch.column("tf")).astype(np.int64)
        score = tfv.astype(np.float64) * n / dfv.astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "tf": batch.column("tf"),
                "df": pa.array(dfv, type=pa.int64()),
                "score": pa.array(score, type=pa.float64()),
            }
        )

    return tf.map_batches(score_block, batch_format="pyarrow", zero_copy_batch=True)


def _scored_tf_hashjoin(tf, df_ds, n: float, num_partitions: int):
    """tf rows scored via a partitioned hash_join on hash(term) — the
    vocabulary-too-big-to-broadcast plan.  The join key is the int63 term
    hash; the post-join ``term == df_term`` string filter makes the result
    exact regardless of hash collisions (a collision only adds a joined row
    the filter drops)."""
    from dynaalign_ray.joins import hash_join

    def add_route(batch: pa.Table) -> pa.Table:
        h = to_id63(hash_strings(batch.column("term").to_pylist()))
        return batch.append_column("term_hash", pa.array(h, type=pa.int64()))

    def rename_df(batch: pa.Table) -> pa.Table:
        h = to_id63(hash_strings(batch.column("term").to_pylist()))
        return pa.table(
            {
                "term_hash": pa.array(h, type=pa.int64()),
                "df_term": batch.column("term"),
                "df": batch.column("df"),
            }
        )

    lt = tf.map_batches(add_route, batch_format="pyarrow", zero_copy_batch=True)
    rt = df_ds.map_batches(rename_df, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(
        lt,
        rt,
        left_on="term_hash",
        right_on="term_hash",
        left_schema=pa.schema(
            [
                ("term_hash", pa.int64()),
                ("doc_id", pa.int64()),
                ("term", pa.string()),
                ("tf", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("term_hash", pa.int64()), ("df_term", pa.string()), ("df", pa.int64())]
        ),
        num_partitions=num_partitions,
        how="inner",
    )

    def score_block(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("term"), batch.column("df_term")))
        tfv = np.asarray(b.column("tf")).astype(np.int64)
        dfv = np.asarray(b.column("df")).astype(np.int64)
        score = tfv.astype(np.float64) * n / dfv.astype(np.float64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "term": b.column("term"),
                "tf": b.column("tf"),
                "df": b.column("df"),
                "score": pa.array(score, type=pa.float64()),
            }
        )

    return joined.map_batches(score_block, batch_format="pyarrow", zero_copy_batch=True)


def top_terms(
    docs_ds,
    num_partitions: int,
    *,
    n_docs: int | None = None,
    plan: str | None = None,
):
    """docs -> (doc_id, term, tf, df, score): each doc's highest-scoring term,
    score = tf * n_docs / df, ties broken by lexicographically-first term.
    Docs with no tokens emit no row.

    ``plan``: None = auto (broadcast while the df table fits
    ``joins.BROADCAST_ROW_LIMIT``, else the partitioned hash(term) join), or
    force "broadcast" / "join"."""
    from dynaalign_ray.joins import BROADCAST_ROW_LIMIT

    if plan not in (None, "broadcast", "join"):
        raise ValueError(f"unknown plan {plan!r}")
    if n_docs is None:
        n_docs = docs_ds.count()
    tf = term_frequencies(docs_ds)
    df_ds = document_frequencies(tf, num_partitions).materialize()
    if plan is None:
        plan = "broadcast" if df_ds.count() <= BROADCAST_ROW_LIMIT else "join"
    n = float(n_docs)
    if plan == "join":
        scored = _scored_tf_hashjoin(tf, df_ds, n, num_partitions)
    else:
        scored = _scored_tf_broadcast(tf, df_ds, n)

    def top1_block(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ],
        )
        s = b.take(idx)
        d = np.asarray(s.column("doc_id")).astype(np.int64)
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        return s.filter(pa.array(first))

    return scored.repartition(num_blocks=num_partitions, keys=["doc_id"]).map_batches(
        top1_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
