"""Token co-occurrence counts over the top-W document-frequency tokens —
the input matrix of count-based word-vector methods (GloVe-style
co-occurrence, pointwise-mutual-information pipelines; the PMI log is
monotone in these counts, so the count matrix is the oracle-checkable
core).

Pipeline shape (everything past the df groupby is O(W^2)-bounded):

1. DF: per-block per-doc DISTINCT tokens -> partial (token, n_docs)
   counts -> one groupby-sum shuffle over distinct tokens -> top-W by
   (df DESC, token ASC), broadcast ONCE (W strings — tiny).
2. CO-COUNT: each docs block maps its docs' distinct tokens into indices
   of the LEXICOGRAPHICALLY SORTED top-W array (so index order == binary
   string order == DuckDB's ``x.t < y.t``), emits per-doc index pairs
   (i < j), and pre-aggregates to at most C(W,2) partial rows per block.
3. One tiny groupby-sum over packed pair codes, then decode to strings.

The shuffle after stage 2 carries <= C(W,2) rows per block regardless of
corpus size; no stage holds anything corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def doc_distinct_token_df_block(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Per-block PARTIAL document-frequency counts: each doc contributes
    each of its distinct tokens once."""
    toks: list[str] = []
    for text in batch.column(col).to_pylist():
        if text:
            toks.extend(set(text.split()))
    if not toks:
        return pa.table(
            {"t": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    arr = np.array(toks, dtype=object)
    keys, counts = np.unique(arr, return_counts=True)
    return pa.table(
        {
            "t": pa.array(keys.tolist(), type=pa.string()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def top_df_tokens(docs_ds, top_w: int, num_partitions: int):
    """docs -> broadcast ref of the LEXICOGRAPHICALLY SORTED top-W tokens
    by (document frequency DESC, token ASC)."""
    import ray
    from ray.data.aggregate import Sum

    from dynaalign_ray.exec import broadcast_put

    grouped = (
        docs_ds.map_batches(
            doc_distinct_token_df_block,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("t", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    from dynaalign_ray.exec import partial_topk

    # per-block partial top-W over the distinct-token df table — no global
    # sort; (n DESC, t ASC) is a total order after the groupby
    top = partial_topk(grouped, [("n", "descending"), ("t", "ascending")], top_w)
    parts = [t for t in (ray.get(r) for r in top.materialize().to_arrow_refs()) if t.num_rows]
    toks: list[str] = []
    for t in parts:
        toks.extend(t.column("t").to_pylist())
    return broadcast_put(np.array(sorted(toks), dtype=object))


def cooccur_pairs_block(batch: pa.Table, *, top_ref, col: str = "text") -> pa.Table:
    """Docs block -> partial (pair_code, n) counts: pair_code packs the two
    sorted top-array indices as ``i * W + j`` (i < j)."""
    import ray

    top = ray.get(top_ref)
    w = len(top)
    out_schema = pa.schema([("pair_code", pa.int64()), ("n", pa.int64())])
    if w < 2 or batch.num_rows == 0:
        return out_schema.empty_table()
    codes_per_doc: list[np.ndarray] = []
    for text in batch.column(col).to_pylist():
        if not text:
            continue
        uniq = np.array(sorted(set(text.split())), dtype=object)
        pos = np.searchsorted(top, uniq)
        pos_c = np.minimum(pos, w - 1)
        hit = top[pos_c] == uniq
        idx = pos_c[hit]  # sorted ascending, distinct
        m = len(idx)
        if m >= 2:
            ai, bi = np.triu_indices(m, k=1)
            codes_per_doc.append(idx[ai] * w + idx[bi])
    if not codes_per_doc:
        return out_schema.empty_table()
    flat = np.concatenate(codes_per_doc)
    keys, counts = np.unique(flat, return_counts=True)
    return pa.table(
        {
            "pair_code": pa.array(keys.astype(np.int64), type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        },
        schema=out_schema,
    )


def token_cooccurrence(docs_ds, top_w: int, num_partitions: int):
    """docs (doc_id, text) -> (t1, t2, n_docs): for every pair of top-W
    df tokens with t1 < t2 (binary order), the number of docs containing
    both."""
    import functools

    import ray
    from ray.data.aggregate import Sum

    top_ref = top_df_tokens(docs_ds, top_w, num_partitions)

    def decode(b: pa.Table) -> pa.Table:
        top = ray.get(top_ref)
        w = len(top)
        code = np.asarray(b.column("pair_code")).astype(np.int64)
        return pa.table(
            {
                "t1": pa.array((top[code // w]).tolist(), type=pa.string()),
                "t2": pa.array((top[code % w]).tolist(), type=pa.string()),
                "n_docs": b.column("n"),
            }
        )

    return (
        docs_ds.map_batches(
            functools.partial(cooccur_pairs_block, top_ref=top_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("pair_code", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
    )
