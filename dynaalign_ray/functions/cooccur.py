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
import pyarrow.compute as pc


def _flat_tokens(batch: pa.Table, col: str) -> tuple[pa.Array, np.ndarray]:
    """One whitespace-split pass over the column -> (nonempty flat tokens,
    per-token doc index) — the shared Arrow-native tokenizer of this
    module (empty tokens dropped to match Python str.split)."""
    toks = pc.utf8_split_whitespace(batch.column(col))
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    counts = np.diff(np.asarray(toks.offsets).astype(np.int64))
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    if len(keep) and not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
    return flat, doc_of


def doc_distinct_token_df_block(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Per-block PARTIAL document-frequency counts: each doc contributes
    each of its distinct tokens once — Arrow-native (split once, (doc,
    token) distinct via empty-aggregate group_by, then value_counts)."""
    empty = pa.table({"t": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    flat, doc_of = _flat_tokens(batch, col)
    if len(doc_of) == 0:
        return empty
    distinct = (
        pa.table({"d": pa.array(doc_of, type=pa.int64()), "t": flat})
        .group_by(["d", "t"])
        .aggregate([])
    )
    vc = pc.value_counts(distinct.column("t"))
    return pa.table(
        {"t": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
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
    # Arrow-native: one split pass, hash-lookup every token's top-W index
    # (pc.index_in — value_set is the sorted top array, so index order ==
    # binary string order), distinct (doc, idx) via one np.unique on a
    # packed code, then SEGMENT-VECTORIZED triu pair emission: each
    # element pairs with its same-doc successors via repeat/offset
    # arithmetic — no per-doc Python.
    flat, doc_of = _flat_tokens(batch, col)
    if len(doc_of) == 0:
        return out_schema.empty_table()
    ipos = pc.index_in(flat, value_set=pa.array(top.tolist(), type=pa.string()))
    hit = np.asarray(ipos.is_valid())
    if not hit.any():
        return out_schema.empty_table()
    idx = np.asarray(ipos.fill_null(0)).astype(np.int64)[hit]
    d = doc_of[hit]
    packed = np.unique(d * np.int64(w) + idx)  # distinct, sorted by (d, idx)
    d2 = packed // w
    i2 = packed % w
    n = len(packed)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = d2[1:] != d2[:-1]
    seg = np.cumsum(first) - 1
    m_of = np.bincount(seg).astype(np.int64)  # distinct-top-token count per doc
    starts = np.cumsum(m_of) - m_of
    pos = np.arange(n, dtype=np.int64) - starts[seg]
    rep = m_of[seg] - 1 - pos  # successors each element pairs with
    total = int(rep.sum())
    if total == 0:
        return out_schema.empty_table()
    a_idx = np.repeat(np.arange(n, dtype=np.int64), rep)
    ends = np.cumsum(rep)
    offs = np.arange(total, dtype=np.int64) - np.repeat(ends - rep, rep)
    b_idx = a_idx + 1 + offs
    codes = i2[a_idx] * np.int64(w) + i2[b_idx]
    keys, counts = np.unique(codes, return_counts=True)
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
