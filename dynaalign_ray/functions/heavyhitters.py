"""Heavy hitters (top-k frequent tokens) WITHOUT a full-vocabulary shuffle.

The exact top-k-by-count needs a global groupby over every distinct token —
at web scale that is a vocabulary-sized exchange (TF-IDF's df stage pays it
because it needs EVERY term).  Heavy hitters only need the top of the
distribution, so this operator uses the classic two-pass bounded-candidate
design:

1. **Summary pass** (narrow, mergeable): per block, EXACT local counts (one
   Arrow group_by) compressed to the top ``w`` items; the mass a block may
   hide about an absent item is bounded by its (w+1)-th local count
   (``eps_b``).  Partials are w rows + one scalar per block.
2. **Candidate selection** (driver, O(blocks·w)): upper(item) =
   Σ count_present + Σ eps_b over blocks where the item is absent.  Any item
   whose upper bound reaches the k-th best lower bound could be top-k, so
   candidates ⊇ the true top-k — a guarantee, not a heuristic.
3. **Verify pass** (broadcast, map-only): exact counts for candidates only
   (searchsorted membership against the broadcast candidate array), a tiny
   groupby over ≤|candidates| strings, exact top-k by (count desc, token).

Result is EXACT (oracle: plain GROUP BY / ORDER BY / LIMIT) while the wide
pass ships ``blocks × w`` rows instead of the vocabulary.  ``w`` trades
candidate-set size against skew: heavier tails need larger w; the driver
step reports how many candidates the bounds admitted.
"""

from __future__ import annotations

from dynaalign_ray.exec import broadcast_put

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _block_summary(batch: pa.Table, *, w: int) -> pa.Table:
    """Exact local token counts compressed to top-w + the eps bound row."""
    from dynaalign_ray.functions.tfidf import _flat_tokens

    out_schema = pa.schema(
        [("token", pa.string()), ("c", pa.int64()), ("is_eps", pa.int8())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    _, flat = _flat_tokens(batch)
    if len(flat) == 0:
        return out_schema.empty_table()
    g = pa.table({"token": flat}).group_by("token").aggregate([([], "count_all")])
    counts = np.asarray(g.column("count_all")).astype(np.int64)
    order = np.argsort(-counts, kind="stable")
    top = order[:w]
    eps = int(counts[order[w]]) if len(order) > w else 0
    toks = g.column("token").combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.chunk(0)
    return pa.table(
        {
            "token": pa.concat_arrays([toks.take(pa.array(top)), pa.array([""])]),
            "c": pa.array(np.concatenate([counts[top], [eps]]), type=pa.int64()),
            "is_eps": pa.array([0] * len(top) + [1], type=pa.int8()),
        },
        schema=out_schema,
    )


def top_tokens(docs_ds, k: int = 10, w: int = 2000, num_partitions: int = 8):
    """EXACT global top-k tokens by count via the bounded-candidate plan."""
    import functools

    import ray

    from ray.data.aggregate import Sum

    from dynaalign_ray.functions.tfidf import _flat_tokens

    summaries = docs_ds.map_batches(
        functools.partial(_block_summary, w=w),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parts = [t for t in (ray.get(r) for r in summaries.materialize().to_arrow_refs()) if t.num_rows]
    out_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])
    if not parts:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    # --- driver candidate selection over blocks*w narrow rows
    eps_total = 0
    counts: dict[str, int] = {}
    presence_eps: dict[str, int] = {}  # eps mass of blocks where item IS present
    for t in parts:
        toks = t.column("token").to_pylist()
        cs = t.column("c").to_pylist()
        flags = t.column("is_eps").to_pylist()
        eps_b = cs[-1] if flags and flags[-1] == 1 else 0
        eps_total += eps_b
        for tok, c, f in zip(toks, cs, flags):
            if f:
                continue
            counts[tok] = counts.get(tok, 0) + c
            presence_eps[tok] = presence_eps.get(tok, 0) + eps_b
    lowers = sorted(counts.values(), reverse=True)
    kth_lower = lowers[k - 1] if len(lowers) >= k else 0
    if kth_lower <= eps_total:
        # the summaries can't certify that every true top-k item was seen
        # (an item absent from EVERY block top-w can hide up to eps_total
        # mass) — fall back to the exact full-vocabulary groupby.  Happens
        # only when w is far too small for the skew; still exact.
        return _exact_top_tokens(docs_ds, k, num_partitions)
    candidates = sorted(
        tok
        for tok, lo in counts.items()
        if lo + (eps_total - presence_eps[tok]) >= kth_lower
    )
    cand_arr = pa.array(candidates, type=pa.string())
    cand_ref = broadcast_put(cand_arr)

    def exact_candidate_counts(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        if batch.num_rows == 0 or len(cands) == 0:
            return out_schema.empty_table()
        _, flat = _flat_tokens(batch)
        if len(flat) == 0:
            return out_schema.empty_table()
        hits = flat.filter(pc.is_in(flat, value_set=cands))
        if len(hits) == 0:
            return out_schema.empty_table()
        g = pa.table({"token": hits}).group_by("token").aggregate([([], "count_all")])
        return pa.table(
            {
                "token": g.column("token"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            },
            schema=out_schema,
        )

    exact = (
        docs_ds.map_batches(
            exact_candidate_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("token", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    from dynaalign_ray.exec import partial_topk

    # per-block partial top-k over the distinct-token aggregate — no
    # global sort; (n DESC, token ASC) is total after the groupby
    return partial_topk(exact, [("n", "descending"), ("token", "ascending")], k)


def _exact_top_tokens(docs_ds, k: int, num_partitions: int):
    """Fallback: exact full-vocabulary count (the TF-IDF df shape) — the
    plan top_tokens exists to avoid, kept for the w-too-small case."""
    from ray.data.aggregate import Sum

    from dynaalign_ray.functions.tfidf import _flat_tokens

    def block_counts(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        _, flat = _flat_tokens(batch)
        if len(flat) == 0:
            return out_schema.empty_table()
        g = pa.table({"token": flat}).group_by("token").aggregate([([], "count_all")])
        return pa.table(
            {"token": g.column("token"), "n": pc.cast(g.column("count_all"), pa.int64())},
            schema=out_schema,
        )

    exact = (
        docs_ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    from dynaalign_ray.exec import partial_topk

    # per-block partial top-k over the distinct-token aggregate — no
    # global sort; (n DESC, token ASC) is total after the groupby
    return partial_topk(exact, [("n", "descending"), ("token", "ascending")], k)
