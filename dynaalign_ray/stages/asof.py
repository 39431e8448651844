"""Distributed as-of join — for each left row (key, ts) find the greatest
right ts' <= ts with the same key (the "latest state at event time" lookup:
event -> most recent order, tick -> last quote).  Ray Data has no asof join;
the reference has no joins at all (SURVEY.md §2.5) — this is an engine
addition from the build brief's custom-operator list.

Physical plan (one shuffle, no sort-merge of the full tables):

1. both sides map to one narrow aligned schema
   (key int64, t int64 us, side int8, left payload cols null on the right),
2. union + hash repartition by key — every key is wholly local,
3. per block: ONE lexsort by (key, t, side) with right rows before left
   rows at equal (key, t) (ties are inclusive: a left row at exactly ts'
   matches it), then a segmented cummax of right-ts (pandas C groupby
   cummax — numpy has no segmented scan) gives every left row its match.

Equal-(key, ts') right-row ties collapse to the timestamp itself, so the
output (left cols + asof_ts_us) is deterministic even when the right table
has duplicate timestamps per key; payload columns from the right side are
deliberately NOT emitted (an arbitrary tie row would be nondeterministic —
the caller joins back on (key, asof_ts_us) with an explicit tie rule if it
needs payloads).

Scale: the shuffle carries key + ts + left payload once — no broadcast, no
driver materialization; skewed keys cost one block's lexsort (O(n log n) in
C), same profile as the other keyed-repartition kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_K, _T, _SIDE = "__asof_k", "__asof_t", "__asof_side"


def _ts_int64(col: pa.ChunkedArray) -> pa.ChunkedArray:
    # timestamp[us] -> epoch microseconds; int64 passes through
    return col.cast(pa.int64())


def asof_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    num_partitions: int,
):
    """left rows + ``asof_ts_us`` (greatest right ts <= left ts per key);
    left rows with no qualifying right row are dropped (inner asof).

    ``left_cols`` are the left columns to carry through (key/ts included
    only if listed)."""

    def widen_left(batch: pa.Table) -> pa.Table:
        cols = {
            _K: batch.column(left_on).cast(pa.int64()),
            _T: _ts_int64(batch.column(left_ts)),
            _SIDE: pa.array(np.ones(batch.num_rows, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def make_widen_right(schema: pa.Schema):
        def widen_right(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                _K: batch.column(right_on).cast(pa.int64()),
                _T: _ts_int64(batch.column(right_ts)),
                _SIDE: pa.array(np.zeros(n, dtype=np.int8)),
            }
            for f in schema:
                if f.name not in (_K, _T, _SIDE):
                    cols[f.name] = pa.nulls(n, type=f.type)
            return pa.table(cols)

        return widen_right

    lschema = left_ds.schema().base_schema  # parquet metadata, no execution
    left_schema = pa.schema(
        [
            pa.field(_K, pa.int64()),
            pa.field(_T, pa.int64()),
            pa.field(_SIDE, pa.int8()),
        ]
        + [pa.field(c, lschema.field(c).type) for c in left_cols]
    )
    lt = left_ds.map_batches(
        widen_left, batch_format="pyarrow", zero_copy_batch=True
    )
    rt = right_ds.map_batches(
        make_widen_right(left_schema),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def asof_block(b: pa.Table) -> pa.Table:
        import pandas as pd

        k = np.asarray(b.column(_K)).astype(np.int64)
        out_schema = pa.schema(
            [pa.field(c, left_schema.field(c).type) for c in left_cols]
            + [pa.field("asof_ts_us", pa.int64())]
        )
        if len(k) == 0:
            return out_schema.empty_table()
        t = np.asarray(b.column(_T)).astype(np.int64)
        side = np.asarray(b.column(_SIDE)).astype(np.int8)
        order = np.lexsort((side, t, k))  # right(0) before left(1) at ties
        ks, ts, ss = k[order], t[order], side[order]
        right_t = np.where(ss == 0, ts, np.int64(np.iinfo(np.int64).min))
        # segmented cummax per key: greatest right ts seen so far in the key
        match = (
            pd.Series(right_t).groupby(pd.Series(ks), sort=False).cummax().to_numpy()
        )
        is_left = ss == 1
        matched = is_left & (match > np.iinfo(np.int64).min)
        take_idx = order[np.flatnonzero(matched)]
        out = {c: b.column(c).take(pa.array(take_idx)) for c in left_cols}
        out["asof_ts_us"] = pa.array(match[matched], type=pa.int64())
        return pa.table(out, schema=out_schema)

    return (
        lt.union(rt)
        .repartition(num_blocks=num_partitions, keys=[_K])
        .map_batches(
            asof_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )
