"""Distributed range (interval) join — for each left row (key, t0) count the
right rows with the same key whose timestamp falls in the half-open window
[t0, t0 + window).  The "events within N days of the order" / "impressions
within the session window" lookup.  Ray Data has no range join and the
reference has no joins at all (SURVEY.md §2.5; its inputs are peptide
strings, R/minHash.R:206) — this is an engine addition from the build
brief's custom-operator list, sibling of stages/asof.py.

Physical plan (ONE shuffle, no pair blow-up):

1. both sides map to one narrow aligned schema
   (key int64, t int64 us, side int8, left payload cols null on the right),
2. union + hash repartition by key — every key is wholly local,
3. per block: ONE lexsort of the RIGHT rows by (key, t), then every left
   row's count is a pair of vectorized binary searches.  Keys and
   timestamps are rank-encoded into one composite int64
   (key_rank * (n_distinct_ts + 1) + ts_rank), so the lexicographic search
   is a single ``np.searchsorted`` over a sorted int64 array — no per-key
   Python loop, no composite overflow (both ranks are bounded by the block
   row count, far below 2^31).

Output = left payload cols + ``<count_col>`` (int64, >= 0; left rows with
no qualifying right row are KEPT with count 0 — left-outer semantics, so
the result is a total function of the left table).

Scale: the shuffle carries key + ts + left payload once.  A pair-emitting
range join is deliberately NOT the primitive (at 10^12 rows a hot key's
window pairs are quadratic); callers that need pairs filter a bounded
window first or aggregate like this.  Skewed keys cost one block's
O(n log n) C sort, the same profile as stages/asof.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_K, _T, _SIDE = "__rj_k", "__rj_t", "__rj_side"


def _ts_int64(col: pa.ChunkedArray) -> pa.ChunkedArray:
    # timestamp[us] -> epoch microseconds; int64 passes through
    return col.cast(pa.int64())


def range_count_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
    left_cols: list[str],
    count_col: str = "n_in_window",
    num_partitions: int = 8,
    collapse_left: bool = False,
    ts_out: str = "t_us",
    left_count_col: str = "n_rows",
):
    """left rows + count of right rows with equal key and
    right_ts in [left_ts, left_ts + window_us).

    ``collapse_left=True``: tables without a unique row key get one output
    row per DISTINCT left (key, ts) pair instead — columns
    (left_on, ts_out, left_count_col, count_col) where left_count_col is
    how many left rows collapsed into the pair.  The count is a pure
    function of (key, ts), so collapsing loses nothing; the dedup happens
    inside the keyed block (pairs of one key are already co-located) — no
    extra shuffle.  ``left_cols`` must be empty in this mode."""
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    if collapse_left and left_cols:
        raise ValueError("collapse_left emits (key, ts) pairs; left_cols must be []")

    def widen_left(batch: pa.Table) -> pa.Table:
        cols = {
            _K: batch.column(left_on).cast(pa.int64()),
            _T: _ts_int64(batch.column(left_ts)),
            _SIDE: pa.array(np.ones(batch.num_rows, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    lschema = left_ds.schema().base_schema  # parquet metadata, no execution
    left_schema = pa.schema(
        [
            pa.field(_K, pa.int64()),
            pa.field(_T, pa.int64()),
            pa.field(_SIDE, pa.int8()),
        ]
        + [pa.field(c, lschema.field(c).type) for c in left_cols]
    )

    def widen_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            _K: batch.column(right_on).cast(pa.int64()),
            _T: _ts_int64(batch.column(right_ts)),
            _SIDE: pa.array(np.zeros(n, dtype=np.int8)),
        }
        for f in left_schema:
            if f.name not in (_K, _T, _SIDE):
                cols[f.name] = pa.nulls(n, type=f.type)
        return pa.table(cols)

    if collapse_left:
        out_schema = pa.schema(
            [
                pa.field(left_on, pa.int64()),
                pa.field(ts_out, pa.int64()),
                pa.field(left_count_col, pa.int64()),
                pa.field(count_col, pa.int64()),
            ]
        )
    else:
        out_schema = pa.schema(
            [pa.field(c, left_schema.field(c).type) for c in left_cols]
            + [pa.field(count_col, pa.int64())]
        )

    def count_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        k = np.asarray(b.column(_K)).astype(np.int64)
        t = np.asarray(b.column(_T)).astype(np.int64)
        side = np.asarray(b.column(_SIDE)).astype(np.int8)
        is_left = side == 1
        lk, lt = k[is_left], t[is_left]
        rk, rt = k[~is_left], t[~is_left]
        left_rows = np.flatnonzero(is_left)
        if len(lk) == 0:
            return out_schema.empty_table()
        n_rows = None
        if collapse_left:
            order = np.lexsort((lt, lk))
            lk2, lt2 = lk[order], lt[order]
            new = np.ones(len(lk2), dtype=bool)
            new[1:] = (lk2[1:] != lk2[:-1]) | (lt2[1:] != lt2[:-1])
            starts = np.flatnonzero(new)
            n_rows = np.diff(np.append(starts, len(lk2))).astype(np.int64)
            lk, lt = lk2[starts], lt2[starts]
        if len(rk) == 0:
            counts = np.zeros(len(lk), dtype=np.int64)
        else:
            # rank-encode: counts depend only on ORDER, so dense ranks of the
            # union of values preserve every comparison while keeping the
            # composite key far below 2^63.  Window bounds must rank through
            # the same vocabulary (searchsorted, not exact lookup).
            ku = np.unique(np.concatenate([rk, lk]))
            tu = np.unique(rt)
            m = np.int64(len(tu) + 1)
            rc = np.searchsorted(ku, rk).astype(np.int64) * m + np.searchsorted(
                tu, rt
            ).astype(np.int64)
            rc.sort()
            lkr = np.searchsorted(ku, lk).astype(np.int64) * m
            lo = lkr + np.searchsorted(tu, lt, side="left").astype(np.int64)
            hi = lkr + np.searchsorted(tu, lt + np.int64(window_us), side="left").astype(
                np.int64
            )
            counts = np.searchsorted(rc, hi, side="left") - np.searchsorted(
                rc, lo, side="left"
            )
        if collapse_left:
            return pa.table(
                {
                    left_on: pa.array(lk, type=pa.int64()),
                    ts_out: pa.array(lt, type=pa.int64()),
                    left_count_col: pa.array(n_rows, type=pa.int64()),
                    count_col: pa.array(counts.astype(np.int64), type=pa.int64()),
                },
                schema=out_schema,
            )
        out = {
            c: b.column(c).take(pa.array(left_rows)) for c in left_cols
        }
        out[count_col] = pa.array(counts.astype(np.int64), type=pa.int64())
        return pa.table(out, schema=out_schema)

    lt_ds = left_ds.map_batches(
        widen_left, batch_format="pyarrow", zero_copy_batch=True
    )
    rt_ds = right_ds.map_batches(
        widen_right, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        lt_ds.union(rt_ds)
        .repartition(num_blocks=num_partitions, keys=[_K])
        .map_batches(
            count_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )
