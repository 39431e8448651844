"""Event-time windowing over stream-shaped tables (SURVEY.md §2.5: the
reference is batch-only; these are the engine's streaming-shaped operators,
implemented per the Ray model — partition by key, order by ts inside the
group, no watermarks needed for batch tables).

- tumbling windows: pure keyed aggregate on floor(ts / size) (see
  pipelines/relational.events_hourly).
- session windows: hash-partition by key, then ONE vectorized kernel per
  block — lexsort by (user_id, ts), gap scan with np.diff, segment
  boundaries = new-user OR gap — a new session starts when the gap to the
  previous event exceeds ``gap``.  SQL-expressible (lag + cumulative sum),
  so oracle-checked.  (No per-group Python UDF: at 10^8 users a
  ``map_groups`` reducer is one Python call + DataFrame per user; the block
  kernel is O(block) numpy regardless of user count.)
"""

from __future__ import annotations

import numpy as np


def sessionize_block(batch, *, gap_us: int):
    """(user_id, ts) block holding ALL events of its users -> one row per
    session.  Fully vectorized: sort by (user, ts), session starts where the
    user changes or the time gap exceeds gap_us."""
    import pyarrow as pa

    uid = np.asarray(batch.column("user_id")).astype(np.int64)
    ts = np.asarray(batch.column("ts").cast(pa.int64()))
    if len(uid) == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "session_start_us": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
    order = np.lexsort((ts, uid))
    uid, ts = uid[order], ts[order]
    new = np.ones(len(uid), dtype=bool)
    new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(uid)))
    return pa.table(
        {
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "session_start_us": pa.array(ts[starts], type=pa.int64()),
            "n_events": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def user_sessions(events_ds, num_partitions: int, gap_us: int = 1_800_000_000):
    """events(user_id, ts, ...) -> one row per (user_id, session) with
    session_start_us, n_events.  Ordering assumption: none on input; the
    hash repartition colocates each user's events, the block kernel sorts."""
    import functools

    return (
        events_ds.select_columns(["user_id", "ts"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            functools.partial(sessionize_block, gap_us=gap_us),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def sliding_window_counts(
    events_ds, num_partitions: int, size_us: int, step_us: int
):
    """Sliding windows as a flat map over tumbling sub-windows: each event
    contributes to ``size/step`` windows (standard window-explode), then a
    keyed aggregate counts per (window_start, event_type)."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    k = size_us // step_us

    def explode(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts").cast(pa.int64()))
        et = batch.column("event_type")
        base = (ts // step_us) * step_us
        outs_ts, outs_idx = [], []
        for j in range(k):
            w = base - j * step_us
            outs_ts.append(w)
            outs_idx.append(np.arange(len(ts)))
        win = np.concatenate(outs_ts)
        idx = np.concatenate(outs_idx)
        return pa.table(
            {
                "window_start_us": pa.array(win, type=pa.int64()),
                "event_type": et.take(pa.array(idx)),
            }
        )

    return (
        events_ds.select_columns(["ts", "event_type"])
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start_us", "event_type"], num_partitions=num_partitions)
        .aggregate(Count(alias_name="n_events"))
    )
