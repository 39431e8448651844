"""Event-time windowing over stream-shaped tables (SURVEY.md §2.5: the
reference is batch-only; these are the engine's streaming-shaped operators,
implemented per the Ray model — partition by key, order by ts inside the
group, no watermarks needed for batch tables).

- tumbling windows: pure keyed aggregate on floor(ts / size) (see
  pipelines/relational.events_hourly).
- session windows: ``groupby(key).map_groups`` with a sorted gap scan —
  a new session starts when the gap to the previous event exceeds
  ``gap``.  SQL-expressible (lag + cumulative sum), so oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def user_sessions(events_ds, num_partitions: int, gap_us: int = 1_800_000_000):
    """events(user_id, ts, ...) -> one row per (user_id, session) with
    session_start_us, n_events.  Ordering assumption: none on input; each
    group is sorted by ts inside the reducer."""

    def sess(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        ts = g["ts"].astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new)
        starts = ts[new]
        counts = np.bincount(sid)[1:]
        return pd.DataFrame(
            {
                "user_id": np.full(len(starts), g["user_id"].iloc[0], dtype=np.int64),
                "session_start_us": starts,
                "n_events": counts.astype(np.int64),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .groupby("user_id", num_partitions=num_partitions)
        .map_groups(sess, batch_format="pandas")
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
