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


def _user_order_block(batch, cols: tuple[str, ...]):
    """Common prologue for the ordered-sequence kernels: pull (user_id, ts,
    event_id [, extra]) out of an Arrow block as numpy, lexsort by
    (user_id, ts, event_id) — event_id is unique, so the order is total and
    matches ``ORDER BY ts, event_id`` inside each user partition."""
    import pyarrow as pa

    uid = np.asarray(batch.column("user_id")).astype(np.int64)
    ts = np.asarray(batch.column("ts").cast(pa.int64()))
    eid = np.asarray(batch.column("event_id")).astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    extra = [np.asarray(batch.column(c)) for c in cols]
    return (
        uid[order],
        ts[order],
        eid[order],
        [e[order] for e in extra],
    )


def _segment_starts(uid: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new user's run begins in a user-sorted
    array (exact int64 comparison; routing hash never enters correctness)."""
    new = np.ones(len(uid), dtype=bool)
    new[1:] = uid[1:] != uid[:-1]
    return new


def lag_delta_block(batch):
    """LAG analog: per event, microseconds since the user's previous event
    (-1 for the user's first event).  One vectorized pass per block."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("delta_us", pa.int64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid, ts, eid, _ = _user_order_block(batch, ())
    delta = np.empty(len(ts), dtype=np.int64)
    delta[0] = -1
    delta[1:] = ts[1:] - ts[:-1]
    delta[_segment_starts(uid)] = -1
    return pa.table(
        {"event_id": eid, "user_id": uid, "ts_us": ts, "delta_us": delta},
        schema=out_schema,
    )


def median_gap_block(batch):
    """Exact per-user MEDIAN inter-event gap (the per-group exact-quantile
    plan shape): deltas within user runs, one re-lexsort by (user, delta),
    then the two middle elements per segment gathered vectorized — DuckDB
    median semantics (even counts interpolate).  Users with a single event
    contribute no gaps and are absent from the output, like the SQL's
    ``WHERE delta IS NOT NULL``."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("median_gap_us", pa.float64()),
            ("n_gaps", pa.int64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid, ts, _eid, _ = _user_order_block(batch, ())
    same_user = ~_segment_starts(uid)[1:]
    du = uid[1:][same_user]
    dv = (ts[1:] - ts[:-1])[same_user]
    if len(du) == 0:
        return out_schema.empty_table()
    order = np.lexsort((dv, du))
    du, dv = du[order], dv[order]
    starts = np.flatnonzero(_segment_starts(du))
    counts = np.diff(np.append(starts, len(du)))
    lo = starts + (counts - 1) // 2
    hi = starts + counts // 2
    med = (dv[lo].astype(np.float64) + dv[hi].astype(np.float64)) / 2.0
    return pa.table(
        {
            "user_id": pa.array(du[starts], type=pa.int64()),
            "median_gap_us": pa.array(med, type=pa.float64()),
            "n_gaps": pa.array(counts, type=pa.int64()),
        },
        schema=out_schema,
    )


def running_totals_block(batch):
    """Running window aggregate (SUM ... ROWS UNBOUNDED PRECEDING analog):
    per event, the user's cumulative value-in-cents and running row number.
    Cents (rint(value*100) as int64) make the running sum exact integer
    arithmetic — associative, so the global-cumsum-minus-segment-offset
    trick is bit-exact, unlike a float cumsum whose addition order matters."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("run_cents", pa.int64()),
            ("run_n", pa.int64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid, ts, eid, (val,) = _user_order_block(batch, ("value",))
    x = np.asarray(val, dtype=np.float64) * 100.0
    # half-away-from-zero, matching SQL round() (np.rint is half-to-even)
    cents = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    csum = np.cumsum(cents)
    pos = np.arange(len(uid), dtype=np.int64)
    new = _segment_starts(uid)
    group_start = np.maximum.accumulate(np.where(new, pos, 0))
    # cumulative sum *before* each segment start, broadcast down the segment
    offset = np.where(group_start > 0, csum[group_start - 1], 0)
    run_cents = csum - offset
    run_n = pos - group_start + 1
    return pa.table(
        {"event_id": eid, "user_id": uid, "run_cents": run_cents, "run_n": run_n},
        schema=out_schema,
    )


def user_lag_deltas(events_ds, num_partitions: int):
    """events(event_id, user_id, ts) -> per-event lag delta.  Plan: ONE keyed
    repartition on user_id (each user's events co-located), then one
    vectorized kernel per block — O(block log block), no per-group Python,
    shuffle carries three int64 columns."""
    return (
        events_ds.select_columns(["event_id", "user_id", "ts"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            lag_delta_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def user_median_gaps(events_ds, num_partitions: int):
    """events(event_id, user_id, ts) -> per-user exact median inter-event
    gap (same one-keyed-repartition plan as user_lag_deltas; correctness
    needs each user whole in one block, which the keyed repartition
    guarantees)."""
    return (
        events_ds.select_columns(["event_id", "user_id", "ts"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            median_gap_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def user_running_totals(events_ds, num_partitions: int):
    """events(event_id, user_id, ts, value) -> per-event running totals
    (same plan shape as user_lag_deltas; one extra float column shuffled)."""
    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            running_totals_block,
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


def trailing_window_block(batch, *, window_us: int):
    """RANGE-interval trailing window (SUM/COUNT OVER RANGE <window>
    PRECEDING AND CURRENT ROW analog), fully vectorized across users.

    After the (user_id, ts, event_id) lexsort, a composite key
    ``rank(user)*K + (ts - ts_min)`` with ``K > ts_span + window_us`` makes
    one GLOBAL pair of searchsorted calls respect per-user segment
    boundaries: ``key_i - window_us`` can never cross below the previous
    user's key range, so frame starts/ends never leak across users.  Frame
    end uses side="right" on the key itself — RANGE frames include ALL
    peers of the current row (equal ts), exactly like SQL.  Sums are exact
    integer cents (prefix-sum difference, associative)."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("trail_cents", pa.int64()),
            ("trail_n", pa.int64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid, ts, eid, (val,) = _user_order_block(batch, ("value",))
    x = np.asarray(val, dtype=np.float64) * 100.0
    cents = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    new = _segment_starts(uid)
    rank = np.cumsum(new) - 1
    ts_off = ts - ts.min()
    stride = int(ts_off.max()) + int(window_us) + 2
    if (int(rank[-1]) + 1) * stride >= 1 << 62:
        raise NotImplementedError(
            "composite window key would overflow int63; use a LARGER "
            "num_partitions in the keyed repartition (smaller blocks -> fewer "
            "users per block -> smaller rank*stride key) or bucket time"
        )
    key = rank * stride + ts_off
    start = np.searchsorted(key, key - int(window_us), side="left")
    end = np.searchsorted(key, key, side="right")
    prefix = np.zeros(len(cents) + 1, dtype=np.int64)
    np.cumsum(cents, out=prefix[1:])
    return pa.table(
        {
            "event_id": eid,
            "user_id": uid,
            "trail_cents": prefix[end] - prefix[start],
            "trail_n": end - start,
        },
        schema=out_schema,
    )


_TS_INF = np.iinfo(np.int64).max


def funnel_stage_block(batch, *, stages: tuple[str, ...]):
    """Ordered-funnel analog (the product-analytics "view -> click ->
    purchase" query): per user, the earliest timestamp of stage i+1 at or
    after the user's earliest completion of stage i; funnel_stage = number
    of stages completed in order.  Time-based (``>=`` on ts): two events
    sharing a microsecond count as ordered either way, so the result never
    depends on intra-timestamp tie order — exactly reproducible in SQL.

    Vectorized per block: one sort by (user, ts), then one masked
    ``np.minimum.reduceat`` per funnel stage (missing -> int64 max
    sentinel, emitted as NULL)."""
    import pyarrow as pa

    fields = [("user_id", pa.int64()), ("funnel_stage", pa.int64())]
    fields += [(f"t_{s}", pa.timestamp("us")) for s in stages]
    out_schema = pa.schema(fields)
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid = np.asarray(batch.column("user_id")).astype(np.int64)
    ts = np.asarray(batch.column("ts").cast(pa.int64()))
    # dictionary-encode once; compare int codes, never strings, in the loop
    et = batch.column("event_type").combine_chunks()
    if isinstance(et, pa.ChunkedArray):
        et = et.chunk(0) if et.num_chunks else pa.array([], pa.string())
    enc = et.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dictionary = enc.dictionary.to_pylist()
    stage_code = {s: dictionary.index(s) if s in dictionary else -1 for s in stages}
    order = np.lexsort((ts, uid))
    uid, ts, codes = uid[order], ts[order], codes[order]
    new = _segment_starts(uid)
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new) - 1
    # stage-0 lower bound: -inf (int64 min), NOT epoch 0 — pre-1970
    # timestamps must still satisfy the first stage, as in the SQL oracle
    prev = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
    cols: dict = {"user_id": pa.array(uid[starts], type=pa.int64())}
    stage_count = np.zeros(len(starts), dtype=np.int64)
    t_cols = []
    for s in stages:
        cand = np.where(
            (codes == stage_code[s]) & (ts >= prev[gidx]), ts, _TS_INF
        )
        t_s = np.minimum.reduceat(cand, starts)
        stage_count += (t_s != _TS_INF).astype(np.int64)
        t_cols.append(t_s)
        prev = t_s
    cols["funnel_stage"] = pa.array(stage_count, type=pa.int64())
    for s, t_s in zip(stages, t_cols):
        cols[f"t_{s}"] = pa.array(
            np.where(t_s == _TS_INF, 0, t_s),
            type=pa.int64(),
            mask=(t_s == _TS_INF),
        ).cast(pa.timestamp("us"))
    return pa.table(cols, schema=out_schema)


def user_funnel(
    events_ds,
    num_partitions: int,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
):
    """events(user_id, ts, event_type) -> one row per user with the ordered
    funnel stage reached and per-stage completion timestamps.  Plan: ONE
    keyed repartition on user_id, one vectorized kernel per block."""
    import functools

    return (
        events_ds.select_columns(["user_id", "ts", "event_type"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            functools.partial(funnel_stage_block, stages=stages),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def ntile_block(batch, *, n_tiles: int):
    """NTILE(n) OVER (PARTITION BY user_id ORDER BY value, event_id) —
    SQL's rule exactly: with g rows and r = g mod n, the first r tiles get
    ceil(g/n) rows, the rest floor(g/n).  Vectorized: one lexsort, then a
    closed-form tile index per in-group position."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("tile", pa.int64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid = np.asarray(batch.column("user_id")).astype(np.int64)
    eid = np.asarray(batch.column("event_id")).astype(np.int64)
    val = np.asarray(batch.column("value"), dtype=np.float64)
    order = np.lexsort((eid, val, uid))
    uid, eid = uid[order], eid[order]
    new = _segment_starts(uid)
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new) - 1
    g = np.diff(np.append(starts, len(uid)))  # group sizes
    q, r = g // n_tiles, g % n_tiles
    pos = np.arange(len(uid), dtype=np.int64) - starts[gidx]
    qg, rg = q[gidx], r[gidx]
    big = rg * (qg + 1)  # rows covered by the ceil-sized tiles
    in_big = pos < big
    # guard the qg==0 division (all rows are then in the big tiles)
    qg_safe = np.maximum(qg, 1)
    tile = np.where(
        in_big,
        pos // np.maximum(qg + 1, 1) + 1,
        rg + (pos - big) // qg_safe + 1,
    )
    return pa.table(
        {"event_id": eid, "user_id": uid, "tile": tile.astype(np.int64)},
        schema=out_schema,
    )


def percent_rank_block(batch):
    """percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id):
    (rank - 1) / (n - 1), 0.0 for singleton partitions — the tiebreaker
    makes the order total, so rank == in-group position + 1 exactly as the
    SQL computes it."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("pr", pa.float64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid = np.asarray(batch.column("user_id")).astype(np.int64)
    eid = np.asarray(batch.column("event_id")).astype(np.int64)
    val = np.asarray(batch.column("value"), dtype=np.float64)
    order = np.lexsort((eid, val, uid))
    uid, eid = uid[order], eid[order]
    new = _segment_starts(uid)
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new) - 1
    g = np.diff(np.append(starts, len(uid)))
    pos = np.arange(len(uid), dtype=np.int64) - starts[gidx]
    denom = np.maximum(g[gidx] - 1, 1).astype(np.float64)
    pr = pos.astype(np.float64) / denom  # singleton: pos 0 -> 0.0
    return pa.table(
        {"event_id": eid, "user_id": uid, "pr": pa.array(pr, pa.float64())},
        schema=out_schema,
    )


def user_value_percent_rank(events_ds, num_partitions: int):
    """Same one-keyed-repartition plan as the other per-user windows."""
    return (
        events_ds.select_columns(["event_id", "user_id", "value"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            percent_rank_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def user_value_ntiles(events_ds, num_partitions: int, n_tiles: int = 4):
    """events(event_id, user_id, value) -> per-event NTILE bucket within
    the user's value order.  Same ONE-keyed-repartition plan as the other
    per-user windows."""
    import functools

    return (
        events_ds.select_columns(["event_id", "user_id", "value"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            functools.partial(ntile_block, n_tiles=n_tiles),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


_HOUR_US = 3_600_000_000


def cohort_activity_block(batch):
    """Cohort-retention pre-aggregate: each user's cohort is the hour of
    their first event (floor is monotone, so hour(min ts) == min hour);
    emit ONE row per distinct (user, offset_hours) as (cohort_hour_us,
    offset_hours) — the block holds ALL of a user's events after the keyed
    repartition, so per-block dedup is globally complete and the downstream
    groupby-count counts users exactly."""
    import pyarrow as pa

    out_schema = pa.schema(
        [("cohort_hour_us", pa.int64()), ("offset_hours", pa.int64())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid = np.asarray(batch.column("user_id")).astype(np.int64)
    ts = np.asarray(batch.column("ts").cast(pa.int64()))
    order = np.lexsort((ts, uid))
    uid, ts = uid[order], ts[order]
    hour = ts // _HOUR_US
    new = _segment_starts(uid)
    starts = np.flatnonzero(new)
    gidx = np.cumsum(new) - 1
    cohort = np.minimum.reduceat(hour, starts)  # == hour of first event
    offset = hour - cohort[gidx]
    pairs = np.unique(np.stack([gidx, offset], axis=1), axis=0)
    return pa.table(
        {
            "cohort_hour_us": pa.array(
                cohort[pairs[:, 0]] * _HOUR_US, type=pa.int64()
            ),
            "offset_hours": pa.array(pairs[:, 1], type=pa.int64()),
        },
        schema=out_schema,
    )


def cohort_retention(events_ds, num_partitions: int):
    """events(user_id, ts) -> (cohort, offset_hours, n_users): how many
    users whose first event fell in ``cohort`` were active ``offset_hours``
    hours later.  Plan: keyed repartition by user -> per-block distinct
    (user, offset) emission -> small groupby-count over (cohort, offset) —
    the shuffle after the kernel carries one row per (user, active-hour),
    never the raw events."""
    import functools

    import pyarrow as pa
    from ray.data.aggregate import Count

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort": b.column("cohort_hour_us").cast(pa.timestamp("us")),
                "offset_hours": b.column("offset_hours"),
                "n_users": b.column("n_users"),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            cohort_activity_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["cohort_hour_us", "offset_hours"], num_partitions=num_partitions)
        .aggregate(Count(alias_name="n_users"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def user_trailing_window(events_ds, num_partitions: int, window_us: int = 3_600_000_000):
    """events(event_id, user_id, ts, value) -> per-event trailing-interval
    SUM/COUNT.  Same ONE-keyed-repartition + one-vectorized-kernel plan as
    the other ordered-sequence windows; shuffle carries four narrow columns."""
    import functools

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            functools.partial(trailing_window_block, window_us=window_us),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def transition_count_block(batch):
    """Markov-transition kernel: within each user's (ts, event_id)-ordered
    event sequence, count consecutive event-type bigrams (prev_type ->
    event_type), pre-aggregated per block BEFORE the global shuffle so the
    exchange carries at most |types|^2 rows per block regardless of block
    size — the partial-aggregate pattern from the scale playbook."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("prev_type", pa.string()),
            ("event_type", pa.string()),
            ("n", pa.int64()),
        ]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    uid, _ts, _eid, (etype,) = _user_order_block(batch, ("event_type",))
    # pairs (i-1, i) within the same user run
    same = ~_segment_starts(uid)
    prev = etype[:-1][same[1:]]
    cur = etype[1:][same[1:]]
    if len(cur) == 0:
        return out_schema.empty_table()
    pairs = pa.table(
        {
            "prev_type": pa.array(prev, type=pa.string()),
            "event_type": pa.array(cur, type=pa.string()),
        }
    )
    part = pairs.group_by(["prev_type", "event_type"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "prev_type": part.column("prev_type"),
            "event_type": part.column("event_type"),
            "n": part.column("count_all").cast(pa.int64()),
        },
        schema=out_schema,
    )


def user_transition_counts(events_ds, num_partitions: int):
    """events(event_id, user_id, ts, event_type) -> global counts of
    consecutive event-type transitions across all users (per-user order =
    ORDER BY ts, event_id).  Plan: one keyed repartition on user_id, one
    vectorized bigram kernel with per-block partial aggregation, then a
    tiny global groupby-sum over at most |types|^2 rows per block."""
    from ray.data.aggregate import Sum

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "event_type"])
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(
            transition_count_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["prev_type", "event_type"], num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n_transitions"))
    )
