"""Ordered funnel + cohort retention (stages/windows.py)."""

import numpy as np
import pyarrow as pa

from dynaalign_ray.stages.windows import (
    cohort_activity_block,
    funnel_stage_block,
)

_HOUR = 3_600_000_000


def _ev_table(rows):
    """rows: (user_id, ts_us, event_type)."""
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _brute_funnel(rows, stages):
    """Per user: t_{i+1} = min ts of stage i+1 with ts >= t_i."""
    users = sorted({r[0] for r in rows})
    out = {}
    for u in users:
        ev = [(t, s) for uu, t, s in rows if uu == u]
        prev = 0
        ts_list, n = [], 0
        for s in stages:
            cand = [t for t, e in ev if e == s and prev is not None and t >= prev]
            t = min(cand) if cand and prev is not None else None
            ts_list.append(t)
            if t is not None:
                n += 1
            prev = t
        out[u] = (n, tuple(ts_list))
    return out


class TestFunnelKernel:
    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(7)
        stages = ("view", "click", "purchase")
        types = ["view", "click", "purchase", "error", "signup"]
        rows = [
            (
                int(rng.integers(0, 12)),
                int(rng.integers(0, 10_000_000)),
                types[int(rng.integers(0, len(types)))],
            )
            for _ in range(400)
        ]
        got = funnel_stage_block(_ev_table(rows), stages=stages)
        want = _brute_funnel(rows, stages)
        assert got.num_rows == len(want)
        for i in range(got.num_rows):
            u = got.column("user_id")[i].as_py()
            n = got.column("funnel_stage")[i].as_py()
            ts = tuple(
                (
                    None
                    if got.column(f"t_{s}")[i].as_py() is None
                    else int(got.column(f"t_{s}")[i].cast(pa.int64()).as_py())
                )
                for s in stages
            )
            assert (n, ts) == want[u], u

    def test_order_matters(self):
        # purchase BEFORE the first view never counts
        rows = [(1, 100, "purchase"), (1, 200, "view"), (2, 100, "view"), (2, 200, "purchase")]
        got = funnel_stage_block(
            _ev_table(rows), stages=("view", "purchase")
        ).to_pydict()
        by_user = dict(zip(got["user_id"], got["funnel_stage"]))
        assert by_user == {1: 1, 2: 2}

    def test_same_timestamp_counts(self):
        # time-based >= rule: same microsecond counts as ordered
        rows = [(1, 100, "view"), (1, 100, "click")]
        got = funnel_stage_block(
            _ev_table(rows), stages=("view", "click")
        ).to_pydict()
        assert got["funnel_stage"] == [2]

    def test_missing_stage_type_in_block(self):
        rows = [(1, 100, "view")]
        got = funnel_stage_block(
            _ev_table(rows), stages=("view", "click", "purchase")
        ).to_pydict()
        assert got["funnel_stage"] == [1]
        assert got["t_click"] == [None] and got["t_purchase"] == [None]


class TestCohortKernel:
    def test_distinct_per_user_hour(self):
        rows = [
            (1, 0, "x"),
            (1, 10, "x"),  # same hour as first -> one (u1, 0)
            (1, 2 * _HOUR + 5, "x"),  # offset 2
            (2, _HOUR, "x"),  # cohort hour 1
            (2, 3 * _HOUR, "x"),  # offset 2
        ]
        t = _ev_table(rows).select(["user_id", "ts"])
        got = cohort_activity_block(t).to_pydict()
        pairs = sorted(
            zip(got["cohort_hour_us"], got["offset_hours"])
        )
        assert pairs == [(0, 0), (0, 2), (_HOUR, 0), (_HOUR, 2)]

    def test_pipeline_counts_users(self, ray_session):
        from dynaalign_ray.pipelines.relational import (
            events_cohort_retention,
        )

        out = events_cohort_retention("/root/testdata/sf0.001").to_pandas()
        # each cohort's offset-0 row counts every user of that cohort
        import duckdb

        want = duckdb.sql(
            """
            SELECT date_trunc('hour', ts) AS cohort, count(*) AS n
            FROM (SELECT user_id, min(ts) AS ts FROM
                  read_parquet('/root/testdata/sf0.001/events.parquet')
                  GROUP BY user_id)
            GROUP BY 1
            """
        ).df()
        zero = out[out["offset_hours"] == 0].set_index("cohort")["n_users"]
        for _, r in want.iterrows():
            assert zero[r["cohort"]] == r["n"]


class TestHourlyAnomaly:
    def test_zscore_laws(self, ray_session):
        from dynaalign_ray.pipelines.relational import events_hourly_anomaly

        out = events_hourly_anomaly("/root/testdata/sf0.001").to_pandas()
        n = out["n"].to_numpy(np.float64)
        z = out["z"].to_numpy(np.float64)
        k = len(n)
        mean, std = n.mean(), n.std(ddof=1)
        # standardization laws (sample rule)
        assert abs(z.mean()) < 1e-9
        assert abs(z.std(ddof=1) - 1.0) < 1e-9
        # extreme hour maps to extreme z
        assert out.loc[out["n"].idxmax(), "z"] == z.max()
        assert k > 1 and std > 0


class TestPreEpochFunnel:
    def test_negative_timestamps_satisfy_first_stage(self):
        # pre-1970 ts must still count for stage 0 (oracle has no lower bound)
        rows = [(1, -5_000_000, "view"), (1, -1_000_000, "click")]
        got = funnel_stage_block(
            _ev_table(rows), stages=("view", "click")
        ).to_pydict()
        assert got["funnel_stage"] == [2]
