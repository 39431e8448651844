"""Ordered-sequence window operators (round-2 continuation): LAG deltas,
running totals, partition-share, and the ROLLUP grouping-set aggregate —
known-answer kernel tests plus DuckDB parity on the driver testdata.

The kernels are plain functions over Arrow blocks, so the known-answer
tests need no Ray; the parity tests reuse the shared ray_session fixture.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _ev_table(rows):
    eid, uid, ts, val = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        }
    )


class TestLagDeltaBlock:
    def test_known_answer(self):
        from dynaalign_ray.stages.windows import lag_delta_block

        t = _ev_table(
            [
                # user 1: ts 100, 250, 250 (tie broken by event_id)
                (3, 1, 250, 0.0),
                (1, 1, 100, 0.0),
                (2, 1, 250, 0.0),
                # user 2: single event
                (4, 2, 500, 0.0),
            ]
        )
        out = lag_delta_block(t.select(["event_id", "user_id", "ts"]))
        got = dict(zip(out.column("event_id").to_pylist(), out.column("delta_us").to_pylist()))
        assert got == {1: -1, 2: 150, 3: 0, 4: -1}

    def test_empty(self):
        from dynaalign_ray.stages.windows import lag_delta_block

        out = lag_delta_block(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                }
            )
        )
        assert out.num_rows == 0
        assert out.schema.names == ["event_id", "user_id", "ts_us", "delta_us"]


class TestMedianGapBlock:
    def test_known_answer_interpolation_and_singletons(self):
        from dynaalign_ray.stages.windows import median_gap_block

        t = _ev_table(
            [
                # user 1: ts 100, 200, 500, 600 -> gaps 100, 300, 100;
                # odd count -> middle = 100
                (1, 1, 100, 0.0),
                (2, 1, 200, 0.0),
                (3, 1, 500, 0.0),
                (4, 1, 600, 0.0),
                # user 2: ts 0, 10, 40 -> gaps 10, 30; even -> (10+30)/2
                (5, 2, 0, 0.0),
                (6, 2, 10, 0.0),
                (7, 2, 40, 0.0),
                # user 3: single event -> no gaps, absent from output
                (8, 3, 999, 0.0),
            ]
        )
        out = median_gap_block(t.select(["event_id", "user_id", "ts"]))
        rows = {
            r["user_id"]: (r["median_gap_us"], r["n_gaps"])
            for r in out.to_pylist()
        }
        assert rows == {1: (100.0, 3), 2: (20.0, 2)}

    def test_empty(self):
        from dynaalign_ray.stages.windows import median_gap_block

        out = median_gap_block(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                }
            )
        )
        assert out.num_rows == 0
        assert out.schema.names == ["user_id", "median_gap_us", "n_gaps"]


class TestRunningTotalsBlock:
    def test_known_answer_and_segment_reset(self):
        from dynaalign_ray.stages.windows import running_totals_block

        t = _ev_table(
            [
                # 0.125 * 100 = 12.5 exactly: half-AWAY rounding -> 13
                # (np.rint's half-to-even would give 12 — this pins the
                # SQL round() convention)
                (1, 1, 100, 0.125),
                (2, 1, 200, 2.0),     # +200 -> 213
                (3, 2, 50, -0.125),   # -13, new user resets
                (4, 2, 60, 3.0),      # 287
            ]
        )
        out = running_totals_block(t)
        got = {
            e: (c, n)
            for e, c, n in zip(
                out.column("event_id").to_pylist(),
                out.column("run_cents").to_pylist(),
                out.column("run_n").to_pylist(),
            )
        }
        assert got == {1: (13, 1), 2: (213, 2), 3: (-13, 1), 4: (287, 2)}

    def test_offset_trick_matches_per_segment_loop(self):
        """Global-cumsum-minus-offset must equal a per-segment cumsum for
        arbitrary segment layouts (exact ints, so this is an identity)."""
        from dynaalign_ray.stages.windows import running_totals_block

        rng = np.random.default_rng(7)
        n = 500
        uid = np.sort(rng.integers(0, 40, n))
        rows = [
            (i, int(uid[i]), int(i * 10), float(rng.normal() * 100)) for i in range(n)
        ]
        out = running_totals_block(_ev_table(rows))
        eid = np.array(out.column("event_id").to_pylist())
        run = np.array(out.column("run_cents").to_pylist())
        # python reference
        by_user = {}
        want = {}
        for i in range(n):
            e, u, _, v = rows[i]
            x = v * 100.0
            c = int(np.sign(x) * np.floor(abs(x) + 0.5))
            by_user[u] = by_user.get(u, 0) + c
            want[e] = by_user[u]
        assert {int(e): int(r) for e, r in zip(eid, run)} == want


class TestDuckDBParity:
    @pytest.mark.parametrize(
        "qname",
        [
            "events_user_deltas",
            "events_user_running",
            "lineitem_order_share",
            "orders_rollup",
        ],
    )
    def test_sf0001(self, ray_session, qname):
        """Sort by ALL columns (the driver's value-hash does the same):
        (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem,
        so per-row outputs only compare as multisets."""
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        def canon(df):
            df = df.reindex(sorted(df.columns), axis=1)
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        got = canon(entry.queries()[qname]("/root/testdata/sf0.001").to_pandas())
        con = duckdb.connect()
        for t in ("events", "orders", "lineitem"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
            )
        want = canon(con.sql(entry.oracle_sql()[qname]).df())
        assert len(got) == len(want) > 0
        assert list(got.columns) == list(want.columns)
        for c in got.columns:
            assert got[c].tolist() == want[c].tolist(), c


class TestTrailingWindow:
    def test_range_frame_semantics(self, ray_session):
        """Boundary row (exactly window_us older) and ts-peers (including
        later-sorted peers of the current row) are all inside the frame —
        SQL RANGE semantics, not ROWS."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.stages.windows import trailing_window_block

        W = 3_600_000_000
        t0 = 1_700_000_000_000_000
        # user 7: boundary hit at exactly -W; user 9: three ts-peers
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 10, 11, 12], pa.int64()),
                "user_id": pa.array([7, 7, 7, 9, 9, 9], pa.int64()),
                "ts": pa.array(
                    np.array([t0 - W, t0, t0 + 1, t0, t0, t0]), pa.timestamp("us")
                ),
                "value": pa.array([1.0, 2.0, 4.0, 1.0, 2.0, 4.0], pa.float64()),
            }
        )
        out = {
            r["event_id"]: (r["trail_cents"], r["trail_n"])
            for r in trailing_window_block(tbl, window_us=W).to_pylist()
        }
        assert out[1] == (100, 1)
        assert out[2] == (300, 2)  # boundary row at exactly -W included
        assert out[3] == (600, 2)  # event 1 now outside (t0+1 - W > t0 - W)
        # all three peers share the full peer frame (RANGE, not ROWS)
        assert out[10] == out[11] == out[12] == (700, 3)

    def test_matches_duckdb(self, ray_session):
        import duckdb

        from dynaalign_ray.pipelines.relational import events_trailing_hour

        sf = "/root/testdata/sf0.001"
        got = {
            r["event_id"]: (r["trail_cents"], r["trail_n"])
            for r in events_trailing_hour(sf, num_partitions=4).take_all()
        }
        want = {
            e: (c, n)
            for e, c, n in duckdb.sql(
                f"""
                SELECT event_id,
                       sum(CAST(round(value * 100) AS BIGINT)) OVER w,
                       count(*) OVER w
                FROM '{sf}/events.parquet'
                WINDOW w AS (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                """
            ).fetchall()
        }
        assert got == want


class TestSourceQuantiles:
    def test_singleton_and_tiny_groups(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dynaalign_ray.pipelines.curation import doc_source_quantiles

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "source": pa.array(["solo", "duo", "duo", "duo"]),
                    "n_chars": pa.array([42, 10, 20, 30], pa.int64()),
                    "text": pa.array(["x"] * 4),
                    "lang": pa.array(["en"] * 4),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = {
            (r["source"], r["q"]): r["n_chars"]
            for r in doc_source_quantiles(str(tmp_path), num_partitions=2).take_all()
        }
        assert all(got[("solo", q)] == 42 for q in (0.25, 0.5, 0.75, 0.9))
        # n=3, rank = max(0, ceil(q*3)-1): 0.25->0, 0.5->1, 0.75->2, 0.9->2
        assert got[("duo", 0.25)] == 10
        assert got[("duo", 0.5)] == 20
        assert got[("duo", 0.75)] == 30
        assert got[("duo", 0.9)] == 30


class TestContQuantiles:
    def test_matches_numpy_linear(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.exec import configure_context
        from dynaalign_ray.functions.sketches import exact_int_quantiles_cont

        configure_context()
        rng = np.random.default_rng(5)
        vals = rng.integers(0, 300, size=777).astype(np.int64)
        ds = rd.from_arrow(pa.table({"n": pa.array(vals)})).repartition(num_blocks=4)
        qs = [0.1, 0.25, 0.5, 0.9]
        out = {
            r["q"]: r["value"]
            for r in exact_int_quantiles_cont(ds, "n", qs, 4).to_pylist()
        }
        for q in qs:
            # numpy 'linear' uses the same q*(n-1) interpolation rule
            want = float(np.percentile(vals, q * 100, method="linear"))
            assert out[q] == pytest.approx(want, abs=1e-4)
