"""Known-answer tests for the left-outer customer/order query and the
exact integer-cents population-stddev aggregate."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


@pytest.fixture()
def rd(ray_session):
    return ray.data


class TestCustomerOrderCounts:
    def test_zero_order_customers_kept(self, rd, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import customer_order_counts

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "c_mktsegment": pa.array(["A"] * 4),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 3], pa.int64()),
                    "o_totalprice": pa.array([10.005, 20.0, 5.555], pa.float64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        got = {
            r["c_custkey"]: (r["n_orders"], r["revenue_cents"])
            for r in customer_order_counts(str(tmp_path), num_partitions=3).take_all()
        }
        # round-half-away cents: 10.005 -> 1001 (DuckDB round convention)
        assert got == {1: (2, 1001 + 2000), 2: (0, 0), 3: (1, 556), 4: (0, 0)}


class TestEventsValueStats:
    def test_matches_python_pstdev(self, rd, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_value_stats

        rng = np.random.default_rng(3)
        types = rng.choice(["a", "b", "c"], size=400)
        vals = np.round(rng.normal(50, 12, size=400), 2)
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(types),
                    "value": pa.array(vals, pa.float64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        got = {
            r["event_type"]: (r["n"], r["sum_cents"], r["stddev_value"])
            for r in events_value_stats(str(tmp_path), num_partitions=4).take_all()
        }
        for t in "abc":
            cents = [int(round(v * 100)) for v, ty in zip(vals, types) if ty == t]
            n = len(cents)
            mean = sum(cents) / n
            pstd = math.sqrt(sum((c - mean) ** 2 for c in cents) / n) / 100.0
            gn, gs, gstd = got[t]
            assert gn == n
            assert gs == sum(cents)
            assert gstd == pytest.approx(pstd, abs=1e-4)

    def test_batching_invariance(self, rd, ray_session, tmp_path):
        """Partials summed over any block split give the same exact ints."""
        from dynaalign_ray.pipelines.relational import events_value_stats

        vals = pa.array([1.11, 2.22, 3.33, 4.44, 5.55] * 7, pa.float64())
        pq.write_table(
            pa.table({"event_type": pa.array(["x"] * 35), "value": vals}),
            tmp_path / "events.parquet",
        )
        rows = events_value_stats(str(tmp_path), num_partitions=2).take_all()
        assert len(rows) == 1
        r = rows[0]
        cents = [111, 222, 333, 444, 555] * 7
        assert r["sum_cents"] == sum(cents)
        assert r["sumsq_cents"] == sum(c * c for c in cents)


class TestGroupedHll:
    def test_within_5pct_of_exact(self, rd, ray_session):
        import duckdb

        from dynaalign_ray.pipelines.relational import events_type_users_approx

        sf = "/root/testdata/sf0.001"
        got = {
            r["event_type"]: r["n_users_approx"]
            for r in events_type_users_approx(sf, num_partitions=4).take_all()
        }
        want = dict(
            duckdb.sql(
                f"SELECT event_type, count(DISTINCT user_id) FROM '{sf}/events.parquet' GROUP BY event_type"
            ).fetchall()
        )
        assert set(got) == set(want)
        for t, exact in want.items():
            assert abs(got[t] - exact) / exact < 0.05, (t, got[t], exact)
