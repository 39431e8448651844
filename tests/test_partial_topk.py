"""exec.partial_topk — per-block partial top-k plan (VERDICT r3 #2).

The claim under test: for any TOTAL sort order, partial_topk(ds, keys, k)
returns exactly the same rows in the same order as the global
``sort().limit(k)`` plan, including at tie boundaries — while never
range-partitioning more than k rows per block.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dynaalign_ray.exec import partial_topk


def _global_plan(tbl: pa.Table, keys, k):
    import pyarrow.compute as pc

    idx = pc.sort_indices(tbl, sort_keys=keys)
    return tbl.take(idx[:k]).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestPartialTopk:
    def _roundtrip(self, tbl: pa.Table, keys, k, blocks=7):
        ds = rd.from_arrow(tbl).repartition(blocks)
        got = partial_topk(ds, keys, k).to_pandas().reset_index(drop=True)
        want = _global_plan(tbl, keys, k).reset_index(drop=True)
        assert got.equals(want), (got, want)

    def test_matches_global_sort_random(self):
        rng = np.random.default_rng(7)
        n = 5000
        tbl = pa.table(
            {
                "v": pa.array(rng.integers(0, 200, n), type=pa.int64()),
                "id": pa.array(rng.permutation(n), type=pa.int64()),
            }
        )
        self._roundtrip(
            tbl, [("v", "descending"), ("id", "ascending")], k=25
        )

    def test_tie_boundary_exact(self):
        # every v identical -> the k-boundary is decided purely by the
        # tiebreaker; per-block pruning must keep the right ids
        n = 1000
        tbl = pa.table(
            {
                "v": pa.array(np.zeros(n, dtype=np.int64)),
                "id": pa.array(np.random.default_rng(3).permutation(n)),
            }
        )
        self._roundtrip(tbl, [("v", "descending"), ("id", "ascending")], k=10)

    def test_k_larger_than_input(self):
        tbl = pa.table({"v": pa.array([3, 1, 2]), "id": pa.array([0, 1, 2])})
        self._roundtrip(
            tbl, [("v", "descending"), ("id", "ascending")], k=50, blocks=2
        )

    def test_rewritten_queries_match_duckdb(self):
        # the three rewritten public queries stay hash-identical to SQL
        import duckdb

        from dynaalign_ray.pipelines.curation import doc_top_longest
        from dynaalign_ray.pipelines.relational import (
            lineitem_topk_price,
            top_customers,
        )

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        for t in ("documents", "lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        cases = [
            (
                doc_top_longest(sf),
                "SELECT doc_id, n_chars FROM documents "
                "ORDER BY n_chars DESC, doc_id LIMIT 10",
            ),
            (
                lineitem_topk_price(sf),
                "SELECT l_orderkey, l_linenumber, l_extendedprice "
                "FROM lineitem ORDER BY l_extendedprice DESC, "
                "l_orderkey, l_linenumber LIMIT 10",
            ),
            (
                top_customers(sf),
                "SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue,"
                " count(*) AS n_orders FROM orders GROUP BY o_custkey "
                "ORDER BY revenue DESC, o_custkey LIMIT 10",
            ),
        ]
        for ds, sql in cases:
            got = ds.to_pandas()
            got = got.reindex(sorted(got.columns), axis=1)
            got = got.sort_values(list(got.columns)).reset_index(drop=True)
            want = con.execute(sql).df()
            want = want.reindex(sorted(want.columns), axis=1)
            want = (
                want.sort_values(list(want.columns)).reset_index(drop=True)
            )
            for c in got.columns:
                np.testing.assert_array_equal(
                    got[c].to_numpy(), want[c].to_numpy(), err_msg=c
                )
