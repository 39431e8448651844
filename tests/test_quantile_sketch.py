"""Mergeable KLL quantile sketch (functions/sketches.KLL): rank-error gate
vs exact quantiles, merge associativity, serialization, and the distributed
approx_float_quantiles path equivalence-gated against the EXACT
lineitem_price_quantiles query (round-3 item #5)."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.functions.sketches import KLL, approx_float_quantiles

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(data: np.ndarray, q: float, est: float) -> float:
    """|true rank of est - q*n| / n."""
    s = np.sort(data)
    n = len(s)
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    target = q * n
    # any rank within the est's tie run counts
    err = 0.0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
    return err / n


class TestKLL:
    def test_rank_error_gate(self):
        rng = np.random.default_rng(7)
        data = np.exp(rng.normal(0, 2, size=50_000))  # heavy-tailed floats
        sk = KLL(k=256)
        for part in np.array_split(data, 37):  # incremental adds
            sk.add(part)
        assert sk.n() == len(data)
        ests = sk.quantiles(QS)
        for q, e in zip(QS, ests):
            assert _rank_error(data, q, e) <= 0.015, (q, e)

    def test_merge_matches_single_sketch_error(self):
        rng = np.random.default_rng(11)
        data = rng.normal(100, 15, size=40_000)
        parts = np.array_split(data, 16)
        merged = None
        for p in parts:
            sk = KLL(k=256).add(p)
            merged = sk if merged is None else merged.merge(sk)
        assert merged.n() == len(data)
        for q, e in zip(QS, merged.quantiles(QS)):
            assert _rank_error(data, q, e) <= 0.02, (q, e)

    def test_serialization_roundtrip(self):
        rng = np.random.default_rng(3)
        sk = KLL(k=64).add(rng.uniform(-5, 5, size=10_000))
        back = KLL.from_bytes(sk.to_bytes())
        assert back.n() == sk.n()
        assert np.array_equal(back.quantiles(QS), sk.quantiles(QS))
        assert back._toggle == sk._toggle

    def test_small_input_is_exact(self):
        # below compaction capacity the sketch holds every value -> exact
        data = np.arange(100, dtype=np.float64)
        sk = KLL(k=256).add(data)
        for q, e in zip(QS, sk.quantiles(QS)):
            assert e == np.sort(data)[max(0, int(np.ceil(q * 100)) - 1)]

    def test_nan_dropped_empty_ok(self):
        sk = KLL(k=64).add(np.array([np.nan, np.nan]))
        assert sk.n() == 0
        assert np.isnan(sk.quantiles([0.5])[0])


class TestDistributed:
    def test_approx_matches_exact_lineitem_quantiles(self, ray_session):
        """The KLL scale path vs the hash-exact value-histogram query on the
        same l_extendedprice column: every estimate's true rank within 2%."""
        import duckdb

        import ray.data as rd

        from dynaalign_ray.pipelines.relational import lineitem_price_quantiles

        sf = "/root/testdata/sf0.001"
        exact = lineitem_price_quantiles(sf).to_pandas()
        li = rd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_extendedprice"])
        approx = approx_float_quantiles(
            li, "l_extendedprice", exact["q"].tolist(), k=256
        ).to_pandas()
        prices = (
            duckdb.sql(f"SELECT l_extendedprice FROM '{sf}/lineitem.parquet'")
            .fetchnumpy()["l_extendedprice"]
        )
        for q, e in zip(approx["q"], approx["value"]):
            assert _rank_error(prices, q, e) <= 0.02, (q, e)
        # and the exact query itself is the true quantile_disc
        s = np.sort(prices)
        for q, v in zip(exact["q"], exact["price"]):
            assert v == s[max(0, int(np.ceil(q * len(s))) - 1)]
