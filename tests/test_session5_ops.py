"""Known-answer tests for the session-5 event operators: time-weighted
value (LEAD-gap weighting), ordered path assembly, and distinct-set
algebra — each on a hand-computable fixture, plus a randomized
brute-force parity check for the time-weighted kernel."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    ts, uid, etype, value = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [np.datetime64(t, "us").astype("datetime64[us]") for t in ts],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(etype, pa.string()),
                "value": pa.array(value, pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )


class TestTimeWeightedValue:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_time_weighted_value

        # user 1: value 1.00 held 10 s, value 3.00 held 30 s -> (100*10 +
        # 300*30)/40/100 = 2.50; user 2: single event -> no gaps, no row
        _write_events(
            tmp_path,
            [
                ("2024-01-01T00:00:00", 1, "a", 1.00),
                ("2024-01-01T00:00:10", 1, "a", 3.00),
                ("2024-01-01T00:00:40", 1, "a", 9.99),
                ("2024-01-01T00:00:00", 2, "a", 5.00),
            ],
        )
        got = events_time_weighted_value(str(tmp_path)).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert row["user_id"] == 1
        assert row["tw_avg_value"] == 2.5
        assert row["n_gaps"] == 2

    def test_matches_bruteforce(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_time_weighted_value

        rng = np.random.default_rng(7)
        rows = []
        t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
        for _ in range(200):
            uid = int(rng.integers(1, 9))
            ts_us = int(t0 + rng.integers(0, 3_600_000_000))
            rows.append(
                (
                    np.datetime64(ts_us, "us").astype(str),
                    uid,
                    "a",
                    round(float(rng.uniform(0, 100)), 2),
                )
            )
        _write_events(tmp_path, rows)
        got = (
            events_time_weighted_value(str(tmp_path))
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        # brute force: per user sort by (ts, event_id), int64 stats
        import pandas as pd

        df = pd.DataFrame(
            {
                "ts": [np.datetime64(r[0], "us").astype(np.int64) for r in rows],
                "uid": [r[1] for r in rows],
                "cents": [int(round(r[3] * 100)) for r in rows],
                "eid": range(len(rows)),
            }
        ).sort_values(["uid", "ts", "eid"])
        for uid, g in df.groupby("uid"):
            if len(g) < 2:
                assert uid not in got.index
                continue
            gaps = np.diff(g["ts"].to_numpy())
            w = g["cents"].to_numpy()[:-1]
            want = float(int((w * gaps).sum()) / int(gaps.sum()) / 100.0)
            want = np.sign(want * 1e4) * np.floor(abs(want * 1e4) + 0.5) / 1e4
            assert got.loc[uid, "tw_avg_value"] == want
            assert got.loc[uid, "n_gaps"] == len(gaps)


class TestUserEventPaths:
    def test_order_and_truncation(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import user_event_paths

        rows = [("2024-01-01T00:00:%02d" % i, 1, f"t{i}", 0.0) for i in range(12)]
        rows += [("2024-01-01T00:00:05", 2, "solo", 0.0)]
        _write_events(tmp_path, rows)
        got = user_event_paths(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "path"] == ">".join(f"t{i}" for i in range(10))
        assert got.loc[1, "n_events"] == 12
        assert got.loc[2, "path"] == "solo"
        assert got.loc[2, "n_events"] == 1

    def test_tie_breaks_on_event_id(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import user_event_paths

        # same timestamp: event_id (insertion index) breaks the tie
        rows = [("2024-01-01T00:00:00", 1, t, 0.0) for t in ["b", "a", "c"]]
        _write_events(tmp_path, rows)
        got = user_event_paths(str(tmp_path)).to_pandas()
        assert got.iloc[0]["path"] == "b>a>c"


class TestSetOps:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import active_user_set_ops

        rows = [
            ("2024-01-01T00:00:00", 1, "purchase", 0.0),
            ("2024-01-01T00:00:01", 1, "error", 0.0),
            ("2024-01-01T00:00:02", 2, "purchase", 0.0),
            ("2024-01-01T00:00:03", 3, "error", 0.0),
            ("2024-01-01T00:00:04", 3, "error", 0.0),
            ("2024-01-01T00:00:05", 4, "view", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = active_user_set_ops(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_both"] == 1  # user 1
        assert got["n_a_only"] == 1  # user 2
        assert got["n_b_only"] == 1  # user 3
        assert got["n_either"] == 3


class TestGroupedCorrelation:
    def test_matches_numpy(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import lineitem_qty_discount_corr

        rng = np.random.default_rng(3)
        n = 500
        qty = rng.integers(1, 50, n).astype(np.float64)
        # correlated discount for flag A, independent for flag B
        flag = np.where(rng.random(n) < 0.5, "A", "B")
        disc = np.where(
            flag == "A", np.clip(qty / 500.0, 0, 0.1), rng.integers(0, 11, n) / 100.0
        )
        disc = np.round(disc, 2)
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(flag.tolist()),
                    "l_quantity": pa.array(qty, pa.float64()),
                    "l_discount": pa.array(disc, pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        got = (
            lineitem_qty_discount_corr(str(tmp_path))
            .to_pandas()
            .set_index("l_returnflag")
        )
        for f in ["A", "B"]:
            m = flag == f
            want = np.corrcoef(qty[m], np.round(disc[m] * 100))[0, 1]
            assert abs(got.loc[f, "corr_qd"] - want) < 5e-4
            assert got.loc[f, "n"] == int(m.sum())

    def test_zero_variance_group(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import lineitem_qty_discount_corr

        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(["Z"] * 4),
                    "l_quantity": pa.array([5.0] * 4, pa.float64()),
                    "l_discount": pa.array([0.01, 0.02, 0.03, 0.04], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        got = lineitem_qty_discount_corr(str(tmp_path)).to_pandas()
        assert got.iloc[0]["corr_qd"] == 0.0  # guarded, not NaN


class TestDauWau:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_dau_wau

        # day 0: users {1,2}; day 3: {2}; day 8: {3}
        rows = [
            ("1970-01-01T05:00:00", 1, "a", 0.0),
            ("1970-01-01T06:00:00", 2, "a", 0.0),
            ("1970-01-01T07:00:00", 2, "a", 0.0),
            ("1970-01-04T01:00:00", 2, "a", 0.0),
            ("1970-01-09T01:00:00", 3, "a", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_dau_wau(str(tmp_path)).to_pandas().set_index("day")
        assert list(got.index) == [0, 3, 8]
        assert got.loc[0, "dau"] == 2 and got.loc[0, "wau"] == 2
        # day 3 window covers days -3..3 -> users {1,2}
        assert got.loc[3, "dau"] == 1 and got.loc[3, "wau"] == 2
        # day 8 window covers 2..8 -> users {2,3}
        assert got.loc[8, "dau"] == 1 and got.loc[8, "wau"] == 2
        assert got.loc[8, "stickiness"] == 0.5


class TestRankBySource:
    def test_ties_share_rank_with_gaps(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_rank_by_source

        # source A lengths: 50, 50, 40, 30 -> ranks 1,1,3,4: rank<=3 keeps 3
        # source B lengths: 9, 8, 8, 8, 7 -> ranks 1,2,2,2,5: keeps 4
        lens = {"A": [50, 50, 40, 30], "B": [9, 8, 8, 8, 7]}
        rows = [(s, n) for s, ns in lens.items() for n in ns]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": pa.array(["x"] * len(rows)),
                    "lang": pa.array(["en"] * len(rows)),
                    "source": pa.array([r[0] for r in rows]),
                    "n_chars": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = doc_rank_by_source(str(tmp_path)).to_pandas()
        a = got[got.source == "A"].sort_values("doc_id")
        assert list(a.rnk) == [1, 1, 3]
        b = got[got.source == "B"].sort_values("doc_id")
        assert list(b.rnk) == [1, 2, 2, 2]


class TestOrdersProfile:
    def test_nulls_and_distincts(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import orders_profile

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "o_custkey": pa.array([10, None, 10, 9], pa.int64()),
                    "o_orderstatus": pa.array(["F", "O", None, "F"]),
                    "o_orderpriority": pa.array(["1-URGENT"] * 4),
                }
            ),
            tmp_path / "orders.parquet",
        )
        got = orders_profile(str(tmp_path)).to_pandas().set_index("col_name")
        assert got.loc["o_custkey", "n_nulls"] == 1
        assert got.loc["o_custkey", "n_distinct"] == 2
        # lexicographic string min: "10" < "9"
        assert got.loc["o_custkey", "min_val"] == "10"
        assert got.loc["o_custkey", "max_val"] == "9"
        assert got.loc["o_orderstatus", "n_nulls"] == 1
        assert got.loc["o_orderstatus", "n_distinct"] == 2
        assert got.loc["o_orderpriority", "n_distinct"] == 1
        assert got.loc["o_orderkey", "n_nulls"] == 0


class TestEmbeddingCentroid:
    def test_matches_numpy(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import embedding_label_centroid

        rng = np.random.default_rng(5)
        dim = 64
        labels = rng.integers(0, 3, 40).astype(np.int32)
        vecs = rng.normal(size=(40, dim)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        got = embedding_label_centroid(str(tmp_path)).to_pandas()
        assert len(got) == 3 * dim
        for lbl in [0, 1, 2]:
            m = vecs[labels == lbl].astype(np.float64)
            scaled = np.sign(m * 1e6) * np.floor(np.abs(m * 1e6) + 0.5)
            want = scaled.sum(axis=0) / len(m) / 1e6
            want = np.sign(want * 1e4) * np.floor(np.abs(want * 1e4) + 0.5) / 1e4
            sub = got[got.label == lbl].sort_values("dim")
            assert np.array_equal(sub["centroid"].to_numpy(), want)
            assert (sub["n_vecs"] == len(m)).all()


class TestDrawdown:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_user_drawdown

        # user 1 values: 5, 3, 7, 2 -> run max 5,5,7,7 -> dd 0,200,0,500
        rows = [
            ("2024-01-01T00:00:00", 1, "a", 5.0),
            ("2024-01-01T00:00:01", 1, "a", 3.0),
            ("2024-01-01T00:00:02", 1, "a", 7.0),
            ("2024-01-01T00:00:03", 1, "a", 2.0),
            ("2024-01-01T00:00:00", 2, "a", 9.0),
        ]
        _write_events(tmp_path, rows)
        got = (
            events_user_drawdown(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")
        )
        assert list(got["drawdown_cents"]) == [0, 200, 0, 500, 0]

    def test_segment_reset_across_users(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_user_drawdown

        # user 2 starts fresh: its first event never sees user 1's max
        rows = [
            ("2024-01-01T00:00:00", 1, "a", 100.0),
            ("2024-01-01T00:00:01", 2, "a", 1.0),
            ("2024-01-01T00:00:02", 2, "a", 0.5),
        ]
        _write_events(tmp_path, rows)
        got = (
            events_user_drawdown(str(tmp_path)).to_pandas().sort_values("event_id")
        )
        assert list(got["drawdown_cents"]) == [0, 0, 50]


class TestGini:
    def _write_docs(self, tmp_path, lens):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(lens)), pa.int64()),
                    "text": pa.array(["x"] * len(lens)),
                    "lang": pa.array(["en"] * len(lens)),
                    "source": pa.array(["s"] * len(lens)),
                    "n_chars": pa.array(lens, pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_all_equal_is_zero(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_length_gini

        self._write_docs(tmp_path, [7] * 10)
        got = doc_length_gini(str(tmp_path)).to_pandas().iloc[0]
        assert got["gini"] == 0.0
        assert got["n_docs"] == 10 and got["total_chars"] == 70

    def test_matches_bruteforce(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_length_gini

        rng = np.random.default_rng(13)
        lens = rng.integers(1, 500, 200).tolist()
        self._write_docs(tmp_path, lens)
        got = doc_length_gini(str(tmp_path)).to_pandas().iloc[0]
        xs = np.sort(np.array(lens, dtype=np.int64))
        n, total = len(xs), int(xs.sum())
        s = int((np.arange(1, n + 1, dtype=np.int64) * xs).sum())
        want = (2 * s - (n + 1) * total) / (n * total)
        want = np.sign(want * 1e4) * np.floor(abs(want * 1e4) + 0.5) / 1e4
        assert got["gini"] == want


class TestSpearman:
    def _write_parts(self, tmp_path, sizes, prices):
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array(range(len(sizes)), pa.int64()),
                    "p_size": pa.array(sizes, pa.int64()),
                    "p_retailprice": pa.array(prices, pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )

    def test_perfect_monotone(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import part_size_price_spearman

        sizes = list(range(1, 21))
        self._write_parts(tmp_path, sizes, [s * 1.5 for s in sizes])
        got = part_size_price_spearman(str(tmp_path)).to_pandas().iloc[0]
        assert got["spearman_rho"] == 1.0

    def test_perfect_inverse(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import part_size_price_spearman

        sizes = list(range(1, 21))
        self._write_parts(tmp_path, sizes, [100.0 - s for s in sizes])
        got = part_size_price_spearman(str(tmp_path)).to_pandas().iloc[0]
        assert got["spearman_rho"] == -1.0

    def test_ties_match_average_rank_reference(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import part_size_price_spearman

        rng = np.random.default_rng(17)
        sizes = rng.integers(1, 8, 60).tolist()  # heavy ties
        prices = np.round(rng.uniform(1, 20, 60) * 2, 2)  # some ties after x100
        self._write_parts(tmp_path, sizes, prices.tolist())
        got = part_size_price_spearman(str(tmp_path)).to_pandas().iloc[0]

        def avg_ranks(a):
            a = np.asarray(a)
            order = np.argsort(a, kind="stable")
            r = np.empty(len(a), dtype=np.float64)
            sa = a[order]
            i = 0
            while i < len(sa):
                j = i
                while j < len(sa) and sa[j] == sa[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0  # average of ranks i+1..j
                i = j
            return r

        rx = avg_ranks(sizes)
        ry = avg_ranks(np.round(np.asarray(prices) * 100))
        rxc, ryc = rx - rx.mean(), ry - ry.mean()
        want = (rxc * ryc).sum() / np.sqrt((rxc**2).sum() * (ryc**2).sum())
        assert abs(got["spearman_rho"] - want) < 5e-4


class TestKendall:
    def _write_parts(self, tmp_path, sizes, prices):
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array(range(len(sizes)), pa.int64()),
                    "p_size": pa.array(sizes, pa.int64()),
                    "p_retailprice": pa.array(prices, pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )

    def test_grid_matches_pair_bruteforce(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import part_size_price_kendall

        rng = np.random.default_rng(23)
        sizes = rng.integers(1, 6, 80).tolist()
        prices = np.round(rng.uniform(1, 5, 80), 2).tolist()
        self._write_parts(tmp_path, sizes, prices)
        got = part_size_price_kendall(str(tmp_path)).to_pandas().iloc[0]
        xs = np.array(sizes)
        ys = np.round(np.array(prices) * 100).astype(np.int64)
        C = D = 0
        n = len(xs)
        for i in range(n):
            for j in range(i + 1, n):
                s = (xs[i] - xs[j]) * (ys[i] - ys[j])
                C += s > 0
                D += s < 0
        assert got["concordant"] == C and got["discordant"] == D
        n0 = n * (n - 1) // 2
        n1 = sum(c * (c - 1) // 2 for c in np.bincount(xs) if c > 1)
        n2 = sum(
            int(c) * (int(c) - 1) // 2 for c in np.unique(ys, return_counts=True)[1]
        )
        want = (float(C) - float(D)) / (np.sqrt(float(n0 - n1)) * np.sqrt(float(n0 - n2)))
        want = np.sign(want * 1e4) * np.floor(abs(want * 1e4) + 0.5) / 1e4
        assert got["kendall_tau"] == want

    def test_perfect_concordance(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import part_size_price_kendall

        sizes = list(range(1, 11))
        self._write_parts(tmp_path, sizes, [float(s) for s in sizes])
        got = part_size_price_kendall(str(tmp_path)).to_pandas().iloc[0]
        assert got["kendall_tau"] == 1.0 and got["discordant"] == 0


class TestBenford:
    def test_digit_extraction(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import orders_benford_digits

        # cents: 100, 999, 1000, 95000, 9 -> leading digits 1,9,1,9,9
        prices = [1.00, 9.99, 10.00, 950.00, 0.09]
        pq.write_table(
            pa.table({"o_totalprice": pa.array(prices, pa.float64())}),
            tmp_path / "orders.parquet",
        )
        got = orders_benford_digits(str(tmp_path)).to_pandas().set_index("digit")
        assert got.loc[1, "n_orders"] == 2
        assert got.loc[9, "n_orders"] == 3
        assert got.loc[1, "share"] == 0.4


class TestIntegrityAudit:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import orders_lineitem_integrity

        pq.write_table(
            pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64())}),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {"l_orderkey": pa.array([2, 2, 3, 9, 9, 10], pa.int64())}
            ),
            tmp_path / "lineitem.parquet",
        )
        got = orders_lineitem_integrity(str(tmp_path)).to_pandas().iloc[0]
        assert got["orders_without_items"] == 2  # 1, 4
        assert got["orphan_item_keys"] == 2  # 9, 10
        assert got["matched_keys"] == 2  # 2, 3


class TestPeak5Min:
    def test_hand_computed_with_ties(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_peak_5min

        # user 1: events at 0s, 60s, 60s (tie), 400s -> best window holds 3
        # (the tie peers count together per RANGE semantics)
        rows = [
            ("2024-01-01T00:00:00", 1, "a", 0.0),
            ("2024-01-01T00:01:00", 1, "a", 0.0),
            ("2024-01-01T00:01:00", 1, "a", 0.0),
            ("2024-01-01T00:06:40", 1, "a", 0.0),
            ("2024-01-01T00:00:00", 2, "a", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_peak_5min(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "peak_5min"] == 3
        assert got.loc[2, "peak_5min"] == 1

    def test_window_is_inclusive_trailing(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_peak_5min

        # exactly 5 minutes apart: both inside the RANGE-inclusive window
        rows = [
            ("2024-01-01T00:00:00", 1, "a", 0.0),
            ("2024-01-01T00:05:00", 1, "a", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_peak_5min(str(tmp_path)).to_pandas()
        assert got.iloc[0]["peak_5min"] == 2


class TestChiCells:
    def test_uniform_table_zero_chi(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import lang_source_chi_cells

        rows = [(l, s) for l in ["en", "de"] for s in ["a", "b"] for _ in range(5)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": pa.array(["x"] * len(rows)),
                    "lang": pa.array([r[0] for r in rows]),
                    "source": pa.array([r[1] for r in rows]),
                    "n_chars": pa.array([1] * len(rows), pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = lang_source_chi_cells(str(tmp_path)).to_pandas()
        assert len(got) == 4
        assert (got["expected"] == 5.0).all()
        assert (got["chi2_cell"] == 0.0).all()


class TestLongestStreak:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_longest_streak

        seq = ["a", "a", "b", "b", "b", "a"]
        rows = [("2024-01-01T00:00:%02d" % i, 1, t, 0.0) for i, t in enumerate(seq)]
        rows += [("2024-01-01T00:00:00", 2, "z", 0.0)]
        _write_events(tmp_path, rows)
        got = events_longest_streak(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "streak"] == 3 and got.loc[1, "streak_type"] == "b"
        assert got.loc[2, "streak"] == 1 and got.loc[2, "streak_type"] == "z"

    def test_tie_prefers_lex_smaller_type(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_longest_streak

        seq = ["b", "b", "a", "a"]
        rows = [("2024-01-01T00:00:%02d" % i, 1, t, 0.0) for i, t in enumerate(seq)]
        _write_events(tmp_path, rows)
        got = events_longest_streak(str(tmp_path)).to_pandas()
        assert got.iloc[0]["streak_type"] == "a"


class TestSourceVocabOverlap:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import source_vocab_overlap

        texts = [
            ("x y z", "s1"),  # vocab {x,y,z}
            ("y z w", "s2"),  # vocab {y,z,w}; inter=2, union=4 -> 0.5
            ("q", "s3"),  # disjoint: no pair rows with s1/s2
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array([t[0] for t in texts]),
                    "lang": pa.array(["en"] * len(texts)),
                    "source": pa.array([t[1] for t in texts]),
                    "n_chars": pa.array([len(t[0]) for t in texts], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = source_vocab_overlap(str(tmp_path)).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert (row["source_a"], row["source_b"]) == ("s1", "s2")
        assert row["n_common"] == 2 and row["jaccard"] == 0.5


class TestWeightedMedian:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import lineitem_weighted_median_price

        # flag A: price 1.00 w=1, 2.00 w=1, 3.00 w=10 -> half of 12 is 6,
        # first price with 2*cw >= 12 is 3.00
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(["A", "A", "A", "B"]),
                    "l_extendedprice": pa.array([1.0, 2.0, 3.0, 9.0], pa.float64()),
                    "l_quantity": pa.array([1.0, 1.0, 10.0, 4.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        got = (
            lineitem_weighted_median_price(str(tmp_path))
            .to_pandas()
            .set_index("l_returnflag")
        )
        assert got.loc["A", "weighted_median_price"] == 3.0
        assert got.loc["A", "total_qty"] == 12
        assert got.loc["B", "weighted_median_price"] == 9.0

    def test_even_split_takes_lower(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import lineitem_weighted_median_price

        # weights 1/1: 2*cw at price 1.00 is 2 == total -> lower median 1.00
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(["A", "A"]),
                    "l_extendedprice": pa.array([1.0, 2.0], pa.float64()),
                    "l_quantity": pa.array([1.0, 1.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        got = lineitem_weighted_median_price(str(tmp_path)).to_pandas()
        assert got.iloc[0]["weighted_median_price"] == 1.0


class TestActiveTime:
    def test_overlap_and_gap(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_active_time

        # user 1: events at 0s, 30s (overlap: contributes 30), 200s (gap:
        # 30s-event contributes full 60), last contributes 60 -> 150 s
        rows = [
            ("2024-01-01T00:00:00", 1, "a", 0.0),
            ("2024-01-01T00:00:30", 1, "a", 0.0),
            ("2024-01-01T00:03:20", 1, "a", 0.0),
            ("2024-01-01T00:00:00", 2, "a", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_active_time(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "active_seconds"] == 150.0
        assert got.loc[1, "n_events"] == 3
        assert got.loc[2, "active_seconds"] == 60.0

    def test_simultaneous_events_collapse(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_active_time

        rows = [
            ("2024-01-01T00:00:00", 1, "a", 0.0),
            ("2024-01-01T00:00:00", 1, "b", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_active_time(str(tmp_path)).to_pandas()
        assert got.iloc[0]["active_seconds"] == 60.0  # gap 0 + window


class TestLorenzDeciles:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_lorenz_deciles

        rng = np.random.default_rng(29)
        lens = rng.integers(1, 50, 73).tolist()  # n not divisible by 10
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(lens)), pa.int64()),
                    "text": pa.array(["x"] * len(lens)),
                    "lang": pa.array(["en"] * len(lens)),
                    "source": pa.array(["s"] * len(lens)),
                    "n_chars": pa.array(lens, pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = doc_lorenz_deciles(str(tmp_path)).to_pandas().set_index("decile")
        xs = np.sort(np.array(lens, dtype=np.int64))
        n, total = len(xs), int(xs.sum())
        for k in range(1, 11):
            m = k * n // 10
            assert got.loc[k, "cum_docs"] == m
            assert got.loc[k, "cum_chars"] == int(xs[:m].sum())
        assert got.loc[10, "share"] == 1.0


class TestTimedConversion:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_timed_conversion

        rows = [
            # user 1: signup then purchase 30 min later -> in window
            ("2024-01-01T00:00:00", 1, "signup", 0.0),
            ("2024-01-01T00:30:00", 1, "purchase", 0.0),
            # user 2: signup then purchase 2 h later -> ordered, not timed
            ("2024-01-01T00:00:00", 2, "signup", 0.0),
            ("2024-01-01T02:00:00", 2, "purchase", 0.0),
            # user 3: purchase BEFORE signup -> not ordered
            ("2024-01-01T00:00:00", 3, "purchase", 0.0),
            ("2024-01-01T01:00:00", 3, "signup", 0.0),
            # user 4: signup only
            ("2024-01-01T00:00:00", 4, "signup", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_timed_conversion(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_signup"] == 4
        assert got["n_ordered_pairs"] == 2
        assert got["n_converted_in_window"] == 1


class TestBounceRate:
    def test_sessions_and_bounces(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_bounce_rate

        rows = [
            # user 1: two events 1 min apart (one session), then a lone
            # event 2 h later (bounce) -> 2 sessions, 1 bounce
            ("2024-01-01T00:00:00", 1, "a", 0.0),
            ("2024-01-01T00:01:00", 1, "a", 0.0),
            ("2024-01-01T02:00:00", 1, "a", 0.0),
            ("2024-01-01T00:00:00", 2, "a", 0.0),
        ]
        _write_events(tmp_path, rows)
        got = events_bounce_rate(str(tmp_path)).to_pandas().set_index("user_id")
        assert got.loc[1, "n_sessions"] == 2 and got.loc[1, "n_bounces"] == 1
        assert got.loc[1, "bounce_rate"] == 0.5
        assert got.loc[2, "n_sessions"] == 1 and got.loc[2, "bounce_rate"] == 1.0


class TestDowRevenue:
    def test_known_weekday(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import orders_dow_revenue

        # 2024-01-01 was a Monday -> dow 0; 2024-01-04 Thursday -> dow 3
        pq.write_table(
            pa.table(
                {
                    "o_orderdate": pa.array(
                        [np.datetime64("2024-01-01", "us"), np.datetime64("2024-01-04", "us")],
                        pa.timestamp("us"),
                    ),
                    "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        got = orders_dow_revenue(str(tmp_path)).to_pandas().set_index("dow")
        assert got.loc[0, "revenue"] == 10.0
        assert got.loc[3, "revenue"] == 20.0


class TestDedupSavings:
    def test_cross_source_cluster(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_dedup_savings

        rows = [
            (0, "same text", "s1", 9),
            (1, "same text", "s2", 9),  # dup, dropped, charged to s2
            (2, "unique", "s2", 6),
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                    "lang": pa.array(["en"] * 3),
                    "source": pa.array([r[2] for r in rows]),
                    "n_chars": pa.array([r[3] for r in rows], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = doc_dedup_savings(str(tmp_path)).to_pandas().set_index("source")
        assert got.loc["s1", "kept"] == 1 and got.loc["s1", "dropped"] == 0
        assert got.loc["s2", "kept"] == 1 and got.loc["s2", "dropped"] == 1
        assert got.loc["s2", "dropped_chars"] == 9


class TestTopTermCoverage:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_top_term_coverage

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a a a b b c", "a b d"]),
                    "lang": pa.array(["en"] * 2),
                    "source": pa.array(["s"] * 2),
                    "n_chars": pa.array([11, 5], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = doc_top_term_coverage(str(tmp_path), k=2).to_pandas()
        # counts: a=4, b=3, c=1, d=1; total 9
        assert list(got["term"]) == ["a", "b"]
        assert list(got["n"]) == [4, 3]
        assert got.iloc[1]["cum_coverage"] == round(7 / 9, 4)


class TestSimpsonDiversity:
    def test_single_part_supplier_zero(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import supplier_part_diversity

        pq.write_table(
            pa.table(
                {
                    "l_suppkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
                    "l_partkey": pa.array([7, 7, 7, 8, 9], pa.int64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        got = (
            supplier_part_diversity(str(tmp_path)).to_pandas().set_index("l_suppkey")
        )
        assert got.loc[1, "simpson"] == 0.0  # all same part
        assert got.loc[2, "simpson"] == 1.0  # all different parts


class TestBalanceZscore:
    def test_matches_numpy(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import supplier_balance_zscore

        rng = np.random.default_rng(31)
        bal = np.round(rng.uniform(-100, 1000, 40), 2)
        nk = rng.integers(0, 3, 40)
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array(range(40), pa.int64()),
                    "s_nationkey": pa.array(nk, pa.int32()),
                    "s_acctbal": pa.array(bal, pa.float64()),
                }
            ),
            tmp_path / "supplier.parquet",
        )
        got = supplier_balance_zscore(str(tmp_path)).to_pandas().set_index("s_suppkey")
        cents = np.round(bal * 100)
        for k in range(3):
            m = nk == k
            mu, sd = cents[m].mean(), cents[m].std()  # population std
            for i in np.nonzero(m)[0]:
                want = (cents[i] - mu) / sd
                assert abs(got.loc[i, "zscore"] - want) < 5e-4


class TestShingleDfHist:
    def test_hand_computed(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_shingle_df_hist

        texts = [
            "a b c d",      # shingles: "a b c", "b c d"
            "a b c e",      # shingles: "a b c", "b c e"
            "x y",          # < 3 tokens: no shingles
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * len(texts)),
                    "source": pa.array(["s"] * len(texts)),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = doc_shingle_df_hist(str(tmp_path)).to_pandas().set_index("df")
        # df=1: "b c d", "b c e" -> 2 shingles; df=2: "a b c" -> 1
        assert got.loc[1, "n_shingles"] == 2
        assert got.loc[2, "n_shingles"] == 1
        assert len(got) == 2


class TestHourOfDay:
    def test_bucketing_and_means(self, ray_session, tmp_path):
        from dynaalign_ray.pipelines.relational import events_hour_of_day

        rows = [
            ("2024-01-01T05:10:00", 1, "a", 1.00),
            ("2024-01-02T05:50:00", 2, "a", 3.00),  # same hour bucket (5)
            ("2024-01-01T23:59:59", 3, "a", 7.00),
        ]
        _write_events(tmp_path, rows)
        got = events_hour_of_day(str(tmp_path)).to_pandas().set_index("hour")
        assert got.loc[5, "n_events"] == 2
        assert got.loc[5, "total_value"] == 4.0
        assert got.loc[5, "avg_value"] == 2.0
        assert got.loc[23, "n_events"] == 1 and got.loc[23, "total_value"] == 7.0
