"""URL-layer operator tests (pipelines/webpages.py): canonicalization rules
at the unit level, then latest-snapshot dedup and exact per-host distinct-URL
counts against an independent DuckDB oracle over the same derived view."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def rd(ray_session):
    return ray.data


# -------------------------------------------------------------- unit level


class TestCanonicalize:
    def test_rules(self):
        from dynaalign_ray.pipelines.webpages import canonicalize

        urls = pa.array(
            [
                "https://WWW.SiteA.Example/dir1/page-9?utm_source=feed",
                "https://www.sitea.example/dir1/page-9#section-2",
                "https://www.sitea.example/dir1/page-9",
                "https://Host.example/x?a=1#b",
            ]
        )
        canon, host = canonicalize(urls)
        assert canon.to_pylist() == ["https://www.sitea.example/dir1/page-9"] * 3 + [
            "https://host.example/x"
        ]
        assert host.to_pylist() == ["www.sitea.example"] * 3 + ["host.example"]

    def test_derive_pages_deterministic_and_grouped(self):
        from dynaalign_ray.pipelines.webpages import canonicalize, derive_pages

        batch = pa.table({"doc_id": pa.array(np.arange(12, dtype=np.int64))})
        pages = derive_pages(batch)
        canon, _ = canonicalize(pages.column("url"))
        groups = {}
        for d, u in zip(pages.column("doc_id").to_pylist(), canon.to_pylist()):
            groups.setdefault(u, []).append(d)
        # doc_ids 3k..3k+2 share one canonical URL; raw urls differ by suffix
        for u, members in groups.items():
            assert members == sorted(members)
            assert {d // 3 for d in members} == {members[0] // 3}
        raw = pages.column("url").to_pylist()
        assert len(set(raw)) == len(raw)  # suffixes keep raw urls distinct
        ts = pages.column("warc_us").to_pylist()
        assert len(set(ts)) == len(ts)  # unique -> deterministic argmax


# ------------------------------------------------------------ oracle level

_PAGES_SQL = """
    WITH pages AS (
        SELECT doc_id, n_chars,
               'https://WWW.Site' || CAST(((doc_id // 3) % 20) AS VARCHAR)
                 || '.Example/dir' || CAST(((doc_id // 3) % 7) AS VARCHAR)
                 || '/page-' || CAST((doc_id // 3) AS VARCHAR)
                 || CASE (doc_id % 3) WHEN 1 THEN '?utm_source=feed'
                                      WHEN 2 THEN '#section-2' ELSE '' END AS url,
               1704067200000000 + doc_id * 900000000 + (doc_id * 37) % 1000 AS warc_us
        FROM '{sf}/documents.parquet'
    ), canon AS (
        SELECT doc_id, n_chars, url, warc_us,
               regexp_replace(lower(url), '[?#].*$', '') AS canon_url,
               regexp_extract(regexp_replace(lower(url), '[?#].*$', ''),
                              '^https://([^/]+)', 1) AS host
        FROM pages
    )
"""


class TestLatestSnapshot:
    def test_matches_duckdb(self, rd, ray_session):
        from dynaalign_ray.pipelines.webpages import pages_latest_snapshot

        got = {
            r["canon_url"]: (r["doc_id"], r["latest_us"], r["n_snapshots"])
            for r in pages_latest_snapshot(SF, num_partitions=4).take_all()
        }
        want_rows = duckdb.sql(
            _PAGES_SQL.format(sf=SF)
            + """
            SELECT canon_url, arg_max(doc_id, warc_us), max(warc_us), count(*)
            FROM canon GROUP BY canon_url
            """
        ).fetchall()
        want = {u: (d, t, n) for u, d, t, n in want_rows}
        assert got == want
        assert any(n > 1 for _, _, n in got.values())  # revisits planted

    def test_winner_is_newest_member(self, rd, ray_session):
        from dynaalign_ray.pipelines.webpages import pages_latest_snapshot

        for r in pages_latest_snapshot(SF, num_partitions=4).take_all():
            # members of a url group are doc_ids 3k..3k+2; warc_us increases
            # with doc_id, so the winner must be the largest member present
            assert r["doc_id"] % 3 == 2 or r["n_snapshots"] < 3


class TestHostStats:
    def test_matches_duckdb(self, rd, ray_session):
        from dynaalign_ray.pipelines.webpages import pages_host_stats

        got = {
            r["host"]: (r["n_pages"], r["n_urls"], r["total_chars"])
            for r in pages_host_stats(SF, num_partitions=4).take_all()
        }
        want_rows = duckdb.sql(
            _PAGES_SQL.format(sf=SF)
            + """
            SELECT host, count(*), count(DISTINCT canon_url), sum(n_chars)
            FROM canon GROUP BY host
            """
        ).fetchall()
        want = {h: (p, u, c) for h, p, u, c in want_rows}
        assert got == want
        assert all(p >= u for p, u, _ in got.values())


class TestHostCap:
    def test_matches_duckdb_across_blocks(self, rd, ray_session):
        """Hosts span many input blocks; the keyed repartition must make
        block-local ranks global — checked vs ROW_NUMBER over the same
        derived view, including 0 < cap boundary and full-quota hosts."""
        from dynaalign_ray.pipelines.webpages import pages_host_cap

        got = {
            (r["host"], r["doc_id"]): (r["warc_us"], r["host_rank"])
            for r in pages_host_cap(SF, cap=3, num_partitions=4).take_all()
        }
        want_rows = duckdb.sql(
            _PAGES_SQL.format(sf=SF)
            + """
            , ranked AS (
                SELECT host, doc_id, warc_us,
                       row_number() OVER (
                           PARTITION BY host ORDER BY warc_us DESC, doc_id ASC
                       ) AS rk
                FROM canon
            )
            SELECT host, doc_id, warc_us, rk FROM ranked WHERE rk <= 3
            """
        ).fetchall()
        want = {(h, d): (u, rk) for h, d, u, rk in want_rows}
        assert got == want
        # every host emits at most cap rows with contiguous ranks from 1
        by_host: dict[str, list[int]] = {}
        for (h, _d), (_u, rk) in got.items():
            by_host.setdefault(h, []).append(rk)
        for ranks in by_host.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 3


class TestLatestSnapshotPages:
    def test_revisits_collapse_to_newest(self, rd, ray_session):
        """Duplicate a third of the fixture pages with bumped warc_ts; the
        stage must keep exactly the newest snapshot per URL and never touch
        unique-URL rows — and the kept payloads are the bumped ones."""
        import pyarrow.compute as pc

        from dynaalign_ray.fixtures import generate_pages
        from dynaalign_ray.pipelines.webpages import latest_snapshot_pages

        pages, _ = generate_pages(150, seed=42)
        dup = pages.slice(0, 50)
        bumped = dup.set_column(
            dup.column_names.index("warc_ts"),
            "warc_ts",
            pc.add(dup.column("warc_ts").cast(pa.int64()), 86_400_000_000).cast(
                pa.timestamp("us")
            ),
        )
        # mark the bumped copies via lang so winners are identifiable
        bumped = bumped.set_column(
            bumped.column_names.index("lang"), "lang", pa.array(["xx"] * 50)
        )
        both = pa.concat_tables([pages, bumped])
        out = latest_snapshot_pages(
            rd.from_arrow(both).repartition(num_blocks=4), num_partitions=4
        ).take_all()
        assert len(out) == 150  # one row per distinct URL
        by_url = {r["url"]: r for r in out}
        dup_urls = set(dup.column("url").to_pylist())
        for u, r in by_url.items():
            assert r["lang"] == ("xx" if u in dup_urls else r["lang"])
        assert sum(1 for r in out if r["lang"] == "xx") == 50

    def test_ties_keep_all(self, rd, ray_session):
        from dynaalign_ray.fixtures import generate_pages
        from dynaalign_ray.pipelines.webpages import latest_snapshot_pages

        pages, _ = generate_pages(20, seed=1)
        both = pa.concat_tables([pages, pages.slice(0, 5)])  # exact ts ties
        out = latest_snapshot_pages(rd.from_arrow(both), num_partitions=2).take_all()
        assert len(out) == 25  # tied snapshots both kept (documented)

    def test_shuffle_plan_agrees_with_broadcast(self, rd, ray_session):
        """Forcing winner_limit=0 flips to the keyed-shuffle plan; both
        plans must keep exactly the same rows."""
        import pyarrow.compute as pc

        from dynaalign_ray.fixtures import generate_pages
        from dynaalign_ray.pipelines.webpages import latest_snapshot_pages

        pages, _ = generate_pages(120, seed=3)
        dup = pages.slice(0, 40)
        bumped = dup.set_column(
            dup.column_names.index("warc_ts"),
            "warc_ts",
            pc.add(dup.column("warc_ts").cast(pa.int64()), 1_000_000).cast(
                pa.timestamp("us")
            ),
        )
        both = pa.concat_tables([pages, bumped, pages.slice(50, 10)])  # + ties
        key = lambda r: (r["url"], r["warc_ts"])
        a = sorted(
            map(key, latest_snapshot_pages(rd.from_arrow(both), num_partitions=3).take_all())
        )
        b = sorted(
            map(
                key,
                latest_snapshot_pages(
                    rd.from_arrow(both), num_partitions=3, winner_limit=0
                ).take_all(),
            )
        )
        assert a == b and len(a) == 130  # 120 urls + 10 tied duplicates


class TestCrawlDiff:
    def test_statuses_partition_urls(self, ray_session):
        from dynaalign_ray.pipelines.webpages import (
            pages_crawl_diff,
            pages_latest_snapshot,
        )

        diff = pages_crawl_diff("/root/testdata/sf0.001").to_pandas()
        latest = pages_latest_snapshot("/root/testdata/sf0.001").to_pandas()
        # one row per canonical URL, same universe as latest-snapshot
        assert sorted(diff["canon_url"]) == sorted(latest["canon_url"])
        assert set(diff["status"]) <= {"added", "changed", "same"}
        # 'added' iff single snapshot
        single = set(latest.loc[latest["n_snapshots"] == 1, "canon_url"])
        assert set(diff.loc[diff["status"] == "added", "canon_url"]) == single
        # latest doc ids agree with the latest-snapshot query
        l_map = dict(zip(latest["canon_url"], latest["doc_id"]))
        for u, d in zip(diff["canon_url"], diff["doc_id_latest"]):
            assert l_map[u] == d

    def test_same_means_equal_text(self, ray_session):
        import duckdb

        from dynaalign_ray.pipelines.webpages import pages_crawl_diff

        diff = pages_crawl_diff("/root/testdata/sf0.001").to_pandas()
        texts = dict(
            duckdb.sql(
                "SELECT doc_id, text FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')"
            ).fetchall()
        )
        checked = 0
        for _, r in diff[diff["status"] != "added"].iterrows():
            same = texts[r["doc_id_latest"]] == texts[int(r["doc_id_prev"])]
            assert same == (r["status"] == "same"), r["canon_url"]
            checked += 1
        assert checked > 0
