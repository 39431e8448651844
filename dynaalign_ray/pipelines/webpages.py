"""URL-shaped web-page operators over the Common-Crawl-style page table
(BASELINE.json ``input_hint``: pages(url, warc_ts, html, text, lang)).

The driver testdata ships a ``documents`` table without url/warc_ts columns,
so every query here first derives a deterministic ``pages`` view from
``documents`` with pure integer/string arithmetic — the oracle SQL in
``__ray_entry__`` derives the *same* view with the same expressions, so the
operators themselves are DuckDB-hash-exact.  The derivation plants the two
skews the operators must handle: ~3 snapshots per URL (crawl revisits) and
raw-URL noise (mixed case, tracking query strings, fragments) that only
canonicalization collapses.

Operators (all map_batches over zero-copy Arrow; wide shuffles carry narrow
derived columns only):

- ``pages_url_canonical``  — map-only URL normalization (lowercase + strip
  query/fragment) and host extraction, RE2 kernels in C.
- ``pages_latest_snapshot`` — keep the newest crawl snapshot per canonical
  URL (the Common-Crawl "latest segment wins" dedup tier that runs BEFORE
  any content dedup).  Keyed repartition by canon_url + one per-block sort
  and segment-last gather; never a global sort.
- ``pages_host_stats``     — per-host page/url/char totals with an EXACT
  distinct-URL count: canon_url-keyed repartition makes local distinct ==
  global distinct (host is a function of canon_url, so every (host, url)
  pair lands whole in one block), then a tiny sum-of-partials groupby.

Reference parity: the reference (syl051088/DynaAlign) has no URL layer —
its inputs are peptide strings — so these are engine additions required by
the north star's web-page input shape, built on the same keyed-repartition
+ local-Arrow-group_by skeleton as stages/dedup.py.
"""

from __future__ import annotations

from dynaalign_ray.exec import broadcast_put

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- shared derivation constants (mirrored verbatim in __ray_entry__ SQL)
_WARC_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
_SNAPSHOT_STEP_US = 900_000_000  # 15 min between successive doc_ids
_SUFFIXES = np.array(["", "?utm_source=feed", "#section-2"])

_CANON_STRIP_RE = r"[?#].*$"
_HOST_RE = r"^https://(?P<host>[^/]+)"


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    from dynaalign_ray.exec import configure_context

    configure_context()
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def derive_pages(batch: pa.Table) -> pa.Table:
    """documents(doc_id, n_chars, ...) -> pages(doc_id, url, warc_us, n_chars).

    Deterministic: url_key = doc_id // 3 (so ~3 raw snapshots share one
    canonical URL), site/dir from url_key, raw-URL suffix cycles through
    clean / tracking-query / fragment forms, warc_us strictly increases with
    doc_id (unique — argmax-by-time is deterministic).
    """
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    key = ids // 3
    site = pc.cast(pa.array(key % 20), pa.string())
    dirno = pc.cast(pa.array(key % 7), pa.string())
    keystr = pc.cast(pa.array(key), pa.string())
    suffix = pa.array(_SUFFIXES[ids % 3], type=pa.string())
    url = pc.binary_join_element_wise(
        "https://WWW.Site", site, ".Example/dir", dirno, "/page-", keystr, suffix, ""
    )
    warc_us = _WARC_BASE_US + ids * _SNAPSHOT_STEP_US + (ids * 37) % 1000
    cols = {
        "doc_id": pa.array(ids),
        "url": url,
        "warc_us": pa.array(warc_us, type=pa.int64()),
    }
    if "n_chars" in batch.column_names:
        cols["n_chars"] = batch.column("n_chars")
    return pa.table(cols)


def canonicalize(url: pa.ChunkedArray | pa.Array):
    """lowercase + strip query/fragment -> (canon_url, host), RE2 in C."""
    canon = pc.replace_substring_regex(
        pc.utf8_lower(url), pattern=_CANON_STRIP_RE, replacement=""
    )
    host = pc.struct_field(pc.extract_regex(canon, _HOST_RE), "host")
    return canon, host


def _add_canon(batch: pa.Table) -> pa.Table:
    canon, host = canonicalize(batch.column("url"))
    return batch.append_column("canon_url", canon).append_column("host", host)


def _add_route(batch: pa.Table, key: str = "canon_url") -> pa.Table:
    """Route-only int63 hash of a string key: the hash PLACES rows, exact
    string comparison inside the block delimits groups (hash injectivity is
    never a correctness dependency — same discipline as doc_top_by_source)."""
    from dynaalign_ray.hashing import hash_strings, to_id63

    h = to_id63(hash_strings(batch.column(key).to_pylist()))
    return batch.append_column("route", pa.array(h, type=pa.int64()))


def pages_url_canonical(sf_dir: str):
    """Map-only: (doc_id, url, canon_url, host) — URL normalization."""

    def kern(batch: pa.Table) -> pa.Table:
        pages = derive_pages(batch)
        canon, host = canonicalize(pages.column("url"))
        return pa.table(
            {
                "doc_id": pages.column("doc_id"),
                "url": pages.column("url"),
                "canon_url": canon,
                "host": host,
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(
        kern, batch_format="pyarrow", zero_copy_batch=True
    )


def pages_latest_snapshot(sf_dir: str, num_partitions: int = 8):
    """Latest-crawl-wins URL dedup: one row per canonical URL carrying the
    newest snapshot's doc_id, its warc_us, and the snapshot count.

    Plan: derive (doc_id, canon_url, warc_us) in the map stage (3 narrow
    columns shuffle, never text/html), keyed repartition by hash(canon_url),
    then per whole block ONE Arrow sort by (canon_url, warc_us) and a
    vectorized segment-last gather.  warc_us is unique by construction so
    the winner is deterministic without a tiebreak column.
    """
    out_schema = pa.schema(
        [
            ("canon_url", pa.string()),
            ("doc_id", pa.int64()),
            ("latest_us", pa.int64()),
            ("n_snapshots", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        pages = derive_pages(batch)
        canon, _ = canonicalize(pages.column("url"))
        t = pa.table(
            {
                "doc_id": pages.column("doc_id"),
                "canon_url": canon,
                "warc_us": pages.column("warc_us"),
            }
        )
        return _add_route(t)

    def latest_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(
            b, sort_keys=[("canon_url", "ascending"), ("warc_us", "ascending")]
        )
        s = b.take(idx)
        urls = s.column("canon_url").combine_chunks()
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.chunk(0)
        codes = np.asarray(urls.dictionary_encode().indices, dtype=np.int64)
        n = len(codes)
        # segment ends = positions where the NEXT row starts a new url
        is_last = np.ones(n, dtype=bool)
        is_last[:-1] = codes[1:] != codes[:-1]
        last_pos = np.flatnonzero(is_last)
        first_pos = np.concatenate([[0], last_pos[:-1] + 1])
        kept = s.take(pa.array(last_pos))
        return pa.table(
            {
                "canon_url": kept.column("canon_url"),
                "doc_id": kept.column("doc_id"),
                "latest_us": kept.column("warc_us"),
                "n_snapshots": pa.array(last_pos - first_pos + 1, type=pa.int64()),
            },
            schema=out_schema,
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["route"])
        .map_batches(
            latest_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def pages_host_stats(sf_dir: str, num_partitions: int = 8):
    """Per-host (n_pages, EXACT n_urls distinct, total_chars).

    Exactness argument for the distinct count: rows are repartitioned by
    canon_url and host = f(canon_url), so all copies of a (host, canon_url)
    pair are in exactly one block — each block's local distinct-URL count is
    disjoint from every other block's, and the final per-host sum of partials
    is the exact global COUNT(DISTINCT canon_url).  The shuffle carries
    (canon_url, host, n_chars) partials, never page payloads; the final
    groupby sees one partial row per (block, host).
    """
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        pages = derive_pages(batch)
        canon, host = canonicalize(pages.column("url"))
        t = pa.table(
            {
                "canon_url": canon,
                "host": host,
                "n_chars": pages.column("n_chars"),
            }
        )
        return _add_route(t)

    partial_schema = pa.schema(
        [
            ("host", pa.string()),
            ("n_pages", pa.int64()),
            ("n_urls", pa.int64()),
            ("total_chars", pa.int64()),
        ]
    )

    def host_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return partial_schema.empty_table()
        per_url = b.group_by(["host", "canon_url"]).aggregate(
            [("n_chars", "sum"), ([], "count_all")]
        )
        per_host = per_url.group_by("host").aggregate(
            [("n_chars_sum", "sum"), ("count_all", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "host": per_host.column("host"),
                "n_pages": pc.cast(per_host.column("count_all_sum"), pa.int64()),
                "n_urls": pc.cast(per_host.column("count_all"), pa.int64()),
                "total_chars": pc.cast(per_host.column("n_chars_sum_sum"), pa.int64()),
            },
            schema=partial_schema,
        )

    partials = (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["route"])
        .map_batches(
            host_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return partials.groupby("host", num_partitions=num_partitions).aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_urls", alias_name="n_urls"),
        Sum("total_chars", alias_name="total_chars"),
    )


def pages_host_cap(sf_dir: str, cap: int = 5, num_partitions: int = 8):
    """Per-host page quota — the standard crawl-curation guard against a
    single host dominating the corpus: keep the newest ``cap`` pages per
    host (order warc_us DESC, doc_id ASC — a total order, so the kept set
    is deterministic and SQL-reproducible).

    Plan: derive (doc_id, host, warc_us) in the map stage (3 narrow
    columns shuffle, never text/html), keyed repartition by hash(host) so
    every host's rows land in exactly one block, then per block ONE Arrow
    sort + a vectorized within-segment rank; block-local ranks ARE global
    ranks because hosts never span blocks.  Output rows are bounded by
    cap x #hosts regardless of corpus size.
    """
    out_schema = pa.schema(
        [
            ("host", pa.string()),
            ("doc_id", pa.int64()),
            ("warc_us", pa.int64()),
            ("host_rank", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        pages = derive_pages(batch)
        _, host = canonicalize(pages.column("url"))
        t = pa.table(
            {
                "doc_id": pages.column("doc_id"),
                "host": host,
                "warc_us": pages.column("warc_us"),
            }
        )
        return _add_route(t, key="host")

    def cap_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        hosts = b.column("host").combine_chunks()
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.chunk(0)
        # grouping key only (within-host order is what matters; the output
        # compare is order-insensitive), so dictionary codes beat string sort
        host = np.asarray(hosts.dictionary_encode().indices, dtype=np.int64)
        us = np.asarray(b.column("warc_us")).astype(np.int64)
        did = np.asarray(b.column("doc_id")).astype(np.int64)
        order = np.lexsort((did, -us, host))
        hs = host[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        rank = np.arange(len(hs)) - np.repeat(
            starts, np.diff(np.append(starts, len(hs)))
        )
        keep = rank < cap
        kept = b.take(pa.array(order[keep]))
        return pa.table(
            {
                "host": kept.column("host"),
                "doc_id": kept.column("doc_id"),
                "warc_us": pc.cast(kept.column("warc_us"), pa.int64()),
                "host_rank": pa.array(rank[keep] + 1, type=pa.int64()),
            },
            schema=out_schema,
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["route"])
        .map_batches(
            cap_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def latest_snapshot_pages(
    pages_ds,
    num_partitions: int = 8,
    canonicalize_urls: bool = True,
    winner_limit: int = 200_000_000,
):
    """Crawl-revisit URL dedup over a full pages Dataset: keep only each
    (canonical) URL's newest snapshot — the tier that runs BEFORE content
    dedup on recrawled corpora.

    Two-pass so html/text payloads NEVER enter a shuffle:

    - PASS 1 (narrow): per block, local (url_id, max warc_us) partials —
      the combiner — then ONE keyed repartition of (url_id, us) pairs and a
      block max; the winner map (two int64 arrays, 16 B per distinct URL)
      is ``ray.put`` once.
    - PASS 2 (map-only): every pages block keeps rows whose
      (url_id, warc_us) matches the winner map via searchsorted.

    URL identity is ``doc_id_from_urls`` (the engine-wide int63 url->id
    mapping used by extract_text_batch, so this stage's identity semantics
    equal the flagship's).  Ties on warc_us keep all tied rows (no
    arbitrary winner).  Size gate: beyond ``winner_limit`` distinct URLs
    (16 B each — default ~3.2 GB) the broadcast map no longer fits a
    worker heap and the plan flips to the keyed-shuffle form
    (:func:`_latest_snapshot_shuffle`), which repartitions full page rows
    by url hash and takes the per-URL segment max inside each block —
    payloads do cross the exchange there, the unavoidable cost of the
    10^10+-URL regime.
    """
    import ray

    from dynaalign_ray.hashing import doc_id_from_urls

    def _url_ids(batch: pa.Table) -> np.ndarray:
        urls = batch.column("url")
        if canonicalize_urls:
            urls, _ = canonicalize(urls)
        return doc_id_from_urls(urls.to_pylist())

    def partial_max(batch: pa.Table) -> pa.Table:
        ids = _url_ids(batch)
        us = np.asarray(batch.column("warc_ts").cast(pa.int64()))
        t = pa.table(
            {"url_id": pa.array(ids, type=pa.int64()), "us": pa.array(us, type=pa.int64())}
        )
        g = t.group_by("url_id").aggregate([("us", "max")])
        return pa.table({"url_id": g.column("url_id"), "us": g.column("us_max")})

    def block_max(b: pa.Table) -> pa.Table:
        g = b.group_by("url_id").aggregate([("us", "max")])
        return pa.table({"url_id": g.column("url_id"), "us": g.column("us_max")})

    winners = (
        pages_ds.select_columns(["url", "warc_ts"])
        .map_batches(partial_max, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["url_id"])
        .map_batches(
            block_max, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    parts = [t for t in (ray.get(r) for r in winners.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return pages_ds
    wt = pa.concat_tables(parts)
    if wt.num_rows > winner_limit:
        return _latest_snapshot_shuffle(pages_ds, num_partitions, canonicalize_urls)
    ids = np.asarray(wt.column("url_id")).astype(np.int64)
    us = np.asarray(wt.column("us")).astype(np.int64)
    order = np.argsort(ids)
    winner_ref = broadcast_put((ids[order], us[order]))

    def keep_latest(batch: pa.Table) -> pa.Table:
        wids, wus = ray.get(winner_ref)
        ids = _url_ids(batch)
        mine = np.asarray(batch.column("warc_ts").cast(pa.int64()))
        pos = np.searchsorted(wids, ids)
        keep = mine == wus[pos]
        return batch.filter(pa.array(keep))

    return pages_ds.map_batches(keep_latest, batch_format="pyarrow", zero_copy_batch=True)


def _latest_snapshot_shuffle(pages_ds, num_partitions: int, canonicalize_urls: bool):
    """Keyed-shuffle plan for latest_snapshot_pages past broadcast scale:
    route full page rows by url_id, then inside each block keep rows whose
    warc_us equals their URL's max (ties keep all — same semantics as the
    broadcast plan; URLs are delimited by exact url_id compare, and url_id
    is the engine-wide identity, so the two plans agree row-for-row)."""
    import ray  # noqa: F401  (parity with the broadcast plan's imports)

    from dynaalign_ray.hashing import doc_id_from_urls

    def add_key(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        if canonicalize_urls:
            urls, _ = canonicalize(urls)
        ids = doc_id_from_urls(urls.to_pylist())
        return batch.append_column("url_id", pa.array(ids, type=pa.int64()))

    def keep_block_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["url_id"])
        ids = np.asarray(b.column("url_id")).astype(np.int64)
        us = np.asarray(b.column("warc_ts").cast(pa.int64()))
        order = np.lexsort((us, ids))
        sids, sus = ids[order], us[order]
        # per-segment max broadcast down the segment (last element of each
        # url_id run after the (id, us) lexsort is that URL's max)
        is_last = np.ones(len(sids), dtype=bool)
        is_last[:-1] = sids[1:] != sids[:-1]
        last_pos = np.flatnonzero(is_last)
        seg_id = np.cumsum(np.concatenate([[True], sids[1:] != sids[:-1]])) - 1
        max_per_seg = sus[last_pos]
        keep_sorted = sus == max_per_seg[seg_id]
        keep = np.empty(len(ids), dtype=bool)
        keep[order] = keep_sorted
        return b.filter(pa.array(keep)).drop_columns(["url_id"])

    return (
        pages_ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["url_id"])
        .map_batches(
            keep_block_max, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )


class _BlocklistFilter:
    """Actor-pool stage holding the (potentially multi-million-entry) host
    blocklist: ``ray.put`` once, fetched per actor in __init__ as an Arrow
    value_set for the C++ ``is_in`` kernel — never re-shipped per batch."""

    def __init__(self, blocked_ref):
        import ray

        blocked = (
            ray.get(blocked_ref)
            if isinstance(blocked_ref, ray.ObjectRef)
            else blocked_ref
        )
        self.value_set = pa.array(sorted(blocked), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages = derive_pages(batch)
        canon, host = canonicalize(pages.column("url"))
        keep = pc.invert(pc.is_in(host, value_set=self.value_set))
        return pa.table(
            {
                "doc_id": pages.column("doc_id"),
                "canon_url": canon,
                "host": host,
            }
        ).filter(keep)


def pages_blocklist_filter(sf_dir: str, blocked: tuple = ("www.site3.example", "www.site7.example", "www.site13.example")):
    """Domain-blocklist page filter — the URL-level pre-tier every crawl
    pipeline runs before any payload work: drop every page whose canonical
    host is on the blocklist.  The blocklist is a broadcast keyset (one
    ray.put, per-actor fetch, vectorized Arrow is_in); pages never shuffle."""
    import ray

    from dynaalign_ray.exec import broadcast_put

    blocked_ref = broadcast_put(list(blocked))
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return _docs(sf_dir, ["doc_id"]).map_batches(
        _BlocklistFilter,
        fn_constructor_kwargs={"blocked_ref": blocked_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(2, max(2, ncpu // 2)),
    )


def pages_window_neardup(
    sf_dir: str, window_snapshots: int = 50, num_partitions: int = 8
):
    """Crawl-window-scoped near-dup clustering: verified near-dup edges
    (exact Jaccard >= tau) may merge two snapshots ONLY if their WARC
    timestamps lie within ``window_snapshots`` steps of each other — the
    standard inter-crawl dedup constraint (dedupe within a crawl window,
    keep re-crawls from distant crawls as separate documents).

    Mechanism: the flagship pipeline's ``edge_filter`` hook.  The page
    timestamp table is corpus-sized, so it is NEVER broadcast: each edge
    endpoint gets its timestamp through a narrow partitioned hash join
    (edges carry 3 int64/float64 columns; the ts side 2 int64), then one
    vectorized predicate drops out-of-window edges before clustering.
    The unfiltered verified-edge set is untouched upstream (this is a
    clustering SCOPE, not a different similarity)."""
    import pyarrow.compute as pc

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.joins import hash_join
    from dynaalign_ray.pipelines.neardup import near_dedup

    window_us = window_snapshots * _SNAPSHOT_STEP_US

    def _ts(colname: str):
        def kern(batch: pa.Table) -> pa.Table:
            pages = derive_pages(batch)
            return pa.table(
                {
                    "doc_id": pages.column("doc_id"),
                    colname: pages.column("warc_us"),
                }
            )

        return _docs(sf_dir, ["doc_id"]).map_batches(
            kern, batch_format="pyarrow", zero_copy_batch=True
        )

    def edge_filter(edges):
        e1 = hash_join(
            edges,
            _ts("ts_a"),
            left_on="a",
            right_on="doc_id",
            left_schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
            ),
            right_schema=pa.schema(
                [("doc_id", pa.int64()), ("ts_a", pa.int64())]
            ),
            num_partitions=num_partitions,
        )
        e2 = hash_join(
            e1,
            _ts("ts_b"),
            left_on="b",
            right_on="doc_id",
            left_schema=pa.schema(
                [
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("jaccard", pa.float64()),
                    ("ts_a", pa.int64()),
                ]
            ),
            right_schema=pa.schema(
                [("doc_id", pa.int64()), ("ts_b", pa.int64())]
            ),
            num_partitions=num_partitions,
        )

        def in_window(batch: pa.Table) -> pa.Table:
            d = pc.abs(
                pc.subtract(batch.column("ts_a"), batch.column("ts_b"))
            )
            return batch.filter(
                pc.less_equal(d, pa.scalar(window_us, pa.int64()))
            ).select(["a", "b", "jaccard"])

        return e2.map_batches(
            in_window, batch_format="pyarrow", zero_copy_batch=True
        )

    res = near_dedup(
        docs_ds=_docs(sf_dir, ["doc_id", "text"]),
        cfg=DedupConfig(shingle_k=3),
        num_partitions=num_partitions,
        edge_filter=edge_filter,
        edge_filter_tag=f"warc_window_us:{window_us}",
    )
    return res.clusters.select_columns(["doc_id", "cluster_id", "keep"])


def pages_intrahost_neardup(sf_dir: str, num_partitions: int = 8):
    """Intra-host (per-site) near-dup clustering: verified near-dup edges
    may merge two pages ONLY when they live on the same host — the
    site-level dedup scope (boilerplate shared ACROSS sites must not
    chain sites into one cluster; within a site it should).

    Same ``edge_filter`` mechanism as :func:`pages_window_neardup`, with
    the endpoint attribute being the host STRING (joined on, compared
    with exact string equality — never by hash, per the repo's
    no-injectivity-dependence discipline)."""
    import pyarrow.compute as pc

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.joins import hash_join
    from dynaalign_ray.pipelines.neardup import near_dedup

    def _host(colname: str):
        def kern(batch: pa.Table) -> pa.Table:
            pages = derive_pages(batch)
            _, host = canonicalize(pages.column("url"))
            return pa.table(
                {"doc_id": pages.column("doc_id"), colname: host}
            )

        return _docs(sf_dir, ["doc_id"]).map_batches(
            kern, batch_format="pyarrow", zero_copy_batch=True
        )

    def edge_filter(edges):
        e1 = hash_join(
            edges,
            _host("host_a"),
            left_on="a",
            right_on="doc_id",
            left_schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
            ),
            right_schema=pa.schema(
                [("doc_id", pa.int64()), ("host_a", pa.string())]
            ),
            num_partitions=num_partitions,
        )
        e2 = hash_join(
            e1,
            _host("host_b"),
            left_on="b",
            right_on="doc_id",
            left_schema=pa.schema(
                [
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("jaccard", pa.float64()),
                    ("host_a", pa.string()),
                ]
            ),
            right_schema=pa.schema(
                [("doc_id", pa.int64()), ("host_b", pa.string())]
            ),
            num_partitions=num_partitions,
        )

        def same_host(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(batch.column("host_a"), batch.column("host_b"))
            ).select(["a", "b", "jaccard"])

        return e2.map_batches(
            same_host, batch_format="pyarrow", zero_copy_batch=True
        )

    res = near_dedup(
        docs_ds=_docs(sf_dir, ["doc_id", "text"]),
        cfg=DedupConfig(shingle_k=3),
        num_partitions=num_partitions,
        edge_filter=edge_filter,
        edge_filter_tag="same_host",
    )
    return res.clusters.select_columns(["doc_id", "cluster_id", "keep"])


def pages_crawl_diff(sf_dir: str, num_partitions: int = 8):
    """Crawl-over-crawl diff per canonical URL: compare the LATEST snapshot
    against the PREVIOUS one — status 'added' (single snapshot), 'changed'
    (texts differ) or 'same' (byte-identical revisit).  The crawl-
    maintenance primitive: 'changed' urls need re-processing downstream,
    'same' ones are revisit noise.

    Plan: derive (doc_id, canon_url, warc_us) in the map stage (narrow
    shuffle, never text), keyed repartition by hash(canon_url), one sorted
    segment-gather per block for the (latest, previous) snapshot pair,
    then TWO narrow hash joins fetch exactly the two candidate texts per
    URL for an exact string comparison — payloads never shuffle with the
    snapshots, and 'same' is decided by STRING equality, not hash equality
    (repo discipline: exactness never depends on hash injectivity)."""
    import functools

    from dynaalign_ray.joins import hash_join

    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    pages = docs.map_batches(
        derive_pages, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_add_canon, batch_format="pyarrow", zero_copy_batch=True)

    def project(batch: pa.Table) -> pa.Table:
        return _add_route(
            batch.select(["doc_id", "canon_url", "warc_us"]), key="canon_url"
        )

    def last_two_block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("canon_url", pa.string()),
                ("doc_id_latest", pa.int64()),
                ("doc_id_prev", pa.int64()),
            ]
        )
        if b.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(
            b, sort_keys=[("canon_url", "ascending"), ("warc_us", "ascending")]
        )
        s = b.take(idx)
        url = s.column("canon_url").combine_chunks()
        if isinstance(url, pa.ChunkedArray):
            url = url.chunk(0) if url.num_chunks else pa.array([], pa.string())
        codes = np.asarray(url.dictionary_encode().indices, dtype=np.int64)
        ids = np.asarray(s.column("doc_id")).astype(np.int64)
        n = len(codes)
        last = np.ones(n, dtype=bool)
        last[:-1] = codes[1:] != codes[:-1]
        ends = np.flatnonzero(last)
        starts = np.empty(len(ends), dtype=np.int64)
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
        latest = ids[ends]
        has_prev = ends > starts
        prev = np.where(has_prev, ids[np.maximum(ends - 1, 0)], 0)
        return pa.table(
            {
                "canon_url": url.take(pa.array(ends)),
                "doc_id_latest": pa.array(latest, type=pa.int64()),
                "doc_id_prev": pa.array(
                    prev, type=pa.int64(), mask=~has_prev
                ),
            },
            schema=out_schema,
        )

    pairs = (
        pages.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["route"])
        .map_batches(
            last_two_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # consumed twice (added split + join branch) — one
        # derivation + shuffle pass, not two
    )

    def split_added(batch: pa.Table) -> pa.Table:
        keep = pc.is_null(batch.column("doc_id_prev"))
        added = batch.filter(keep)
        return pa.table(
            {
                "canon_url": added.column("canon_url"),
                "doc_id_latest": added.column("doc_id_latest"),
                "doc_id_prev": added.column("doc_id_prev"),
                "status": pa.array(["added"] * added.num_rows, pa.string()),
            }
        )

    def split_pairs(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("doc_id_prev")))

    added = pairs.map_batches(
        split_added, batch_format="pyarrow", zero_copy_batch=True
    )
    with_prev = pairs.map_batches(
        split_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    texts = _docs(sf_dir, ["doc_id", "text"])
    pair_schema = pa.schema(
        [
            ("canon_url", pa.string()),
            ("doc_id_latest", pa.int64()),
            ("doc_id_prev", pa.int64()),
        ]
    )
    text_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def _txt(name):
        def proj(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b.column("doc_id"), name: b.column("text")})

        return texts.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)

    j1 = hash_join(
        with_prev,
        _txt("text_l"),
        left_on="doc_id_latest",
        right_on="doc_id",
        left_schema=pair_schema,
        right_schema=pa.schema([("doc_id", pa.int64()), ("text_l", pa.string())]),
        num_partitions=num_partitions,
    )
    j1_schema = pa.schema(
        list(pair_schema) + [pa.field("text_l", pa.string())]
    )
    j2 = hash_join(
        j1,
        _txt("text_p"),
        left_on="doc_id_prev",
        right_on="doc_id",
        left_schema=j1_schema,
        right_schema=pa.schema([("doc_id", pa.int64()), ("text_p", pa.string())]),
        num_partitions=num_partitions,
    )

    def decide(b: pa.Table) -> pa.Table:
        same = pc.equal(b.column("text_l"), b.column("text_p"))
        status = pc.if_else(same, pa.scalar("same"), pa.scalar("changed"))
        return pa.table(
            {
                "canon_url": b.column("canon_url"),
                "doc_id_latest": b.column("doc_id_latest"),
                "doc_id_prev": b.column("doc_id_prev"),
                "status": status,
            }
        )

    return added.union(
        j2.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True)
    )


def pages_warc_roundtrip(sf_dir: str, num_partitions: int = 4):
    """WARC container roundtrip under the driver (sources/warc.py): the
    standard derived pages (same url/warc_us synthesis as every pages_*
    query; html = a fixed 26-byte wrapper around the doc text) are
    written as record-per-member ``.warc.gz`` shards under /tmp, read
    back through :func:`dynaalign_ray.sources.warc.read_warc`, and
    verified per page against the pre-write bytes through one int63-
    routed hash join (string equality re-checked in-block — the
    route-only-hash discipline).  Output (url, warc_us, html_len,
    html_match); the oracle mirrors url/warc_us/html_len arithmetic in
    SQL and pins html_match TRUE, so any writer or parser defect —
    missed record, truncated body, date drift, byte corruption —
    hash-mismatches at the driver.  Shard files are deterministic bytes
    at deterministic names, so concurrent or repeated runs rewrite
    identical content."""
    import os

    from dynaalign_ray.hashing import hash_strings, to_id63
    from dynaalign_ray.joins import collect_arrow, hash_join
    from dynaalign_ray.sources.warc import read_warc, write_warc

    out_dir = f"/tmp/dynaalign_warc_rt/{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(out_dir, exist_ok=True)

    def derive_with_html(batch: pa.Table) -> pa.Table:
        pages = derive_pages(batch)
        html = pc.binary_join_element_wise(
            "<html><body>", batch.column("text"), "</body></html>", ""
        )
        return pages.append_column("html", html.cast(pa.binary()))

    expected = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        derive_with_html, batch_format="pyarrow", zero_copy_batch=True
    )

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        path = os.path.join(out_dir, f"part-{int(ids.min()):012d}.warc.gz")
        write_warc(
            pa.table(
                {
                    "url": batch.column("url"),
                    "warc_ts": pc.cast(
                        batch.column("warc_us"), pa.timestamp("us")
                    ),
                    "html": batch.column("html"),
                }
            ),
            path,
        )
        return pa.table({"path": pa.array([path], pa.string())})

    paths_t = collect_arrow(
        expected.map_batches(
            write_shard, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    paths = sorted(paths_t.column("path").to_pylist())

    def key_parsed(b: pa.Table) -> pa.Table:
        urls = b.column("url")
        return pa.table(
            {
                "ukey": pa.array(
                    to_id63(hash_strings(urls.to_pylist())), pa.int64()
                ),
                "url_p": urls,
                "warc_us_p": b.column("warc_ts").cast(pa.int64()),
                "html_p": b.column("html"),
            }
        )

    def key_expected(b: pa.Table) -> pa.Table:
        urls = b.column("url")
        return pa.table(
            {
                "ukey": pa.array(
                    to_id63(hash_strings(urls.to_pylist())), pa.int64()
                ),
                "url_e": urls,
                "warc_us_e": b.column("warc_us"),
                "html_e": b.column("html"),
            }
        )

    parsed_k = read_warc(paths).map_batches(
        key_parsed, batch_format="pyarrow", zero_copy_batch=True
    )
    expected_k = expected.map_batches(
        key_expected, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(
        parsed_k,
        expected_k,
        left_on="ukey",
        right_on="ukey",
        left_schema=pa.schema(
            [
                ("ukey", pa.int64()),
                ("url_p", pa.string()),
                ("warc_us_p", pa.int64()),
                ("html_p", pa.binary()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("ukey", pa.int64()),
                ("url_e", pa.string()),
                ("warc_us_e", pa.int64()),
                ("html_e", pa.binary()),
            ]
        ),
        num_partitions=num_partitions,
    )

    def verify(b: pa.Table) -> pa.Table:
        # the route hash placed rows; exact string equality delimits the
        # real match (a cross-url hash collision must not pass silently)
        same_url = pc.equal(b.column("url_p"), b.column("url_e"))
        t = b.filter(same_url)
        match = pc.and_(
            pc.equal(t.column("html_p"), t.column("html_e")),
            pc.equal(t.column("warc_us_p"), t.column("warc_us_e")),
        )
        return pa.table(
            {
                "url": t.column("url_p"),
                "warc_us": t.column("warc_us_p"),
                "html_len": pc.cast(
                    pc.binary_length(t.column("html_p")), pa.int64()
                ),
                "html_match": match,
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
