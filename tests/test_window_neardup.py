"""edge_filter hook (pipelines/neardup.py) + crawl-window-scoped near-dup
(pipelines/webpages.pages_window_neardup)."""

SF = "/root/testdata/sf0.001"


def _clusters(ds):
    return {r["doc_id"]: r["cluster_id"] for r in ds.take_all()}


class TestEdgeFilterHook:
    def test_identity_filter_matches_default(self, ray_session):
        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.pipelines.curation import _docs
        from dynaalign_ray.pipelines.neardup import near_dedup

        cfg = DedupConfig(shingle_k=3)
        base = near_dedup(
            docs_ds=_docs(SF, ["doc_id", "text"]), cfg=cfg, num_partitions=4
        )
        ident = near_dedup(
            docs_ds=_docs(SF, ["doc_id", "text"]),
            cfg=cfg,
            num_partitions=4,
            edge_filter=lambda e: e,
            edge_filter_tag="identity",
        )
        assert _clusters(base.clusters) == _clusters(ident.clusters)

    def test_drop_all_filter_yields_singletons(self, ray_session):
        import pyarrow.compute as pc

        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.pipelines.curation import _docs
        from dynaalign_ray.pipelines.neardup import near_dedup

        res = near_dedup(
            docs_ds=_docs(SF, ["doc_id", "text"]),
            cfg=DedupConfig(shingle_k=3),
            num_partitions=4,
            edge_filter=lambda e: e.map_batches(
                lambda b: b.filter(pc.less(b["jaccard"], -1.0)),
                batch_format="pyarrow",
            ),
            edge_filter_tag="drop_all",
        )
        cl = _clusters(res.clusters)
        assert all(c == d for d, c in cl.items())  # every doc its own cluster


class TestWindowNeardup:
    def test_window_is_a_refinement_and_strict(self, ray_session):
        from dynaalign_ray.pipelines.curation import doc_neardup_clusters
        from dynaalign_ray.pipelines.webpages import pages_window_neardup

        full = _clusters(doc_neardup_clusters(SF, 4))
        win = _clusters(pages_window_neardup(SF, window_snapshots=50,
                                             num_partitions=4))
        assert full.keys() == win.keys()
        # refinement: two docs in one windowed cluster are in one full cluster
        from collections import defaultdict

        members = defaultdict(list)
        for d, c in win.items():
            members[c].append(d)
        for ms in members.values():
            assert len({full[d] for d in ms}) == 1
        # strictness: the 50-step window drops some edges at this sf
        n_full = len(set(full.values()))
        n_win = len(set(win.values()))
        assert n_win > n_full

    def test_huge_window_matches_unrestricted(self, ray_session):
        from dynaalign_ray.pipelines.curation import doc_neardup_clusters
        from dynaalign_ray.pipelines.webpages import pages_window_neardup

        full = _clusters(doc_neardup_clusters(SF, 4))
        win = _clusters(
            pages_window_neardup(SF, window_snapshots=10**9, num_partitions=4)
        )
        assert full == win


class TestIntrahostScope:
    def test_refines_flagship_and_respects_hosts(self, ray_session):
        """Intra-host clusters refine the unscoped flagship clustering
        (dropping edges only splits components) and no cluster spans two
        hosts."""
        from dynaalign_ray.pipelines.curation import doc_neardup_clusters
        from dynaalign_ray.pipelines.webpages import pages_intrahost_neardup

        scoped = pages_intrahost_neardup("/root/testdata/sf0.001").to_pandas()
        base = doc_neardup_clusters("/root/testdata/sf0.001").to_pandas()
        assert len(scoped) == len(base) == 500
        # refinement: docs in the same scoped cluster share a base cluster
        base_of = dict(zip(base["doc_id"], base["cluster_id"]))
        for cid, grp in scoped.groupby("cluster_id"):
            assert len({base_of[d] for d in grp["doc_id"]}) == 1, cid
        # host purity: cluster members share the site index (doc_id//3)%20
        for cid, grp in scoped.groupby("cluster_id"):
            sites = {(int(d) // 3) % 20 for d in grp["doc_id"]}
            assert len(sites) == 1, cid
