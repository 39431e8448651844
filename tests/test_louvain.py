"""Louvain modularity backend — the reference louvain_mod analog
(R/clusterbreak.R:37-67): greedy-modularity correctness on known graphs,
grid search, determinism, and the netcluster cluster_fn injection."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.stages.louvain import (
    louvain_communities,
    louvain_mod,
    make_louvain_backend,
    modularity,
)


def _two_cliques(k=5):
    a, b = [], []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                a.append(base + i)
                b.append(base + j)
    a.append(k - 1)
    b.append(k)  # bridge
    return np.array(a, dtype=np.int64), np.array(b, dtype=np.int64)


class TestLouvainCommunities:
    def test_two_cliques_split_at_bridge(self):
        a, b = _two_cliques()
        lab = louvain_communities(a, b)
        assert set(lab[:5]) == {0} and set(lab[5:]) == {5}

    def test_ring_of_triangles(self):
        # classic Louvain fixture: 6 triangles in a ring -> 6 communities
        a, b = [], []
        n_tri = 6
        for t in range(n_tri):
            base = 3 * t
            a += [base, base, base + 1, base + 2]
            b += [base + 1, base + 2, base + 2, (base + 3) % (3 * n_tri)]
        lab = louvain_communities(np.array(a), np.array(b))
        assert len(set(lab.tolist())) == n_tri
        for t in range(n_tri):
            assert len(set(lab[3 * t : 3 * t + 3].tolist())) == 1

    def test_modularity_beats_singletons_and_matches_known_value(self):
        a, b = _two_cliques()
        w = np.ones(len(a))
        lab = louvain_communities(a, b)
        q = modularity(a, b, w, lab, 10)
        q0 = modularity(a, b, w, np.arange(10), 10)
        assert q > q0
        # 2x K5 + one bridge: Q = 2*(10/21 - (21/42)^2) = 20/21 - 1/2
        assert abs(q - (20 / 21 - 0.5)) < 1e-9

    def test_deterministic(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 60, 300).astype(np.int64)
        b = rng.integers(0, 60, 300).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        l1 = louvain_communities(a, b)
        l2 = louvain_communities(a, b)
        assert np.array_equal(l1, l2)

    def test_labels_are_component_min_convention(self):
        a, b = _two_cliques()
        lab = louvain_communities(a, b)
        for c in set(lab.tolist()):
            members = np.flatnonzero(lab == c)
            assert c == members.min()

    def test_weighted_edges_respected(self):
        # a triangle where one edge is heavy: at γ=1.5 the heavy pair
        # merges (ΔQ = 0.980 - 0.490γ > 0) while the light third node
        # stays out (ΔQ = 0.0196 - 0.0194γ < 0).  The UNWEIGHTED triangle
        # merges at γ=1 (ΔQ = 1/3 - 2/9 > 0); at γ=1.5 its gain is
        # exactly 0 (1/3 - 1/3), so no move — strict-positive-gain rule.
        a = np.array([0, 0, 1])
        b = np.array([1, 2, 2])
        w = np.array([10.0, 0.1, 0.1])
        lab = louvain_communities(a, b, w, resolution=1.5)
        assert lab[0] == lab[1] != lab[2]
        lab_uw = louvain_communities(a, b, resolution=1.0)
        assert len(set(lab_uw.tolist())) == 1
        lab_uw_hi = louvain_communities(a, b, resolution=1.5)
        assert len(set(lab_uw_hi.tolist())) == 3


class TestLouvainModGrid:
    def test_grid_returns_best_modularity(self):
        a, b = _two_cliques()
        res = louvain_mod(a, b, res=1.0, res_range_perc=0.5, res_step=0.25)
        # every grid point is evaluated at gamma=1 modularity; best must be
        # at least the single-resolution result
        single = louvain_mod(a, b, res=1.0)
        assert res["modularity"] >= single["modularity"] - 1e-12
        assert "resolution" in res and "labels" in res

    def test_no_grid_collapses_to_single_resolution(self):
        a, b = _two_cliques()
        res = louvain_mod(a, b, res=1.0)
        assert res["resolution"] == 1.0


class TestLouvainBackendInjection:
    def test_neardup_with_louvain_backend(self, ray_session, tmp_path):
        # planted near-dup clusters are disjoint near-cliques, where
        # community structure == connected components: the louvain backend
        # must reproduce the default clustering doc-for-doc
        import ray.data as rd

        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.fixtures import generate_pages
        from dynaalign_ray.pipelines.neardup import near_dedup

        pages, _ = generate_pages(400, seed=42)
        res_louvain = near_dedup(
            pages_ds=rd.from_arrow(pages), cfg=DedupConfig(), num_partitions=4,
            cluster_backend=make_louvain_backend(resolution=1.0),
        )
        res_default = near_dedup(
            pages_ds=rd.from_arrow(pages), cfg=DedupConfig(), num_partitions=4
        )
        c1 = {r["doc_id"]: r["cluster_id"] for r in res_louvain.clusters.take_all()}
        c2 = {r["doc_id"]: r["cluster_id"] for r in res_default.clusters.take_all()}
        assert res_louvain.stats["cc"]["mode"] == "custom"
        assert c1 == c2

    def test_edge_limit_gate(self, ray_session):
        import ray.data as rd

        edges = pa.table(
            {
                "a": pa.array([1, 2], pa.int64()),
                "b": pa.array([2, 3], pa.int64()),
                "jaccard": pa.array([0.9, 0.8]),
            }
        )
        backend = make_louvain_backend(edge_limit=1)
        with pytest.raises(NotImplementedError, match="connected-components"):
            backend(rd.from_arrow(edges), 2)
