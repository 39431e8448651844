"""Degree-orientation triangle counting (pipelines.curation
triangle_counts_from_edges): known-answer graphs + a seeded random graph
vs a brute-force adjacency count.  The full doc_triangle_counts query is
additionally oracle-checked against DuckDB's three-way self-join by the
correctness harness."""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def _run(edges, doc_ids, num_partitions=4):
    import ray.data as rd

    from dynaalign_ray.pipelines.curation import triangle_counts_from_edges

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    edges_ds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    docs_ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.array(doc_ids, dtype=np.int64), pa.int64())})
    )
    out = triangle_counts_from_edges(edges_ds, docs_ds, num_partitions)
    return {r["doc_id"]: r["n_triangles"] for r in out.take_all()}


def _brute(edges, doc_ids):
    adj = {d: set() for d in doc_ids}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    counts = dict.fromkeys(doc_ids, 0)
    for x, y, z in itertools.combinations(sorted(doc_ids), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            counts[x] += 1
            counts[y] += 1
            counts[z] += 1
    return counts


def test_clique_star_path_isolated(ray_session):
    # 4-clique: C(4,3)=4 triangles, each vertex in C(3,2)=3 of them.
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    # star: high degree, zero triangles (the boilerplate-hub signature).
    star = [(10, 11), (10, 12), (10, 13)]
    # path: two edges, no closure.
    path = [(20, 21), (21, 22)]
    edges = clique + star + path
    ids = [1, 2, 3, 4, 10, 11, 12, 13, 20, 21, 22, 30]
    got = _run(edges, ids)
    assert got == {
        1: 3, 2: 3, 3: 3, 4: 3,
        10: 0, 11: 0, 12: 0, 13: 0,
        20: 0, 21: 0, 22: 0, 30: 0,
    }


def test_random_graph_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    ids = list(range(100, 140))
    edges = [
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if rng.random() < 0.15
    ]
    assert len(edges) > 50  # non-trivial graph
    assert _run(edges, ids) == _brute(edges, ids)


def test_empty_edges(ray_session):
    got = _run([(1, 2)], [1, 2, 3])  # one edge, no wedge at all
    assert got == {1: 0, 2: 0, 3: 0}


def _run_kcore(edges, k_core, num_partitions=4, max_rounds=12):
    import ray.data as rd

    from dynaalign_ray.pipelines.curation import kcore_from_edges

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    edges_ds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    out = kcore_from_edges(edges_ds, k_core, max_rounds, num_partitions)
    if isinstance(out, pa.Table):
        return {r["doc_id"]: r["core_degree"] for r in out.to_pylist()}
    return {r["doc_id"]: r["core_degree"] for r in out.take_all()}


def _brute_kcore(edges, k_core):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k_core:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_kcore_clique_with_tail(ray_session):
    # 4-clique survives the 2-core; the pendant chain 4-50-51 peels away
    # (51 first, then 50 — a two-round peel).
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 50), (50, 51)]
    got = _run_kcore(edges, 2)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_when_forest(ray_session):
    # a tree has no 2-core at all
    edges = [(1, 2), (2, 3), (2, 4), (4, 5)]
    assert _run_kcore(edges, 2) == {}


def test_kcore_random_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    ids = list(range(200, 235))
    edges = [
        (a, b) for a, b in itertools.combinations(ids, 2) if rng.random() < 0.12
    ]
    for k_core in (2, 3):
        assert _run_kcore(edges, k_core, max_rounds=40) == _brute_kcore(edges, k_core)


def test_kcore_raises_past_max_rounds(ray_session):
    # a long chain peels one node per round from each end; 3 rounds are
    # not enough for a 12-node path's full collapse
    edges = [(i, i + 1) for i in range(300, 312)]
    with pytest.raises(ValueError, match="did not converge"):
        _run_kcore(edges, 2, max_rounds=3)


def _brute_pagerank(edges, rounds, scale=10**12):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    init = scale // n
    base = (15 * init) // 100
    pr = dict.fromkeys(adj, init)
    for _ in range(rounds):
        contrib = {u: pr[u] // len(adj[u]) for u in adj}
        pr = {
            v: base + (85 * sum(contrib[u] for u in adj[v])) // 100 for v in adj
        }
    return pr


def _run_pagerank(edges, rounds, num_partitions=4):
    import ray.data as rd

    from dynaalign_ray.pipelines.curation import pagerank_from_edges

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    edges_ds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    out = pagerank_from_edges(edges_ds, rounds, num_partitions)
    if isinstance(out, pa.Table):
        return {r["doc_id"]: r["pagerank"] for r in out.to_pylist()}
    return {r["doc_id"]: r["pagerank"] for r in out.take_all()}


def test_pagerank_matches_integer_bruteforce(ray_session):
    rng = np.random.default_rng(13)
    ids = list(range(400, 430))
    edges = [
        (a, b) for a, b in itertools.combinations(ids, 2) if rng.random() < 0.15
    ]
    assert _run_pagerank(edges, rounds=10) == _brute_pagerank(edges, rounds=10)


def test_pagerank_star_hub_dominates(ray_session):
    # the hub of a star must outrank every leaf
    edges = [(500, leaf) for leaf in range(501, 509)]
    pr = _run_pagerank(edges, rounds=10)
    assert all(pr[500] > pr[leaf] for leaf in range(501, 509))


def test_pagerank_mass_is_conserved_up_to_floor(ray_session):
    # floor division only ever DROPS micro-units: total mass is bounded
    # above by the scale and below by scale minus rounds * (drops per op)
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    pr = _run_pagerank(edges, rounds=10)
    total = sum(pr.values())
    assert total <= 10**12
    assert total >= 10**12 - 10 * (3 * len(pr) + 200)


# ---------------------------------------------------------------- BFS depths


def _run_bfs(edges, seed_mod, num_partitions=4, max_rounds=12):
    import ray.data as rd

    from dynaalign_ray.pipelines.curation import bfs_depths_from_edges

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    edges_ds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    out = bfs_depths_from_edges(edges_ds, seed_mod, max_rounds, num_partitions)
    return {r["doc_id"]: r["depth"] for r in out.to_pylist()}


def _brute_bfs(edges, seed_mod):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = sorted(n for n in adj if n % seed_mod == 0)
    depth = {s: 0 for s in seeds}
    frontier = seeds
    d = 0
    while frontier:
        d += 1
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in depth:
                    depth[m] = d
                    nxt.append(m)
        frontier = nxt
    return depth


class TestBfsDepths:
    def test_path_graph_depths(self, ray_session):
        # path 10-11-12-13-14: seed 10 (mod 10) -> depths 0..4
        edges = [(10, 11), (11, 12), (12, 13), (13, 14)]
        got = _run_bfs(edges, 10)
        assert got == {10: 0, 11: 1, 12: 2, 13: 3, 14: 4}

    def test_unreachable_component_excluded(self, ray_session):
        edges = [(10, 11), (21, 22)]  # second component has no seed
        got = _run_bfs(edges, 10)
        assert got == {10: 0, 11: 1}

    def test_min_depth_wins_on_multiple_seeds(self, ray_session):
        # node 15 is 1 hop from seed 20, 5 hops from seed 10 -> depth 1
        edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 20)]
        got = _run_bfs(edges, 10)
        assert got[15] == 1
        assert got[14] == 2

    def test_random_graph_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(11)
        ids = list(range(200, 260))
        edges = [
            (a, b) for a, b in itertools.combinations(ids, 2) if rng.random() < 0.05
        ]
        assert len(edges) > 40
        assert _run_bfs(edges, 10) == _brute_bfs(edges, 10)

    def test_no_seeds_empty(self, ray_session):
        got = _run_bfs([(11, 12)], 10)
        assert got == {}

    def test_raises_past_max_rounds(self, ray_session):
        edges = [(10, 11), (11, 12), (12, 13)]
        import pytest as _pytest

        with _pytest.raises(ValueError, match="BFS did not exhaust"):
            _run_bfs(edges, 10, max_rounds=2)
