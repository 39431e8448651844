"""Brute-force small-scale oracle (FIXTURES.md, SURVEY.md §7 M0).

Since the reference itself is nondeterministic (hash family seeded from
``std::random_device``, /root/reference/src/minHash.cpp:73) and R is absent
here, the correctness reference for dup-pair recall is pinned to the §2
estimator semantics at the same config: exact Jaccard over the SAME distinct
shingle-hash sets the engine computes, all pairs, threshold tau, connected
components with cluster_id = min doc_id.  Pure driver-side code, only usable
at oracle scale (FIXTURES.md: <= a few thousand docs).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.shingles import batch_shingle_hashes, bottomk_sketches


def shingle_sets(texts: list[str], cfg: DedupConfig) -> list[np.ndarray]:
    """Per-doc sorted distinct shingle-hash sets (uncapped)."""
    hashes, counts = batch_shingle_hashes(texts, cfg.shingle_k, cfg.shingle_mode)
    vals, sizes, _ = bottomk_sketches(hashes, counts, cap=1 << 62)
    offs = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    return [vals[offs[i] : offs[i + 1]] for i in range(len(sizes))]


def true_pairs(
    texts: list[str], doc_ids: list[int], cfg: DedupConfig
) -> set[tuple[int, int]]:
    """All (a, b) a<b with exact shingle-set Jaccard >= tau.

    Uses an inverted shingle->docs index so only pairs sharing a shingle are
    scored (still exact: disjoint pairs have J=0 < tau).
    """
    sets = shingle_sets(texts, cfg)
    sizes = np.array([len(s) for s in sets])
    index: dict[int, list[int]] = {}
    for i, s in enumerate(sets):
        for h in s.tolist():
            index.setdefault(h, []).append(i)
    shared: Counter = Counter()
    for docs in index.values():
        if len(docs) < 2:
            continue
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                shared[(docs[x], docs[y])] += 1
    out: set[tuple[int, int]] = set()
    for (i, j), c in shared.items():
        union = sizes[i] + sizes[j] - c
        if union > 0 and c / union >= cfg.tau:
            a, b = doc_ids[i], doc_ids[j]
            out.add((a, b) if a < b else (b, a))
    return out


def union_find_clusters(
    pairs: set[tuple[int, int]], doc_ids: list[int]
) -> dict[int, int]:
    """doc_id -> cluster_id (= min doc_id in component); singletons map to
    themselves."""
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {d: find(d) for d in doc_ids}


def pair_recall(
    predicted_clusters: dict[int, int], truth: set[tuple[int, int]]
) -> float:
    """Fraction of true dup pairs whose members share a predicted cluster."""
    if not truth:
        return 1.0
    hit = sum(
        1
        for a, b in truth
        if predicted_clusters.get(a) is not None
        and predicted_clusters.get(a) == predicted_clusters.get(b)
    )
    return hit / len(truth)
