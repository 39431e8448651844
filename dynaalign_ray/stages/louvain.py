"""Louvain modularity communities — the reference's ``louvain_mod``
(/root/reference/R/clusterbreak.R:37-67) as an optional small-scale
``cluster_backend`` for :func:`dynaalign_ray.pipelines.neardup.near_dedup`.

The engine's default clustering for dedup is connected components (the
dedup-relevant semantics — SURVEY.md §2.3 #16); Louvain is community
DETECTION, useful when a user of the reference wants its clustering
behavior on a verified-edge graph (sub-communities inside one connected
component).  At 10^12-doc scale community detection over the whole graph
is out of the north rule's scope, so this backend is deliberately
driver-side and size-gated: dedup graphs' verified edges are dup pairs
only, orders of magnitude smaller than the corpus, and the reference
itself is in-memory igraph.

Algorithm (public knowledge — Blondel, Guillaume, Lambiotte, Lefebvre,
"Fast unfolding of communities in large networks", J. Stat. Mech. 2008):
greedy modularity with the standard two phases, iterated until no gain:

- phase 1: scan nodes in deterministic (sorted id) order; move each node
  to the neighboring community with the largest positive modularity gain
  ``ΔQ = w(n->C)/m - γ k_n Σ_C / (2 m²)`` (ties -> smallest community id);
  repeat sweeps until a full sweep makes no move;
- phase 2: contract communities to super-nodes (self-loops keep internal
  weight) and recurse on the contracted graph.

Determinism: no randomness anywhere (the reference's igraph
cluster_louvain is randomized; ``itr`` repeats exist there only to sample
that randomness — here one run per resolution suffices and ``itr`` is
accepted/ignored for signature parity).  The resolution grid follows
louvain_mod: ``seq(res - res_range_perc*res, res + res_range_perc*res,
by=res_step)``, keeping the partition with the best modularity.  Known
divergence (documented, not reproduced): the reference RESETS its running
best at ``i==1`` of every resolution (R/clusterbreak.R:52-56), so its
"best" is biased toward the last resolution; this implementation keeps
the true global argmax over the grid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Louvain is the small-scale backend: edges stream to the driver like
# connected_components_small, so cap what it will accept.
_LOUVAIN_EDGE_LIMIT = 5_000_000


def _csr_from_edges(a, b, w, n_nodes):
    """Symmetric CSR adjacency (both directions) from undirected edges."""
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    wt = np.concatenate([w, w])
    order = np.argsort(src, kind="stable")
    src, dst, wt = src[order], dst[order], wt[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst, wt


def _one_level(indptr, nbr, wt, degree, self_w, two_m, gamma):
    """Phase 1 sweeps over the current graph.  Returns (community id per
    node, moved_any).  Deterministic: ascending node order, best-gain
    neighbor community with ties to the smallest community id."""
    n = len(indptr) - 1
    comm = np.arange(n, dtype=np.int64)
    comm_tot = degree.copy()  # Σ_C of degrees (incl. self loops)
    moved_any = False
    while True:
        moved = False
        for v in range(n):
            cv = comm[v]
            ks = nbr[indptr[v] : indptr[v + 1]]
            ws = wt[indptr[v] : indptr[v + 1]]
            if len(ks) == 0:
                continue
            # weight from v to each neighboring community
            ncomm = comm[ks]
            # exclude self-edges of v from neighbor weights (they stay
            # internal wherever v goes)
            mask = ks != v
            ncomm_m, ws_m = ncomm[mask], ws[mask]
            if len(ncomm_m) == 0:
                continue
            uniq, inv = np.unique(ncomm_m, return_inverse=True)
            w_to = np.zeros(len(uniq))
            np.add.at(w_to, inv, ws_m)
            kv = degree[v]
            comm_tot[cv] -= kv
            # ΔQ(v -> C) with v isolated as the reference point, standard
            # form: ΔQ = 2·w(v,C)/2m - 2·γ·k_v·Σ_C/(2m)²
            gain = 2.0 * w_to / two_m - 2.0 * gamma * kv * comm_tot[uniq] / (two_m * two_m)
            if gain.max() > 1e-15:
                # deterministic tie-break: smallest community id among maxima
                best = np.flatnonzero(gain == gain.max())
                target = int(uniq[best].min())
            else:
                target = cv
            comm_tot[target] += kv
            if target != cv:
                comm[v] = target
                moved = True
                moved_any = True
        if not moved:
            break
    return comm, moved_any


def _contract(indptr, nbr, wt, self_w, comm):
    """Phase 2: communities -> super-nodes; returns contracted CSR +
    self-loop weights + the relabel map (old node -> new node)."""
    uniq, newid = np.unique(comm, return_inverse=True)
    n_new = len(uniq)
    # aggregate edge weights between communities
    src_new = np.repeat(newid, np.diff(indptr))
    dst_new = newid[nbr]
    key = src_new * n_new + dst_new
    order = np.argsort(key, kind="stable")
    key_s, wt_s = key[order], wt[order]
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
    sums = np.add.reduceat(wt_s, starts)
    ks = key_s[starts]
    s2, d2 = ks // n_new, ks % n_new
    # self-loops: within-community weight (counted once per direction) +
    # carried self weights
    self_new = np.zeros(n_new)
    np.add.at(self_new, newid, self_w)
    loop_mask = s2 == d2
    np.add.at(self_new, s2[loop_mask], sums[loop_mask] / 2.0)
    keep = ~loop_mask
    a2, b2, w2 = s2[keep], d2[keep], sums[keep]
    fwd = a2 < b2
    indptr2, nbr2, wt2 = _csr_from_edges(a2[fwd], b2[fwd], w2[fwd], n_new)
    return indptr2, nbr2, wt2, self_new, newid


def modularity(a, b, w, labels_by_node, n_nodes, gamma=1.0):
    """Q = Σ_C [ Σ_in/(2m) - γ (Σ_tot/(2m))² ] over undirected edges."""
    two_m = 2.0 * w.sum()
    if two_m == 0:
        return 0.0
    deg = np.zeros(n_nodes)
    np.add.at(deg, a, w)
    np.add.at(deg, b, w)
    same = labels_by_node[a] == labels_by_node[b]
    uniq, inv = np.unique(labels_by_node, return_inverse=True)
    sig_in = np.zeros(len(uniq))
    np.add.at(sig_in, np.searchsorted(uniq, labels_by_node[a[same]]), 2.0 * w[same])
    sig_tot = np.zeros(len(uniq))
    np.add.at(sig_tot, inv, deg)
    return float((sig_in / two_m - gamma * (sig_tot / two_m) ** 2).sum())


def louvain_communities(
    a: np.ndarray,
    b: np.ndarray,
    w: np.ndarray | None = None,
    resolution: float = 1.0,
    max_levels: int = 32,
) -> np.ndarray:
    """Greedy-modularity communities of an undirected weighted graph given
    as edge arrays over nodes ``0..n-1`` (dense ids).  Returns a community
    label per node (label = community's min node id, the engine-wide
    convention).  Fully deterministic."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    n = int(max(a.max(initial=-1), b.max(initial=-1)) + 1)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    w = np.ones(len(a)) if w is None else np.asarray(w, dtype=np.float64)
    two_m = 2.0 * w.sum()
    if two_m == 0:
        return np.arange(n, dtype=np.int64)
    indptr, nbr, wt = _csr_from_edges(a, b, w, n)
    self_w = np.zeros(n)
    mapping = np.arange(n, dtype=np.int64)  # original node -> current super-node
    for _ in range(max_levels):
        degree = np.zeros(len(indptr) - 1)
        np.add.at(degree, np.repeat(np.arange(len(indptr) - 1), np.diff(indptr)), wt)
        degree += 2.0 * self_w
        comm, moved = _one_level(indptr, nbr, wt, degree, self_w, two_m, resolution)
        if not moved:
            break
        indptr, nbr, wt, self_w, newid = _contract(indptr, nbr, wt, self_w, comm)
        mapping = newid[comm[mapping]]
        if len(indptr) - 1 <= 1:
            break
    # label = min original node id per community (stable argsort puts the
    # smallest node first within each mapping segment)
    order = np.argsort(mapping, kind="stable")
    ms = mapping[order]
    starts = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1]])
    rep = np.minimum.reduceat(order, starts)
    seg = np.searchsorted(ms[starts], mapping)
    return rep[seg]


def louvain_mod(
    a,
    b,
    w=None,
    res: float = 1.0,
    res_range_perc: float = 0.0,
    res_step: float = 0.0,
    itr: int = 3,
):
    """Resolution-grid search mirroring the reference louvain_mod
    (R/clusterbreak.R:38-67): grid = seq(res±res_range_perc*res, by
    res_step); returns {"labels", "resolution", "modularity"} of the best
    partition.  ``itr`` accepted for signature parity; this implementation
    is deterministic so repeats are pointless (documented divergence, as
    is keeping the true global argmax — see module docstring)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    n = int(max(a.max(initial=-1), b.max(initial=-1)) + 1)
    w_arr = np.ones(len(a)) if w is None else np.asarray(w, dtype=np.float64)
    if res_step and res_range_perc:
        lo, hi = res - res_range_perc * res, res + res_range_perc * res
        grid = np.arange(lo, hi + res_step / 2, res_step)
    else:
        grid = np.array([res])
    best = None
    for gamma in grid:
        labels = louvain_communities(a, b, w_arr, resolution=float(gamma))
        q = modularity(a, b, w_arr, labels, n, gamma=1.0)
        if best is None or q > best["modularity"] + 1e-12:
            best = {"labels": labels, "resolution": float(gamma), "modularity": q}
    return best


def make_louvain_backend(
    resolution: float = 1.05,
    res_range_perc: float = 0.0,
    res_step: float = 0.0,
    edge_limit: int = _LOUVAIN_EDGE_LIMIT,
):
    """``cluster_backend`` for near_dedup/netcluster: (edges_ds,
    num_partitions) -> labels Dataset(node, label) — the injection point
    the reference exposes as ``cluster_fn`` (R/clusterbreak.R:185-188).
    Streams the (small) verified-edge table to the driver like
    connected_components_small; raises past ``edge_limit`` with the CC
    pointer (community detection has no bounded distributed form here)."""

    def backend(edges_ds, num_partitions: int):
        import ray.data as rdm

        parts_a, parts_b, parts_w = [], [], []
        n_seen = 0
        for batch in edges_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            n_seen += batch.num_rows
            if n_seen > edge_limit:
                raise NotImplementedError(
                    f"louvain backend is the small-graph plan (≤{edge_limit} "
                    "edges); past it use the default connected-components "
                    "clustering (stages.cluster.connected_components)"
                )
            parts_a.append(np.asarray(batch.column("a")).astype(np.int64))
            parts_b.append(np.asarray(batch.column("b")).astype(np.int64))
            if "jaccard" in batch.schema.names:
                parts_w.append(np.asarray(batch.column("jaccard")).astype(np.float64))
        if not parts_a:
            return rdm.from_arrow(
                pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
            )
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        w = np.concatenate(parts_w) if parts_w else None
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        res = louvain_mod(
            inv[: len(a)], inv[len(a) :], w,
            res=resolution, res_range_perc=res_range_perc, res_step=res_step,
        )
        return rdm.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    # label = min ORIGINAL doc id of the community
                    "label": pa.array(nodes[res["labels"]], pa.int64()),
                }
            )
        )

    return backend
