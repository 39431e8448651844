"""Clustering — distributed union-find over verified edges.

Replaces the reference's in-memory igraph + Louvain
(/root/reference/R/clusterbreak.R:112-136, 37-67) with connected components
expressed as iterative groupby-min label propagation: ``cluster_id = min
doc_id in component`` — permutation-invariant, so results are independent of
partitioning/ordering (SURVEY.md §4 determinism row).  The driver holds only
scalars (round counter, convergence flag — the analog of the reference's
``state$itr`` / ``state$convergence`` closure env, R/clusterbreak.R:197-215).

Two paths:
- ``connected_components_small``: driver-side union-find when the verified
  edge set is provably small (dup edges only, not the corpus) — sanctioned
  fast path.
- ``connected_components_distributed``: label propagation with joins +
  groupby-min per round, O(component diameter) rounds; candidate graphs from
  LSH buckets are near-cliques/stars, so this converges in a few rounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_bidirectional(edges_ds):
    def fwd(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("a"), "dst": batch.column("b")})

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("b"), "dst": batch.column("a")})

    f = edges_ds.map_batches(fwd, batch_format="pyarrow", zero_copy_batch=True)
    r = edges_ds.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    return f.union(r)


def connected_components_distributed(
    edges_ds, num_partitions: int, max_rounds: int = 50
) -> tuple["object", int, bool]:
    """edges(a, b) -> (labels Dataset(node, label), rounds, converged).

    Per round: neighbor-min via join+groupby-min, merged into own label;
    convergence when no label decreased (tracked with an exact counter, not
    a lossy checksum).

    Groupby-min here has ~one distinct key per NODE, where Ray's aggregate
    pays per-key state; hash-repartition + one local Arrow group_by per
    whole block (each key wholly local) is ~7x faster at 10^6 keys.
    """

    def _gb_min(ds, key: str, val: str):
        def gb(b: pa.Table) -> pa.Table:
            g = b.group_by(key).aggregate([(val, "min")])
            return pa.table(
                {key: g.column(key), "nbr_min": g.column(f"{val}_min")}
            )

        return ds.repartition(num_blocks=num_partitions, keys=[key]).map_batches(
            gb, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )

    bidir = _to_bidirectional(edges_ds).materialize()

    # round 0: label(n) = min(n, min neighbors)
    first = _gb_min(bidir, "src", "dst")

    def init_label(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch.column("src")).astype(np.int64)
        nbr = np.asarray(batch.column("nbr_min")).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node, type=pa.int64()),
                "label": pa.array(np.minimum(node, nbr), type=pa.int64()),
            }
        )

    labels = first.map_batches(
        init_label, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from dynaalign_ray.joins import hash_join

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    nbr_schema = pa.schema([("dst", pa.int64()), ("nbr_min", pa.int64())])

    converged = False
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        msgs = hash_join(
            bidir,
            labels,
            left_on="src",
            right_on="node",
            left_schema=edge_schema,
            right_schema=label_schema,
            num_partitions=num_partitions,
        ).select_columns(["dst", "label"])
        nbr_min = _gb_min(msgs, "dst", "label")
        joined = hash_join(
            labels,
            nbr_min,
            left_on="node",
            right_on="dst",
            left_schema=label_schema,
            right_schema=nbr_schema,
            num_partitions=num_partitions,
            how="left outer",
        )

        def update(batch: pa.Table) -> pa.Table:
            node = np.asarray(batch.column("node")).astype(np.int64)
            label = np.asarray(batch.column("label")).astype(np.int64)
            nbr = batch.column("nbr_min").combine_chunks()
            nbr_np = np.asarray(nbr.fill_null(np.iinfo(np.int64).max)).astype(np.int64)
            new = np.minimum(label, nbr_np)
            return pa.table(
                {
                    "node": pa.array(node, type=pa.int64()),
                    "label": pa.array(new, type=pa.int64()),
                    "changed": pa.array((new < label).astype(np.int64)),
                }
            )

        updated = joined.map_batches(
            update, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        prop_changed = updated.sum("changed")
        labels = updated.select_columns(["node", "label"])

        # pointer jumping: label <- label[label], collapsing chains
        # exponentially so rounds stay O(log diameter) (SURVEY.md §7 hard
        # part 1) — without it a path graph needs O(diameter) rounds and
        # the driver-side plan chain grows unboundedly
        def ref_rename(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"jnode": batch.column("node"), "jlabel": batch.column("label")}
            )

        labels_ref = labels.map_batches(
            ref_rename, batch_format="pyarrow", zero_copy_batch=True
        )
        jumped = hash_join(
            labels,
            labels_ref,
            left_on="label",
            right_on="jnode",
            left_schema=pa.schema([("label", pa.int64()), ("node", pa.int64())]),
            right_schema=pa.schema([("jnode", pa.int64()), ("jlabel", pa.int64())]),
            num_partitions=num_partitions,
            how="left outer",
        )

        def jump(batch: pa.Table) -> pa.Table:
            node = np.asarray(batch.column("node")).astype(np.int64)
            label = np.asarray(batch.column("label")).astype(np.int64)
            jl = batch.column("jlabel").combine_chunks()
            jl_np = np.asarray(jl.fill_null(np.iinfo(np.int64).max)).astype(np.int64)
            new = np.minimum(label, jl_np)
            return pa.table(
                {
                    "node": pa.array(node, type=pa.int64()),
                    "label": pa.array(new, type=pa.int64()),
                    "changed": pa.array((new < label).astype(np.int64)),
                }
            )

        jumped_m = jumped.map_batches(
            jump, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        jump_changed = jumped_m.sum("changed")
        labels = jumped_m.select_columns(["node", "label"]).materialize()
        if not prop_changed and not jump_changed:
            converged = True
            break
    return labels, rounds, converged


def connected_components_small(edges_ds) -> pa.Table:
    """Driver-side connected components — used when the verified edge count
    is under ``DedupConfig.small_cc_limit``.  Streams edge batches to the
    driver (never doc payloads) and solves CC fully vectorized: index-space
    min-label propagation with pointer jumping (``label = label[label]``),
    O(E) numpy work per round, O(log n) rounds.  np.unique's ascending node
    order makes index order == doc_id order, so the converged root index
    maps back to the component's min doc_id."""
    parts_a, parts_b = [], []
    for batch in edges_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts_a.append(np.asarray(batch.column("a")).astype(np.int64))
        parts_b.append(np.asarray(batch.column("b")).astype(np.int64))
    if not parts_a:
        return pa.table(
            {"node": pa.array([], type=pa.int64()), "label": pa.array([], type=pa.int64())}
        )
    a = np.concatenate(parts_a)
    b = np.concatenate(parts_b)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src = inv[: len(a)]
    dst = inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        np.minimum.at(label, dst, label[src])
        np.minimum.at(label, src, label[dst])
        label = label[label]  # pointer jumping
        if np.array_equal(label, before):
            break
    return pa.table(
        {
            "node": pa.array(nodes, type=pa.int64()),
            "label": pa.array(nodes[label], type=pa.int64()),
        }
    )


def connected_components(edges_ds, num_partitions: int, max_rounds: int, small_limit: int):
    """Dispatch small/distributed. Returns (labels Dataset, info dict).

    On the driver-union-find path the label table is also placed in
    ``info["labels_table"]`` so the final assignment can run as a broadcast
    lookup instead of a shuffle join."""
    import ray.data as rd

    n_edges = edges_ds.count()
    if n_edges <= small_limit:
        table = connected_components_small(edges_ds)
        labels = rd.from_arrow(table)
        return labels, {"n_edges": n_edges, "mode": "driver_union_find", "rounds": 1,
                        "converged": True, "labels_table": table}
    labels, rounds, converged = connected_components_distributed(
        edges_ds, num_partitions, max_rounds
    )
    return labels, {"n_edges": n_edges, "mode": "labelprop", "rounds": rounds,
                    "converged": converged}


def _decide(batch: pa.Table) -> pa.Table:
    doc = np.asarray(batch.column("doc_id")).astype(np.int64)
    lbl = batch.column("label").combine_chunks()
    cluster = np.asarray(lbl.fill_null(0)).astype(np.int64).copy()
    missing = np.asarray(lbl.is_null())
    cluster[missing] = doc[missing]
    keep = cluster == doc
    return pa.table(
        {
            "doc_id": pa.array(doc, type=pa.int64()),
            "cluster_id": pa.array(cluster, type=pa.int64()),
            "keep": pa.array(keep),
            "duplicate_of": pa.array(cluster, type=pa.int64()),
        }
    )


def assign_clusters(docs_ds, labels_ds, num_partitions: int, labels_table=None):
    """docs ⋈ labels (left outer on doc_id) -> clusters(doc_id, cluster_id,
    keep, duplicate_of).  Docs in no verified edge are their own cluster.
    ``keep`` = doc is the component representative (min doc_id), the analog
    of the reference's per-cluster consensus representative
    (R/clusterbreak.R:309-320) for web dedup.

    With ``labels_table`` (driver union-find output, dup docs only) the
    lookup is BROADCAST — ray.put once, per-batch Arrow join, no shuffle."""
    if labels_table is not None:
        import ray

        ref = ray.put(labels_table)

        def decide_broadcast(batch: pa.Table) -> pa.Table:
            labels = ray.get(ref)
            joined = pa.table({"doc_id": batch.column("doc_id")}).join(
                labels, keys=["doc_id"], right_keys=["node"], join_type="left outer"
            )
            return _decide(joined)

        return docs_ds.select_columns(["doc_id"]).map_batches(
            decide_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    from dynaalign_ray.joins import hash_join

    joined = hash_join(
        docs_ds.select_columns(["doc_id"]),
        labels_ds,
        left_on="doc_id",
        right_on="node",
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        num_partitions=num_partitions,
        how="left outer",
    )

    return joined.map_batches(_decide, batch_format="pyarrow", zero_copy_batch=True)
