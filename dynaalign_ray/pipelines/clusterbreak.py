"""Cluster-size controller — the Ray-native re-expression of the
reference's recursive ``clusterbreak`` driver
(/root/reference/R/clusterbreak.R:180-275):

- clusters smaller than ``size_min`` are dropped to the *filtered* set
  (``filtered_seq``, R/clusterbreak.R:226-228);
- clusters within [size_min, size_max] are emitted with a
  ``"<round>.<cid>"`` label (R/clusterbreak.R:231-243);
- clusters larger than ``size_max`` are re-split: the reference recurses
  with a fresh per-subset quantile threshold
  (``quantile(upper.tri, thresh_p)``, R/clusterbreak.R:219,246-254); here
  each oversized component's edges are re-thresholded at that component's
  ``thresh_p`` weight quantile and connected components re-run — a driver
  LOOP over the sparse edge set (the recursion flattened), bounded by
  ``max_rounds`` with a convergence flag (``state$itr`` /
  ``state$convergence``, R/clusterbreak.R:197-215).

Scale shape: every round touches only the verified-edge table (dup pairs,
never doc text) plus narrow (node, label) tables; per-component quantiles
are computed by a vectorized block kernel after a hash partition on the
component id — no per-group Python, no driver materialization of edges.

Deliberate divergences (documented):
- cluster ids inside a label are the component's min doc_id (permutation-
  invariant and retry-safe) instead of the reference's sequential counter;
- on hitting ``max_rounds`` the still-oversized clusters ARE emitted with
  the final round's label and ``converged=False`` (the reference silently
  drops sequences still in recursion at max_itr — losing data at 10^12 docs
  is not acceptable).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.exec import pick_num_partitions
from dynaalign_ray.joins import hash_join
from dynaalign_ray.stages.cluster import connected_components


@dataclass
class ClusterBreakResult:
    clustered: Any  # Dataset(doc_id, cluster_id, cluster_label, round)
    filtered: Any  # Dataset(doc_id) — members of clusters below size_min
    rounds: int
    converged: bool
    stats: dict = field(default_factory=dict)


_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])
_NODE_SCHEMA = pa.schema([("node", pa.int64())])
_SIZE_SCHEMA = pa.schema([("label", pa.int64()), ("sz", pa.int64())])
_EDGE_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
)


def _labels_with_singletons(nodes_ds, edges_ds, cfg, P):
    """Connected components over ``edges_ds`` extended to every node in
    ``nodes_ds``: nodes in no edge become their own singleton component
    (label = own id)."""
    labels, cc_info = connected_components(
        edges_ds, P, cfg.max_cc_rounds, cfg.small_cc_limit
    )
    cc_info.pop("labels_table", None)
    joined = hash_join(
        nodes_ds,
        labels,
        left_on="node",
        right_on="node",
        left_schema=_NODE_SCHEMA,
        right_schema=_LABEL_SCHEMA,
        num_partitions=P,
        how="left outer",
    )

    def fill(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch.column("node")).astype(np.int64)
        lbl = batch.column("label").combine_chunks()
        out = np.asarray(lbl.fill_null(0)).astype(np.int64).copy()
        missing = np.asarray(lbl.is_null())
        out[missing] = node[missing]
        return pa.table(
            {
                "node": pa.array(node, type=pa.int64()),
                "label": pa.array(out, type=pa.int64()),
            }
        )

    return (
        joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True),
        cc_info,
    )


def _component_quantile_thresholds(comp_edges_ds, thresh_p: float, P: int):
    """(comp, jaccard) edge rows -> (comp, thr) with thr = the comp's
    ``thresh_p`` weight quantile (R's type-7 ``quantile``, matching
    R/clusterbreak.R:219).  Hash-partition by comp, then ONE vectorized
    kernel per block (sort + segment reduce — no per-group Python)."""

    def block_thr(batch: pa.Table) -> pa.Table:
        comp = np.asarray(batch.column("comp")).astype(np.int64)
        w = np.asarray(batch.column("jaccard")).astype(np.float64)
        if len(comp) == 0:
            return pa.table(
                {
                    "comp": pa.array([], type=pa.int64()),
                    "thr": pa.array([], type=pa.float64()),
                }
            )
        order = np.lexsort((w, comp))
        comp, w = comp[order], w[order]
        boundary = np.ones(len(comp), dtype=bool)
        boundary[1:] = comp[1:] != comp[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(comp))
        n = (ends - starts).astype(np.float64)
        # R type-7: h = (n-1)p; thr = w[floor(h)] + frac*(w[floor(h)+1]-w[floor(h)])
        h = (n - 1.0) * thresh_p
        lo = np.floor(h).astype(np.int64)
        frac = h - lo
        lo_idx = starts + lo
        hi_idx = np.minimum(lo_idx + 1, ends - 1)
        thr = w[lo_idx] + frac * (w[hi_idx] - w[lo_idx])
        return pa.table(
            {
                "comp": pa.array(comp[starts], type=pa.int64()),
                "thr": pa.array(thr, type=pa.float64()),
            }
        )

    return comp_edges_ds.repartition(num_blocks=P, keys=["comp"]).map_batches(
        block_thr, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def cluster_break(
    docs_ds=None,
    pages_ds=None,
    edges_ds=None,
    all_ids_ds=None,
    cfg: DedupConfig = DedupConfig(),
    *,
    size_max: int = 10,
    size_min: int = 3,
    thresh_p: float = 0.8,
    max_rounds: int = 10,
    num_partitions: int | None = None,
) -> ClusterBreakResult:
    """Run near-dup edge discovery (unless ``edges_ds``/``all_ids_ds`` are
    given) and apply the recursive size controller.

    Parameter parity with the reference: ``size_max``/``size_min``/
    ``max_rounds`` ≙ clusterbreak's size_max/size_min/max_itr,
    ``thresh_p`` ≙ the per-subset quantile threshold (applied per oversized
    component per round, exactly the recursion's re-threshold step)."""
    import ray.data as rd

    P = num_partitions or pick_num_partitions(None)
    stats: dict = {}
    if edges_ds is None:
        from dynaalign_ray.pipelines.neardup import near_dedup

        res = near_dedup(
            pages_ds=pages_ds, docs_ds=docs_ds, cfg=cfg, num_partitions=P
        )
        edges_ds = res.edges
        all_ids_ds = res.signatures.select_columns(["doc_id"])
        stats["neardup"] = res.stats
    if all_ids_ds is None:
        raise ValueError("provide all_ids_ds when passing edges_ds directly")

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(batch.column_names[0]).cast(pa.int64())})

    active_nodes = all_ids_ds.map_batches(
        to_nodes, batch_format="pyarrow", zero_copy_batch=True
    )
    active_edges = edges_ds

    emitted: list = []  # per-round Datasets(doc_id, cluster_id, round)
    filtered: list = []
    rounds = 0
    converged = False
    round_info: list[dict] = []

    while True:
        rounds += 1
        labels, cc_info = _labels_with_singletons(active_nodes, active_edges, cfg, P)
        labels = labels.materialize()  # consumed 3x below (sizes, join, edges)

        from ray.data.aggregate import Count

        sizes = labels.groupby("label", num_partitions=P).aggregate(
            Count(alias_name="sz")
        )
        sized = hash_join(
            labels,
            sizes,
            left_on="label",
            right_on="label",
            left_schema=_LABEL_SCHEMA,
            right_schema=_SIZE_SCHEMA,
            num_partitions=P,
        ).materialize()

        def decide(batch: pa.Table, *, emit_kind: str) -> pa.Table:
            node = np.asarray(batch.column("node")).astype(np.int64)
            label = np.asarray(batch.column("label")).astype(np.int64)
            sz = np.asarray(batch.column("sz")).astype(np.int64)
            fits = (sz >= size_min) & (sz <= size_max)
            small = sz < size_min
            big = sz > size_max
            if emit_kind == "emit":
                return pa.table(
                    {
                        "doc_id": pa.array(node[fits], type=pa.int64()),
                        "cluster_id": pa.array(label[fits], type=pa.int64()),
                    }
                )
            if emit_kind == "filtered":
                return pa.table({"doc_id": pa.array(node[small], type=pa.int64())})
            return pa.table({"node": pa.array(node[big], type=pa.int64())})

        import functools

        emit_ds = sized.map_batches(
            functools.partial(decide, emit_kind="emit"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        filt_ds = sized.map_batches(
            functools.partial(decide, emit_kind="filtered"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def tag_round(batch: pa.Table, *, r: int) -> pa.Table:
            return batch.append_column(
                "round", pa.array(np.full(batch.num_rows, r, dtype=np.int64))
            )

        emitted.append(
            emit_ds.map_batches(
                functools.partial(tag_round, r=rounds),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        filtered.append(filt_ds)

        next_nodes = sized.map_batches(
            functools.partial(decide, emit_kind="next"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        n_next = next_nodes.count()
        round_info.append({"round": rounds, "cc": cc_info, "oversized_members": n_next})
        if n_next == 0:
            converged = True
            break
        if rounds >= max_rounds:
            # max_itr guard (R/clusterbreak.R:211-215): stop, flag
            # non-convergence — but EMIT the remaining oversized clusters
            # with this round's labels instead of dropping their docs
            emitted.append(
                hash_join(
                    next_nodes,
                    labels,
                    left_on="node",
                    right_on="node",
                    left_schema=_NODE_SCHEMA,
                    right_schema=_LABEL_SCHEMA,
                    num_partitions=P,
                ).map_batches(
                    lambda b: pa.table(
                        {
                            "doc_id": b.column("node"),
                            "cluster_id": b.column("label"),
                            "round": pa.array(
                                np.full(b.num_rows, rounds, dtype=np.int64)
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            converged = False
            break

        # re-threshold each oversized component at its thresh_p weight
        # quantile (the reference's per-subset quantile, recursion step)
        comp_edges = hash_join(
            active_edges,
            next_nodes.map_batches(
                lambda b: pa.table({"node": b.column("node")}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            left_on="a",
            right_on="node",
            left_schema=_EDGE_SCHEMA,
            right_schema=_NODE_SCHEMA,
            num_partitions=P,
        )  # semi-join: keep edges whose endpoints live in an oversized comp
        comp_edges = hash_join(
            comp_edges,
            labels,
            left_on="a",
            right_on="node",
            left_schema=_EDGE_SCHEMA,
            right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
            num_partitions=P,
        ).map_batches(
            lambda b: pa.table(
                {
                    "a": b.column("a"),
                    "b": b.column("b"),
                    "jaccard": b.column("jaccard"),
                    "comp": b.column("label"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        thr = _component_quantile_thresholds(
            comp_edges.select_columns(["comp", "jaccard"]), thresh_p, P
        )
        kept = hash_join(
            comp_edges,
            thr,
            left_on="comp",
            right_on="comp",
            left_schema=pa.schema(
                [
                    ("comp", pa.int64()),
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("jaccard", pa.float64()),
                ]
            ),
            right_schema=pa.schema([("comp", pa.int64()), ("thr", pa.float64())]),
            num_partitions=P,
        )

        def refilter(batch: pa.Table) -> pa.Table:
            w = np.asarray(batch.column("jaccard")).astype(np.float64)
            t = np.asarray(batch.column("thr")).astype(np.float64)
            keep = w >= t  # the reference zeroes X < thr (strict), keeps == thr
            return pa.table(
                {
                    "a": batch.column("a").filter(pa.array(keep)),
                    "b": batch.column("b").filter(pa.array(keep)),
                    "jaccard": batch.column("jaccard").filter(pa.array(keep)),
                }
            )

        new_edges = kept.map_batches(
            refilter, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        # no-progress guard: if re-thresholding dropped nothing anywhere
        # (e.g. every oversized comp has all-equal weights), further rounds
        # can't split anything — stop with convergence=False rather than
        # burning max_rounds identical iterations
        if new_edges.count() >= comp_edges.count():
            # force-emit the remaining oversized clusters with this round's
            # labels (documented divergence: the reference would recurse
            # until max_itr then drop them)
            leftover = hash_join(
                next_nodes,
                labels,
                left_on="node",
                right_on="node",
                left_schema=_NODE_SCHEMA,
                right_schema=_LABEL_SCHEMA,
                num_partitions=P,
            ).map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": b.column("node"),
                        "cluster_id": b.column("label"),
                        "round": pa.array(
                            np.full(b.num_rows, rounds, dtype=np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            emitted.append(leftover)
            converged = False
            round_info[-1]["no_progress"] = True
            break
        active_nodes = next_nodes
        active_edges = new_edges

    clustered = emitted[0]
    for e in emitted[1:]:
        clustered = clustered.union(e)

    def add_label(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lbl = pc.binary_join_element_wise(
            pc.cast(batch.column("round"), pa.string()),
            pc.cast(batch.column("cluster_id"), pa.string()),
            ".",
        )
        return batch.append_column("cluster_label", lbl)

    clustered = clustered.map_batches(
        add_label, batch_format="pyarrow", zero_copy_batch=True
    )
    filt = filtered[0]
    for f in filtered[1:]:
        filt = filt.union(f)
    stats["rounds_info"] = round_info
    return ClusterBreakResult(
        clustered=clustered,
        filtered=filt,
        rounds=rounds,
        converged=converged,
        stats=stats,
    )
