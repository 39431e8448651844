"""Flagship near-duplicate pipeline — the Ray-native re-expression of the
reference's ``clusterbreak`` end-to-end flow (/root/reference/R/clusterbreak.R:180-275,
traced in SURVEY.md §3.3/§3.4):

    pages --extract--> docs --MinHashActor--> signatures
      --explode bands--> band_entries --hash shuffle on band_key--> pairs
      --⋈ sketches, exact-Jaccard tau filter--> verified_edges
      --union-find (groupby-min label prop)--> clusters/dedup decisions

The reference's recursive size controller with global mutable state becomes
a flat keyed dataflow; its per-subset quantile threshold
(R/clusterbreak.R:219) is available as ``cfg.tau_quantile`` (approximate
quantile over verified edge weights), fixed ``cfg.tau`` is the default.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.exec import configure_context, pick_num_partitions
from dynaalign_ray.extract import extract_text_batch
from dynaalign_ray.stages.bands import candidate_pairs
from dynaalign_ray.stages.cluster import assign_clusters, connected_components
from dynaalign_ray.stages.minhash import signatures_dataset
from dynaalign_ray.stages.verify import verified_edges
from dynaalign_ray.state.lineage import CheckpointContext


@dataclass
class NearDupResult:
    clusters: Any  # Dataset(doc_id, cluster_id, keep, duplicate_of)
    edges: Any  # Dataset(a, b, jaccard)
    signatures: Any  # Dataset(doc_id, minhash, simhash, n_shingles, sketch)
    docs: Any  # Dataset(doc_id, url?, text, ...)
    stats: dict = field(default_factory=dict)


def near_dedup(
    pages_ds=None,
    docs_ds=None,
    cfg: DedupConfig = DedupConfig(),
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    approx_rows: int | None = None,
    salt_hot: bool = True,
) -> NearDupResult:
    """Run the flagship pipeline.

    Provide either ``pages_ds`` (url, warc_ts, html, text?, lang — the
    extract stage runs and drops the wide html column immediately) or
    ``docs_ds`` (doc_id, text, ...).  With ``checkpoint_dir`` set, every
    stage persists per-partition Parquet + lineage and a rerun resumes from
    the last completed stage; without it, multi-consumer intermediates
    (signatures, edges) are pinned with ``materialize()`` instead so fan-out
    doesn't re-execute the upstream pipeline.
    """
    configure_context()
    if (pages_ds is None) == (docs_ds is None):
        raise ValueError("provide exactly one of pages_ds / docs_ds")
    P = num_partitions or pick_num_partitions(approx_rows)
    ckpt = CheckpointContext(checkpoint_dir, cfg.config_hash() + f"|P{P}")

    if docs_ds is None:
        docs_ds, fp_docs = ckpt.run_stage(
            "docs",
            "pages-input",
            lambda: pages_ds.map_batches(
                extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
            ),
        )
    else:
        fp_docs = "docs-input"

    sigs, fp_sigs = ckpt.run_stage(
        "signatures", fp_docs, lambda: signatures_dataset(docs_ds, cfg)
    )
    if checkpoint_dir is None:
        # signatures fan out to: hot-key count, band explode, verify join ×2
        sigs = sigs.materialize()

    pairs, fp_pairs = ckpt.run_stage(
        "pairs", fp_sigs, lambda: candidate_pairs(sigs, cfg, P, salt_hot=salt_hot)
    )
    edges, fp_edges = ckpt.run_stage(
        "edges", fp_pairs, lambda: verified_edges(pairs, sigs, cfg, P)
    )
    if checkpoint_dir is None:
        edges = edges.materialize()

    if cfg.tau_quantile is not None:
        # reference parity: quantile-based threshold over the edge weight
        # distribution (R/clusterbreak.R:219) — recompute tau and re-filter.
        import pyarrow.compute as pc

        q = _approx_quantile(edges, "jaccard", cfg.tau_quantile)

        def refilter(batch):
            return batch.filter(pc.greater_equal(batch["jaccard"], q))

        edges = edges.map_batches(refilter, batch_format="pyarrow")
        if checkpoint_dir is None:
            edges = edges.materialize()

    labels, cc_info = connected_components(
        edges, P, cfg.max_cc_rounds, cfg.small_cc_limit
    )
    clusters, _ = ckpt.run_stage(
        "clusters", fp_edges, lambda: assign_clusters(docs_ds, labels, P)
    )
    stats = {"cc": cc_info, "stages": ckpt.counters, "num_partitions": P}
    return NearDupResult(
        clusters=clusters, edges=edges, signatures=sigs, docs=docs_ds, stats=stats
    )


def _approx_quantile(ds, col: str, q: float) -> float:
    """Approximate quantile via a bounded uniform sample (the scalable
    stand-in for R's exact ``quantile(upper.tri)``)."""
    import numpy as np

    n = ds.count()
    frac = min(1.0, 500_000 / max(n, 1))
    sample = ds.random_sample(frac, seed=0) if frac < 1.0 else ds
    vals = np.array([r[col] for r in sample.select_columns([col]).take_all()])
    if len(vals) == 0:
        return 0.0
    return float(np.quantile(vals, q))


def dedup_stats(edges_ds) -> dict:
    """Engine metrics — the reference's ``compute_similarity_stats``
    (/root/reference/R/similarity.R:11-34) over the sparse verified-edge
    table: mean/min/max of edge similarity + the most/least similar pair
    (top-1 by sort, not an n×n argmax)."""
    from ray.data.aggregate import Max, Mean, Min

    n = edges_ds.count()
    if n == 0:
        return {"n_edges": 0}
    agg = edges_ds.aggregate(
        Mean("jaccard", alias_name="mean_j"),
        Min("jaccard", alias_name="min_j"),
        Max("jaccard", alias_name="max_j"),
    )
    most = edges_ds.sort("jaccard", descending=True).limit(1).take_all()[0]
    least = edges_ds.sort("jaccard", descending=False).limit(1).take_all()[0]
    return {
        "n_edges": n,
        "mean_jaccard": agg["mean_j"],
        "min_jaccard": agg["min_j"],
        "max_jaccard": agg["max_j"],
        "most_similar_pair": (most["a"], most["b"], most["jaccard"]),
        "least_similar_pair": (least["a"], least["b"], least["jaccard"]),
    }
