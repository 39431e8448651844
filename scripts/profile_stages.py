"""Barriered per-stage profile of the flagship pipeline (BENCH/BASELINE.md
table).  Each stage is materialize()d so its wall time is isolated — the
real pipeline streams/overlaps these, so the barriered sum exceeds the e2e
time.  Driver-serial phases are timed separately from cluster-parallel ones.

Usage: RAY_GRAFT_CPUS=32 GRAFT_BENCH_PAGES=600000 python scripts/profile_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "600000"))


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.exec import configure_context
    from dynaalign_ray.fixtures import write_pages_dir
    from dynaalign_ray.pipelines.neardup import near_dedup
    from dynaalign_ray.stages.bands import candidate_pairs
    from dynaalign_ray.stages.cluster import assign_clusters, connected_components
    from dynaalign_ray.stages.minhash import signatures_dataset
    from dynaalign_ray.stages.verify import verified_edges
    from dynaalign_ray.extract import extract_text_batch

    configure_context()
    cfg = DedupConfig()
    pages_dir, _ = write_pages_dir(
        f"/tmp/dynaalign_bench/corpus_n{N_PAGES}_s42", N_PAGES, seed=42, num_shards=32
    )
    # warm
    rd.read_parquet(pages_dir).count()
    warm = rd.read_parquet(pages_dir).limit(500).materialize()
    near_dedup(pages_ds=warm, cfg=cfg, num_partitions=8).clusters.count()

    P = max(8, min(32, N_PAGES // 20_000))  # matches bench.py (P=64 doubles shuffle time)
    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out

    docs = clock("extract", lambda: rd.read_parquet(pages_dir).map_batches(
        extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize())
    sigs = clock("signatures", lambda: signatures_dataset(docs, cfg).materialize())
    pairs = clock("bands+dedup", lambda: candidate_pairs(
        sigs, cfg, P, salt_hot=True, dedup=True,
        approx_band_rows=N_PAGES * cfg.num_bands,
    ).materialize())
    n_pairs = pairs.count()
    edges = clock("verify", lambda: verified_edges(
        pairs, sigs, cfg, P, approx_pairs=n_pairs
    ).materialize())
    labels_info = clock("cc", lambda: connected_components(edges, P, cfg.max_cc_rounds, cfg.small_cc_limit))
    labels, cc_info = labels_info
    clock("assign", lambda: assign_clusters(
        sigs.select_columns(["doc_id"]), labels, P,
        labels_table=cc_info.pop("labels_table", None),
    ).materialize())
    t["n_pairs"] = n_pairs
    t["n_edges"] = edges.count()
    t["num_cpus"] = NUM_CPUS
    t["n_pages"] = N_PAGES
    t["barriered_total"] = round(sum(v for k, v in t.items() if k in (
        "extract", "signatures", "bands+dedup", "verify", "cc", "assign")), 2)
    print(json.dumps(t))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
