"""Object-store-pressure check: the flagship pipeline must stream, spill
and stay EXACT when the plasma store is a small fraction of the working
set — the single-box analog of "the object store spills rather than the
job dying" at 100 TB.

Runs the identical corpus twice in fresh Ray sessions: unconstrained,
then with a deliberately tiny ``object_store_memory``; asserts the two
cluster assignments are identical doc-for-doc and reports the spill
bytes Ray recorded.

Usage: GRAFT_SPILL_PAGES=200000 GRAFT_SPILL_STORE_MB=512 python scripts/spill_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("GRAFT_SPILL_PAGES", "200000"))
STORE_MB = int(os.environ.get("GRAFT_SPILL_STORE_MB", "512"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "16"))


def run(store_mb: int | None) -> tuple[dict, float, int]:
    import ray

    kwargs = dict(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    if store_mb is not None:
        kwargs["object_store_memory"] = store_mb << 20
    ray.init(**kwargs)
    import ray.data as rd

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.exec import configure_context
    from dynaalign_ray.fixtures import write_pages_dir
    from dynaalign_ray.pipelines.neardup import near_dedup

    configure_context()
    pages_dir, _ = write_pages_dir(
        f"/tmp/dynaalign_bench/corpus_n{N_PAGES}_s42", N_PAGES, seed=42,
        num_shards=32,
    )
    t0 = time.time()
    res = near_dedup(
        pages_ds=rd.read_parquet(pages_dir),
        cfg=DedupConfig(),
        num_partitions=max(8, min(32, N_PAGES // 20_000)),
        approx_rows=N_PAGES,
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.take_all()}
    wall = time.time() - t0
    # cumulative spill from the raylet log (the internal memory_summary
    # API is flaky across Ray versions; the log line is stable)
    spilled = 0
    try:
        import glob

        session_dir = ray._private.worker._global_node.get_session_dir_path()
        for path in glob.glob(os.path.join(session_dir, "logs", "raylet.out")):
            with open(path, errors="ignore") as f:
                for line in f:
                    if "Spilled" in line and "MiB" in line:
                        spilled = max(
                            spilled,
                            int(line.split("Spilled")[1].split("MiB")[0].strip()),
                        )
    except Exception:
        pass
    ray.shutdown()
    return clusters, wall, spilled


def main() -> int:
    base, wall_base, _ = run(None)
    tiny, wall_tiny, spilled = run(STORE_MB)
    identical = base == tiny
    print(
        json.dumps(
            {
                "metric": "spill_exactness",
                "n_pages": N_PAGES,
                "store_mb": STORE_MB,
                "num_cpus": NUM_CPUS,
                "wall_unconstrained_sec": round(wall_base, 2),
                "wall_tiny_store_sec": round(wall_tiny, 2),
                "spilled_mib": spilled,
                "clusters_identical": identical,
            }
        )
    )
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
