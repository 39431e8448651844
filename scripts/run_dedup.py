"""Job driver for the flagship near-dup pipeline — the ``ray job submit``
entry point (BASELINE.md protocol; on a real cluster:
``ray job submit --working-dir . -- python scripts/run_dedup.py --input ...``).

Owns its Ray session (library code never calls ray.init).  Resumable: rerun
with the same --checkpoint dir and completed stages are skipped via their
lineage fingerprints.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Ray-Data near-duplicate dedup job")
    ap.add_argument("--input", required=True, help="pages Parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True, help="output dir for clusters/edges Parquet")
    ap.add_argument("--checkpoint", default=None, help="checkpoint root (enables resume)")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--shingle-mode", default="word", choices=["word", "char"])
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--num-bands", type=int, default=32)
    ap.add_argument("--tau", type=float, default=0.7)
    ap.add_argument("--tau-quantile", type=float, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--backend", default="minhash", choices=["minhash", "simhash", "substring"])
    ap.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    ap.add_argument(
        "--url-dedup",
        action="store_true",
        help="pre-tier: keep only the newest snapshot per canonical URL "
        "(crawl-revisit dedup; payloads never shuffled — see "
        "pipelines/webpages.latest_snapshot_pages)",
    )
    ap.add_argument(
        "--mode",
        default="full",
        choices=["full", "build-index", "probe-index", "paragraph"],
        help="full: one-shot dedup; build-index: dedup + persist the probe "
        "index; probe-index: incremental dedup of --input against --index; "
        "paragraph: paragraph-granular fuzzy dedup + per-doc reassembly "
        "(pipelines/curation.paragraph_neardup)",
    )
    ap.add_argument(
        "--chunk-words",
        type=int,
        default=16,
        help="paragraph mode: words per paragraph window",
    )
    ap.add_argument("--index", default=None, help="index dir (probe-index: read; build-index: write)")
    ap.add_argument("--index-out", default=None, help="probe-index: write the folded index here")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        init_kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                           logging_level="ERROR")
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    import ray.data as rd

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.exec import configure_context
    from dynaalign_ray.pipelines.neardup import near_dedup, write_run_report

    configure_context()
    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        shingle_mode=args.shingle_mode,
        num_perm=args.num_perm,
        num_bands=args.num_bands,
        tau=args.tau,
        tau_quantile=args.tau_quantile,
        seed=args.seed,
    )
    if args.mode == "paragraph":
        from dynaalign_ray.extract import extract_text_batch
        from dynaalign_ray.pipelines.curation import paragraph_neardup

        docs = rd.read_parquet(args.input).map_batches(
            extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        t0 = time.time()
        # pages ids are 63-bit url hashes — too wide for the packed
        # (doc_id*2^20+para_no) layout, so use the hashed paragraph ids
        clean = paragraph_neardup(
            docs,
            chunk_words=args.chunk_words,
            tau=args.tau,
            num_partitions=args.num_partitions or 8,
            id_mode="hashed",
        )
        os.makedirs(args.output, exist_ok=True)
        clean.write_parquet(os.path.join(args.output, "clean_docs"))
        import pyarrow.dataset as pds

        tbl = pds.dataset(os.path.join(args.output, "clean_docs")).to_table(
            columns=["n_paras", "n_removed"]
        )
        import pyarrow.compute as _pc

        wall = time.time() - t0
        n_docs = tbl.num_rows
        print(
            json.dumps(
                {
                    "mode": "paragraph",
                    "n_docs": n_docs,
                    "n_paras": _pc.sum(tbl.column("n_paras")).as_py(),
                    "n_paras_removed": _pc.sum(tbl.column("n_removed")).as_py(),
                    "wall_sec": round(wall, 2),
                    "docs_per_sec": round(n_docs / wall, 1),
                }
            )
        )
        ray.shutdown()
        return 0

    if args.mode != "full":
        # incremental entry points (pipelines/incremental.py): pages input is
        # extracted to docs(doc_id, text) first — the index stores signatures
        # keyed by the url-hash doc ids, so snapshots compose.
        from dynaalign_ray.extract import extract_text_batch
        from dynaalign_ray.pipelines.incremental import (
            build_index,
            incremental_dedup,
            update_index,
        )

        if not args.index:
            ap.error(f"--mode {args.mode} requires --index")
        docs = rd.read_parquet(args.input).map_batches(
            extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        t0 = time.time()
        if args.mode == "build-index":
            meta = build_index(
                docs, cfg, index_dir=args.index, num_partitions=args.num_partitions
            )
            print(json.dumps({"mode": "build-index", "wall_sec": round(time.time() - t0, 2), **meta}))
        else:
            res = incremental_dedup(
                docs, index_dir=args.index, cfg=cfg, num_partitions=args.num_partitions
            )
            os.makedirs(args.output, exist_ok=True)
            res.new_clusters.write_parquet(os.path.join(args.output, "new_clusters"))
            res.edges.write_parquet(os.path.join(args.output, "delta_edges"))
            if args.index_out:
                update_index(args.index, res, args.index_out, cfg)
            n_new = res.new_clusters.count()
            wall = time.time() - t0
            print(
                json.dumps(
                    {
                        "mode": "probe-index",
                        "n_new_docs": n_new,
                        "n_delta_edges": res.edges.count(),
                        "n_cluster_merges": res.merges.num_rows,
                        "wall_sec": round(wall, 2),
                        "docs_per_sec": round(n_new / wall, 1),
                    }
                )
            )
        ray.shutdown()
        return 0

    t0 = time.time()
    pages_ds = rd.read_parquet(args.input)
    if args.url_dedup:
        from dynaalign_ray.pipelines.webpages import latest_snapshot_pages

        pages_ds = latest_snapshot_pages(
            pages_ds, num_partitions=args.num_partitions or 8
        )
    res = near_dedup(
        pages_ds=pages_ds,
        cfg=cfg,
        checkpoint_dir=args.checkpoint,
        num_partitions=args.num_partitions,
        similarity_backend=args.backend,
    )
    os.makedirs(args.output, exist_ok=True)
    res.clusters.write_parquet(os.path.join(args.output, "clusters"))
    res.edges.write_parquet(os.path.join(args.output, "edges"))
    n_docs = res.clusters.count()
    wall = time.time() - t0
    report = write_run_report(res, os.path.join(args.output, "report.json"))
    summary = {
        "n_docs": n_docs,
        "n_clusters": report["n_clusters"],
        "n_dup_docs": report["n_dup_docs"],
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "config_hash": cfg.config_hash(),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
