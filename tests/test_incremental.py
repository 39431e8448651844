"""Incremental near-dup vs the full batch run.

The contract (pipelines/incremental.py): probing a new batch against an
index built from the base corpus must produce EXACTLY the clusters a full
near_dedup over base ∪ new would — labels are component-min doc ids on both
paths, and with uncapped buckets the candidate sets coincide (bucket
membership is a pure function of each doc's signature).  The fixture uses
boiler_frac=0 so no bucket hits pair_cap / salting (capped star-hub choice
legitimately depends on bucket membership and may differ between one-shot
and incremental runs — documented, not asserted)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data


@pytest.fixture(scope="module")
def corpus():
    from dynaalign_ray.fixtures import generate_pages
    from dynaalign_ray.hashing import doc_id_from_urls

    pages, truth = generate_pages(1200, seed=5, boiler_frac=0.0)
    ids = doc_id_from_urls(pages.column("url").to_pylist())
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pages.column("text"),
        }
    )
    is_new = np.arange(len(ids)) % 10 == 9
    return docs, is_new


def _cluster_map(clusters_ds) -> dict[int, int]:
    return {r["doc_id"]: r["cluster_id"] for r in clusters_ds.take_all()}


class TestIncremental:
    def test_matches_full_run_and_index_update(self, ray_session, corpus, tmp_path):
        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.pipelines.incremental import (
            build_index,
            incremental_dedup,
            update_index,
        )
        from dynaalign_ray.pipelines.neardup import near_dedup

        docs, is_new = corpus
        cfg = DedupConfig()
        base = docs.filter(pa.array(~is_new))
        new = docs.filter(pa.array(is_new))

        full = near_dedup(docs_ds=ray.data.from_arrow(docs), cfg=cfg, num_partitions=4)
        want = _cluster_map(full.clusters)

        idx_dir = str(tmp_path / "index")
        meta = build_index(
            ray.data.from_arrow(base), cfg, index_dir=idx_dir, num_partitions=4
        )
        assert meta["n_docs"] == base.num_rows

        res = incremental_dedup(
            ray.data.from_arrow(new), index_dir=idx_dir, cfg=cfg, num_partitions=4
        )
        got_new = _cluster_map(res.new_clusters)
        assert set(got_new) == set(new.column("doc_id").to_pylist())
        for d, c in got_new.items():
            assert c == want[d], f"new doc {d}: incremental {c} != full {want[d]}"

        # fold into a new index: EVERY doc (old + new) must now match the
        # full run — old clusters bridged by a new doc remap via `merges`
        out_dir = str(tmp_path / "index_v2")
        meta2 = update_index(idx_dir, res, out_dir, cfg)
        assert meta2["n_docs"] == docs.num_rows
        merged = {
            r["doc_id"]: r["cluster_id"]
            for r in ray.data.read_parquet(os.path.join(out_dir, "clusters")).take_all()
        }
        assert merged == want

    def test_config_mismatch_refuses(self, ray_session, corpus, tmp_path):
        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.pipelines.incremental import build_index, incremental_dedup

        docs, is_new = corpus
        idx_dir = str(tmp_path / "index_cfg")
        build_index(
            ray.data.from_arrow(docs.filter(pa.array(~is_new)).slice(0, 100)),
            DedupConfig(),
            index_dir=idx_dir,
            num_partitions=2,
        )
        with pytest.raises(ValueError, match="different DedupConfig"):
            incremental_dedup(
                ray.data.from_arrow(docs.filter(pa.array(is_new)).slice(0, 10)),
                index_dir=idx_dir,
                cfg=DedupConfig(tau=0.9),
                num_partitions=2,
            )

    def test_pair_kernel_emits_only_new_involving(self):
        from dynaalign_ray.pipelines.incremental import emit_incremental_pairs_block

        batch = pa.table(
            {
                "band_key": pa.array([7, 7, 7, 7, 9, 9], pa.int64()),
                "doc_id": pa.array([1, 2, 3, 10, 4, 5], pa.int64()),
                "is_new": pa.array([False, False, True, True, False, False]),
            }
        )
        out = emit_incremental_pairs_block(batch, pair_cap=64)
        pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
        # bucket 7: new {3, 10} x old {1, 2} + new-new (3, 10); bucket 9: old-only -> nothing
        assert pairs == {(1, 3), (2, 3), (1, 10), (2, 10), (3, 10)}

    def test_pair_kernel_star_prefers_old_hub(self):
        from dynaalign_ray.pipelines.incremental import emit_incremental_pairs_block

        n_new = 30
        batch = pa.table(
            {
                "band_key": pa.array([1] * (n_new + 2), pa.int64()),
                "doc_id": pa.array([100, 101] + list(range(200, 200 + n_new)), pa.int64()),
                "is_new": pa.array([False, False] + [True] * n_new),
            }
        )
        out = emit_incremental_pairs_block(batch, pair_cap=10)
        a = out.column("a").to_pylist()
        b = out.column("b").to_pylist()
        assert len(a) == n_new  # one star edge per new doc
        hubs = set(a) | set(b)
        assert 100 in hubs or 101 in hubs  # hub drawn from the old side
