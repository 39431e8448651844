"""compact_training_shards (VERDICT r3 #10): compaction preserves the
exact row multiset, the manifest stays valid, and resume still skips
completed shards afterwards."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dynaalign_ray.sources.io import (
    compact_training_shards,
    write_training_shards,
)


def _docs_tbl(n=400):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(1, n + 1), pa.int64()),
            "text": pa.array([f"doc {i} body" for i in range(1, n + 1)]),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestShardCompaction:
    def _fragmented_sink(self, tmp_path):
        out = str(tmp_path / "shards")
        # many tiny blocks -> many tiny files per shard dir
        ds = rd.from_arrow(_docs_tbl()).repartition(40)
        m = write_training_shards(ds, out, num_shards=4)
        return out, m

    def test_compaction_preserves_row_multiset(self, tmp_path):
        out, m = self._fragmented_sink(tmp_path)
        before = rd.read_parquet(out).to_pandas()
        n_files_before = {
            k: len(os.listdir(os.path.join(out, f"shard={k}")))
            for k in m["shards"]
        }
        assert any(v > 1 for v in n_files_before.values())
        compacted = compact_training_shards(out, target_bytes=1 << 30)
        assert compacted  # something was rewritten
        for k, n_after in compacted.items():
            assert n_after == 1  # 1 GiB target -> single file per shard
            assert n_after < n_files_before[k]
        after = rd.read_parquet(out).to_pandas()
        assert sorted(before["doc_id"]) == sorted(after["doc_id"])
        # text payload survived byte-for-byte
        assert (
            before.sort_values("doc_id")["text"].tolist()
            == after.sort_values("doc_id")["text"].tolist()
        )
        # manifest untouched and still true
        with open(f"{out}/_manifest.json") as f:
            assert json.load(f) == m

    def test_resume_skips_compacted_shards(self, tmp_path):
        out, m = self._fragmented_sink(tmp_path)
        compact_training_shards(out, target_bytes=1 << 30)
        mtimes = {
            k: os.path.getmtime(os.path.join(out, f"shard={k}"))
            for k in m["shards"]
        }
        m2 = write_training_shards(
            rd.from_arrow(_docs_tbl()), out, num_shards=4, resume=True
        )
        assert m2["shards"] == m["shards"]
        for k, t in mtimes.items():
            assert os.path.getmtime(os.path.join(out, f"shard={k}")) == t

    def test_verify_failure_keeps_originals(self, tmp_path, monkeypatch):
        out, m = self._fragmented_sink(tmp_path)
        # poison one manifest entry so the verify must fail
        with open(f"{out}/_manifest.json") as f:
            man = json.load(f)
        victim = sorted(man["shards"])[0]
        man["shards"][victim]["id_xor"] ^= 1
        with open(f"{out}/_manifest.json", "w") as f:
            json.dump(man, f)
        before = rd.read_parquet(out).to_pandas()
        with pytest.raises(RuntimeError, match="compaction verify failed"):
            compact_training_shards(out, target_bytes=1 << 30)
        after = rd.read_parquet(out).to_pandas()
        assert sorted(before["doc_id"]) == sorted(after["doc_id"])
        # no staging residue for the failed shard
        assert not [
            d for d in os.listdir(out) if d.startswith(".compact-shard=")
        ]
