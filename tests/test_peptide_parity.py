"""Reference-domain parity: the flagship pipeline on peptide/protein
sequences with CHAR shingles (the reference's own configuration space:
similarityMH(k, n_hash) -> threshold -> cluster; clades as known labels per
/root/reference/workspace/troyWspc.Rmd:143-189)."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.fixtures_peptide import generate_isolates, generate_peptides
from dynaalign_ray.oracle import pair_recall, true_pairs, union_find_clusters


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


class TestPeptidePipeline:
    def test_char_mode_matches_oracle(self, rd):
        isolates = generate_isolates(n=200, n_clades=5, seq_len=250, seed=11)
        seqs = isolates.column("sequence").to_pylist()
        ids = list(range(1, len(seqs) + 1))
        cfg = DedupConfig(shingle_mode="char", shingle_k=4, tau=0.5)
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(seqs, pa.string())})
        )
        from dynaalign_ray.pipelines.neardup import near_dedup

        res = near_dedup(docs_ds=docs, cfg=cfg, num_partitions=4)
        clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.take_all()}
        tp = true_pairs(seqs, ids, cfg)
        oracle = union_find_clusters(tp, ids)
        assert pair_recall(clusters, tp) >= 0.99
        assert all(clusters[d] == oracle[d] for d in ids)

    def test_clade_recovery(self, rd):
        # with a low mutation rate, clusters should largely follow clades —
        # the ARI-style end-task sanity check
        isolates = generate_isolates(
            n=150, n_clades=4, seq_len=200, seed=3, mutation_rate=0.01
        )
        seqs = isolates.column("sequence").to_pylist()
        clades = isolates.column("clade").to_pylist()
        ids = list(range(1, len(seqs) + 1))
        cfg = DedupConfig(shingle_mode="char", shingle_k=4, tau=0.4)
        from dynaalign_ray.pipelines.neardup import near_dedup

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(seqs, pa.string())})
        )
        res = near_dedup(docs_ds=docs, cfg=cfg, num_partitions=4)
        clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.take_all()}
        # purity: majority clade per cluster should dominate
        from collections import Counter, defaultdict

        members = defaultdict(list)
        for i, d in enumerate(ids):
            members[clusters[d]].append(clades[i])
        agree = sum(Counter(v).most_common(1)[0][1] for v in members.values())
        assert agree / len(ids) >= 0.95

    def test_peptides_table_shape(self):
        pep = generate_peptides(n=500, length=12, seed=1)
        vals = pep.column("peptides").to_pylist()
        assert len(vals) == len(set(vals)) == 500
        assert all(len(v) == 12 for v in vals)

    def test_nw_rescore_on_candidates(self, rd):
        # exact NW rescoring over LSH candidate pairs (operator #14/#15 use)
        isolates = generate_isolates(n=60, n_clades=3, seq_len=120, seed=5)
        seqs = isolates.column("sequence").to_pylist()
        ids = list(range(1, len(seqs) + 1))
        cfg = DedupConfig(shingle_mode="char", shingle_k=4, tau=0.4)
        from dynaalign_ray.pipelines.neardup import near_dedup
        from dynaalign_ray.stages.nw import NWRescorer

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(seqs, pa.string())})
        ).materialize()
        res = near_dedup(docs_ds=docs, cfg=cfg, num_partitions=4)
        edges = res.edges
        if edges.count() == 0:
            pytest.skip("no candidate edges at this config")
        # attach texts to pairs and rescore
        from dynaalign_ray.joins import hash_join

        def _t(name):
            def project(b: pa.Table) -> pa.Table:
                return pa.table({"doc_id": b.column("doc_id"), name: b.column("text")})

            return docs.map_batches(project, batch_format="pyarrow")

        j1 = hash_join(
            edges.select_columns(["a", "b"]), _t("text_a"),
            left_on="a", right_on="doc_id",
            left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
            right_schema=pa.schema([("doc_id", pa.int64()), ("text_a", pa.string())]),
            num_partitions=4,
        )
        j2 = hash_join(
            j1, _t("text_b"), left_on="b", right_on="doc_id",
            left_schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("text_a", pa.string())]
            ),
            right_schema=pa.schema([("doc_id", pa.int64()), ("text_b", pa.string())]),
            num_partitions=4,
        )
        scored = j2.map_batches(NWRescorer, batch_format="pyarrow", concurrency=1)
        rows = scored.take_all()
        assert rows and all(0.0 <= r["nw_similarity"] <= 1.0 for r in rows)
        # same-clade near-dups should score high under NW too
        assert max(r["nw_similarity"] for r in rows) > 0.8
