"""Property tests mirroring the reference's testthat suite
(/root/reference/tests/testthat/test-minHash.R) against the small-scale
compat layer, plus deeper oracle-parity and distributed-CC round tests."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.compat import (
    create_char_matrix,
    create_vocab,
    minhash_compat,
    similarity_mh_compat,
)


class TestCompatShingle:
    def test_exact_shingles(self):
        # shingle("ABCDEF", 3) == ABC BCD CDE DEF (test-minHash.R:4)
        from dynaalign_ray.compat import _shingle_strings

        assert _shingle_strings("ABCDEF", 3) == ["ABC", "BCD", "CDE", "DEF"]

    def test_errors(self):
        from dynaalign_ray.compat import _shingle_strings

        with pytest.raises(ValueError):  # k < 1 (test-minHash.R:7-9)
            _shingle_strings("ABC", 0)
        with pytest.raises(ValueError):  # k > nchar
            _shingle_strings("AB", 3)

    def test_len_equals_k(self):
        from dynaalign_ray.compat import _shingle_strings

        assert _shingle_strings("ABC", 3) == ["ABC"]


class TestCompatVocab:
    def test_sorted_unique_lengthk(self):
        # vocab sorted / unique / all length k (test-minHash.R:17-30)
        vocab = create_vocab(["ABCD", "BCDE"], 2)
        assert vocab == sorted(set(vocab))
        assert all(len(v) == 2 for v in vocab)
        assert vocab == ["AB", "BC", "CD", "DE"]

    def test_char_matrix_shape_binary(self):
        # shape |vocab| x n, entries 0/1 (test-minHash.R:33-44)
        seqs = ["ABCD", "BCDE", "ABCE"]
        vocab = create_vocab(seqs, 2)
        m = create_char_matrix(seqs, vocab, 2)
        assert m.shape == (len(vocab), len(seqs))
        assert set(np.unique(m)) <= {0, 1}
        # membership correctness
        assert m[vocab.index("AB"), 0] == 1 and m[vocab.index("AB"), 1] == 0


class TestCompatMinhash:
    def test_end_to_end_shapes(self):
        # minhash() composed output shapes (test-minHash.R:109-122)
        seqs = ["ABCDEFG", "ABCDEFH", "ZYXWVUT"]
        out = minhash_compat(seqs, k=3, n_hash=32)
        assert out["sig_matrix"].shape == (32, 3)
        assert out["dist_matrix"].shape == (3, 3)
        assert out["char_matrix"].shape == (len(out["vocabulary"]), 3)

    def test_distance_properties(self):
        # symmetry, diag 0, range [0, 1] (test-minHash.R:92-106)
        seqs = ["ABCDEFG", "ABCDEFH", "ZYXWVUT", "ABCDEFG"]
        d = minhash_compat(seqs, k=3, n_hash=64)["dist_matrix"]
        assert np.allclose(d, d.T)
        assert np.allclose(np.diag(d), 0.0)
        assert (d >= 0).all() and (d <= 1).all()
        assert d[0, 3] == 0.0  # identical sequences

    def test_similarity_mh(self):
        seqs = ["ABCDEFGH", "ABCDEFGH", "HGFEDCBA"]
        s = similarity_mh_compat(seqs, k=3, n_hash=64)
        assert np.allclose(np.diag(s), 1.0)
        assert s[0, 1] == 1.0
        assert s[0, 2] < 0.5
        with pytest.raises(ValueError):
            similarity_mh_compat([], 3, 50)
        with pytest.raises(ValueError):
            similarity_mh_compat(["ABC"], 0, 50)

    def test_determinism(self):
        seqs = ["ABCDEFG", "KLMNOPQ"]
        a = minhash_compat(seqs, 3, 16, seed=9)["sig_matrix"]
        b = minhash_compat(seqs, 3, 16, seed=9)["sig_matrix"]
        assert (a == b).all()


class TestDistributedCCRounds:
    def test_long_chain_converges_multiround(self, ray_session):
        # a path graph split across blocks needs multiple contraction
        # rounds — exercises the driver loop, round counters and the
        # convergence flag.  driver_finish_limit=0 forbids the driver
        # finish, so termination must come from the adaptive single-block
        # terminal (global union-find inside one worker).
        import ray.data as rd

        from dynaalign_ray.stages.cluster import connected_components_distributed

        n = 64
        edges = pa.table(
            {
                "a": pa.array(list(range(100, 100 + n - 1)), pa.int64()),
                "b": pa.array(list(range(101, 100 + n)), pa.int64()),
            }
        )
        labels, rounds, converged = connected_components_distributed(
            rd.from_arrow(edges),
            num_partitions=4,
            max_rounds=50,
            driver_finish_limit=0,
            edges_per_block=8,
        )
        got = {r["node"]: r["label"] for r in labels.take_all()}
        assert converged and rounds >= 2
        assert set(got.values()) == {100}
        assert len(got) == n

    def test_driver_finish_terminal(self, ray_session):
        # once contraction shrinks the edge set under driver_finish_limit,
        # the driver union-find finishes; labels stay exact
        import ray.data as rd

        from dynaalign_ray.stages.cluster import connected_components_distributed

        # two cliques (dense -> one round collapses each to a star)
        rows_a, rows_b = [], []
        for base in (300, 400):
            for i in range(8):
                for j in range(i + 1, 8):
                    rows_a.append(base + i)
                    rows_b.append(base + j)
        edges = pa.table(
            {"a": pa.array(rows_a, pa.int64()), "b": pa.array(rows_b, pa.int64())}
        )
        labels, rounds, converged = connected_components_distributed(
            rd.from_arrow(edges),
            num_partitions=4,
            max_rounds=50,
            driver_finish_limit=30,
            edges_per_block=8,
        )
        got = {r["node"]: r["label"] for r in labels.take_all()}
        assert converged
        assert {got[300 + i] for i in range(8)} == {300}
        assert {got[400 + i] for i in range(8)} == {400}

    def test_max_rounds_guard(self, ray_session):
        # max_itr analog (R/clusterbreak.R:211-215): bounded rounds ->
        # convergence flag off; bailout labels keep one row per node
        import ray.data as rd

        from dynaalign_ray.stages.cluster import connected_components_distributed

        n = 32
        edges = pa.table(
            {
                "a": pa.array(list(range(200, 200 + n - 1)), pa.int64()),
                "b": pa.array(list(range(201, 200 + n)), pa.int64()),
            }
        )
        labels, rounds, converged = connected_components_distributed(
            rd.from_arrow(edges),
            num_partitions=2,
            max_rounds=1,
            driver_finish_limit=0,
            edges_per_block=4,
        )
        assert rounds == 1 and not converged
        nodes = [r["node"] for r in labels.take_all()]
        assert len(nodes) == len(set(nodes))

    def test_matches_driver_union_find_random_graph(self, ray_session):
        # plan agreement: contraction labels == driver union-find labels on
        # a seeded random graph with cliques, chains and singleton joins
        import ray.data as rd

        from dynaalign_ray.stages.cluster import (
            connected_components_distributed,
            connected_components_small,
        )

        rng = np.random.default_rng(7)
        a = rng.integers(0, 500, size=2000).astype(np.int64)
        b = rng.integers(0, 500, size=2000).astype(np.int64)
        keep = a != b
        edges = pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})
        want = {
            r["node"]: r["label"]
            for r in connected_components_small(rd.from_arrow(edges)).to_pylist()
        }
        labels, _, converged = connected_components_distributed(
            rd.from_arrow(edges),
            num_partitions=4,
            max_rounds=50,
            driver_finish_limit=0,
            edges_per_block=64,
        )
        got = {r["node"]: r["label"] for r in labels.take_all()}
        assert converged
        assert got == want


@pytest.mark.slow
class TestLargeOracleParity:
    def test_2000_doc_recall(self, ray_session):
        # FIXTURES.md oracle-parity scale: n_docs=2000
        import ray.data as rd

        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.extract import extract_text
        from dynaalign_ray.fixtures import generate_pages
        from dynaalign_ray.hashing import doc_id_from_urls
        from dynaalign_ray.oracle import pair_recall, true_pairs, union_find_clusters
        from dynaalign_ray.pipelines.neardup import near_dedup

        pages, _ = generate_pages(2000, seed=77)
        cfg = DedupConfig()
        res = near_dedup(pages_ds=rd.from_arrow(pages), cfg=cfg, num_partitions=8)
        clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.take_all()}
        texts = [extract_text(h) for h in pages.column("html").to_pylist()]
        ids = doc_id_from_urls(pages.column("url").to_pylist()).tolist()
        tp = true_pairs(texts, ids, cfg)
        oracle = union_find_clusters(tp, ids)
        assert pair_recall(clusters, tp) >= 0.99
        assert all(clusters[d] == oracle[d] for d in ids)
