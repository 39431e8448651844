"""Deterministic sampling, broadcast anti-join query, and the Bloom-filter
decontamination stage (round-2 continuation)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


class TestBloom:
    def test_no_false_negatives_and_fp_bound(self):
        from dynaalign_ray.functions.decontam import bloom_contains, build_bloom

        rng = np.random.default_rng(11)
        inserted = rng.integers(0, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
        words, m, k = build_bloom(inserted, bits_per_key=16)
        # zero false negatives: every inserted key probes the bits it set
        assert bloom_contains(words, m, k, inserted).all()
        # false-positive rate well under 1% at 16 bits/key
        probe = rng.integers(0, 2**63, size=50_000, dtype=np.int64).astype(np.uint64)
        fresh = probe[~np.isin(probe, inserted)]
        fp = bloom_contains(words, m, k, fresh).mean()
        assert fp < 0.01, fp

    def test_empty_inputs(self):
        from dynaalign_ray.functions.decontam import bloom_contains, build_bloom

        words, m, k = build_bloom(np.array([], dtype=np.uint64))
        assert bloom_contains(words, m, k, np.array([], dtype=np.uint64)).shape == (0,)
        assert not bloom_contains(words, m, k, np.array([1, 2], dtype=np.uint64)).any()

    def test_bloom_upper_bounds_exact_overlap(self, ray_session):
        """n_maybe >= n_overlap per doc, and no exact-overlap doc unflagged
        (the cheap-filter/exact-verify contract)."""
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        bloom = (
            entry.queries()["doc_decontam_bloom"]("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("doc_id")
        )
        exact = (
            entry.queries()["doc_decontam_ngram"]("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("doc_id")
        )
        m = bloom.join(exact, rsuffix="_x")
        assert (m.n_maybe >= m.n_overlap).all()
        assert not ((m.n_overlap > 0) & ~m.flagged).any()


class TestDeterministicSampling:
    def test_sample_is_stable_and_rate_bounded(self, ray_session):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        a = entry.queries()["doc_sample"]("/root/testdata/sf0.001").to_pandas()
        b = entry.queries()["doc_sample"]("/root/testdata/sf0.001").to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)  # pure function of the key
        assert 0 < len(a) < 500

    @pytest.mark.parametrize("qname", ["doc_sample", "doc_stratified_sample", "customers_no_big_orders"])
    def test_duckdb_parity_sf0001(self, ray_session, qname):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        def canon(df):
            df = df.reindex(sorted(df.columns), axis=1)
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        got = canon(entry.queries()[qname]("/root/testdata/sf0.001").to_pandas())
        con = duckdb.connect()
        for t in ("documents", "customer", "orders"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
            )
        want = canon(con.sql(entry.oracle_sql()[qname]).df())
        assert len(got) == len(want) > 0
        assert list(got.columns) == list(want.columns)
        for c in got.columns:
            assert got[c].tolist() == want[c].tolist(), c

    def test_stratified_k_per_group(self, ray_session):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        df = entry.queries()["doc_stratified_sample"]("/root/testdata/sf0.001").to_pandas()
        per = df.groupby("source").size()
        assert (per <= 20).all()
        assert (df.groupby("source").rnk.max() == per).all()


class TestShingleExcept:
    def test_duckdb_parity_and_disjointness(self, ray_session):
        """doc_shingle_except == DuckDB EXCEPT, and the result is disjoint
        from src_b's shingle set by construction."""
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        got = sorted(
            entry.queries()["doc_shingle_except"]("/root/testdata/sf0.001")
            .to_pandas()
            .sh.tolist()
        )
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = sorted(con.sql(entry.oracle_sql()["doc_shingle_except"]).df().sh.tolist())
        assert got == want and len(got) > 0
