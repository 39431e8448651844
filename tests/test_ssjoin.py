"""Prefix-filtered exact set-similarity join (stages/ssjoin.py)."""

import functools

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.stages.ssjoin import (
    prefix_candidates_block,
    prefix_jaccard_join,
    prefix_tokens_block,
)


def _sets_table(sets: dict[int, list[int]]) -> pa.Table:
    """{doc_id: sorted distinct u64 hash list} -> (doc_id, sketch) rows in
    the engine's binary-CSR-row layout."""
    ids = sorted(sets)
    blobs = [np.asarray(sorted(sets[d]), dtype="<u8").tobytes() for d in ids]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "sketch": pa.array(blobs, pa.binary()),
        }
    )


def _brute_pairs(sets: dict[int, list[int]], tau: float):
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = set(sets[a]), set(sets[b])
            u = len(sa | sb)
            j = len(sa & sb) / u if u else 0.0
            if j >= tau:
                out[(a, b)] = j
    return out


def _rand_sets(rng, n_docs, universe, lo, hi, n_dups):
    sets = {}
    for d in range(n_docs):
        m = int(rng.integers(lo, hi))
        sets[d] = sorted(
            int(x) for x in rng.choice(universe, size=m, replace=False)
        )
    # planted near-dups: copy with small perturbations
    for i in range(n_dups):
        src = sets[i]
        mut = list(src)
        if len(mut) > 3:
            mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 2**63))
        sets[n_docs + i] = sorted(set(mut))
    return sets


class TestPrefixJoinExactness:
    @pytest.mark.parametrize("tau", [0.3, 0.5, 0.7, 0.9])
    def test_matches_brute_force(self, ray_session, tau):
        import ray.data as rd

        rng = np.random.default_rng(11)
        universe = rng.integers(0, 2**63, size=400, dtype=np.int64)
        sets = _rand_sets(rng, 40, universe, 4, 30, 10)
        t = _sets_table(sets)
        ds = rd.from_arrow(t).materialize()
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in prefix_jaccard_join(ds, tau, 4).take_all()
        }
        want = _brute_pairs(sets, tau)
        assert got.keys() == want.keys(), tau
        for k in want:
            assert got[k] == want[k], (k, tau)  # exact division both sides

    def test_integral_tau_n_boundary(self, ray_session):
        """tau*n integral is where a wrong ceil breaks the prefix theorem:
        two sets of size 4 sharing exactly their 2 LARGEST tokens at
        tau=0.5 (J=2/6<tau, dropped) and sets sharing 3 (J=3/5>=tau) must
        both be decided exactly."""
        import ray.data as rd

        # J >= 0.5 needs overlap >= 3 for |r|=|s|=4 (3/5 = 0.6 >= 0.5)
        base = [10, 20, 30, 40]
        sets = {
            1: base,
            2: [10, 20, 30, 99],  # overlap 3 -> J = 3/5 = 0.6
            3: [30, 40, 98, 99],  # overlap 2 with doc1 -> J = 2/6 = 0.33
        }
        ds = rd.from_arrow(_sets_table(sets)).materialize()
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in prefix_jaccard_join(ds, 0.5, 2).take_all()
        }
        want = _brute_pairs(sets, 0.5)
        assert got == want
        assert (1, 2) in got and (1, 3) not in got


class TestDfOrder:
    @pytest.mark.parametrize("tau", [0.4, 0.7])
    def test_df_order_matches_brute_force(self, ray_session, tau):
        """Rarest-first (CMS) ordering changes only the candidate set,
        never the exact result."""
        import ray.data as rd

        rng = np.random.default_rng(23)
        universe = rng.integers(0, 2**63, size=300, dtype=np.int64)
        sets = _rand_sets(rng, 30, universe, 4, 25, 8)
        ds = rd.from_arrow(_sets_table(sets)).materialize()
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in prefix_jaccard_join(ds, tau, 4, order="df").take_all()
        }
        assert got == _brute_pairs(sets, tau), tau

    def test_df_order_shrinks_boilerplate_buckets(self, ray_session):
        """A token shared by EVERY doc and placed first in value order
        (smallest hash) drags all C(n,2) pairs into one bucket under
        value order; under df order it sinks to every suffix and the
        candidate count collapses to the true near-dup groups."""
        import functools

        import ray.data as rd

        from dynaalign_ray.stages.ssjoin import cms_df_order_ref

        rng = np.random.default_rng(5)
        n_docs, tau = 40, 0.7
        sets = {}
        for d in range(n_docs):
            rare = [int(x) for x in rng.integers(1000, 2**62, size=6)]
            sets[d] = sorted({1, *rare})  # token 1: global boilerplate, min value
        t = _sets_table(sets)
        ds = rd.from_arrow(t).materialize()

        def count_candidates(cms_ref):
            toks = prefix_tokens_block(t, threshold=tau, cms_ref=cms_ref)
            return prefix_candidates_block(toks, threshold=tau).num_rows

        n_value = count_candidates(None)
        n_df = count_candidates(
            cms_df_order_ref(ds)
        )  # single block: bucket grouping is complete
        assert n_value >= n_docs * (n_docs - 1) // 2  # boilerplate blowup
        assert n_df < n_value / 10  # rare-first prefixes: near-zero overlap


class TestPrefixBlocks:
    def test_prefix_lengths(self):
        sets = {1: [1, 2, 3, 4], 2: [5]}
        out = prefix_tokens_block(_sets_table(sets), threshold=0.5)
        per_doc = {}
        for d in out.column("doc_id").to_pylist():
            per_doc[d] = per_doc.get(d, 0) + 1
        # n=4, tau=0.5: p = 4 - floor(2.0) + 1 = 3 (safe form, one longer
        # than the canonical 4 - ceil(2) + 1 = 3 only when tau*n fractional)
        assert per_doc == {1: 3, 2: 1}
        assert out.column("n").to_pylist() == [4, 4, 4, 1]

    def test_length_filter_drops_impossible_pairs(self):
        t = pa.table(
            {
                "tok": pa.array([7, 7], pa.int64()),
                "doc_id": pa.array([1, 2], pa.int64()),
                "n": pa.array([2, 10], pa.int64()),
            }
        )
        out = prefix_candidates_block(t, threshold=0.5)
        assert out.num_rows == 0  # min/max = 0.2 < tau: J can never reach

    def test_query_agrees_with_allpairs_plan(self, ray_session):
        from dynaalign_ray.pipelines.curation import (
            doc_jaccard_pairs,
            doc_jaccard_pairs_prefix,
        )

        def key(df):
            return sorted(zip(df["a"], df["b"], df["jaccard"]))

        ap = doc_jaccard_pairs("/root/testdata/sf0.001").to_pandas()
        pf = doc_jaccard_pairs_prefix("/root/testdata/sf0.001").to_pandas()
        assert key(ap) == key(pf)


class TestExactClustering:
    def test_agrees_with_lsh_flagship(self, ray_session):
        """doc_neardup_exact (SSJoin edges, no probabilistic stage) must
        produce the identical cluster assignment to the LSH flagship —
        the structural proof that the flagship's measured recall 1.0 is
        the exact answer."""
        from dynaalign_ray.pipelines.curation import (
            doc_neardup_clusters,
            doc_neardup_exact,
        )

        lsh = doc_neardup_clusters("/root/testdata/sf0.001").to_pandas()
        ext = doc_neardup_exact("/root/testdata/sf0.001").to_pandas()
        a = lsh.sort_values("doc_id").reset_index(drop=True)
        b = ext.sort_values("doc_id").reset_index(drop=True)
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["cluster_id"].tolist() == b["cluster_id"].tolist()
        assert a["keep"].tolist() == b["keep"].tolist()


def _brute_containment(sets, tau):
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = set(sets[a]), set(sets[b])
            if not sa or not sb:
                continue
            c = len(sa & sb) / min(len(sa), len(sb))
            if c >= tau:
                out[(a, b)] = c
    return out


class TestContainmentJoin:
    @pytest.mark.parametrize("order", ["value", "df"])
    def test_matches_brute_force(self, ray_session, order):
        import ray.data as rd

        from dynaalign_ray.stages.ssjoin import prefix_containment_join

        rng = np.random.default_rng(31)
        universe = rng.integers(0, 2**63, size=300, dtype=np.int64)
        sets = _rand_sets(rng, 25, universe, 4, 25, 6)
        # plant a SUBSET pair: small set fully inside a big one (the
        # containment-only shape Jaccard misses)
        sets[100] = sets[0][:4]
        ds = rd.from_arrow(_sets_table(sets)).materialize()
        for tau in (0.6, 0.9):
            got = {
                (r["a"], r["b"]): r["containment"]
                for r in prefix_containment_join(
                    ds, tau, 4, order=order
                ).take_all()
            }
            want = _brute_containment(sets, tau)
            assert got.keys() == want.keys(), (tau, order)
            for k in want:
                assert abs(got[k] - want[k]) < 1e-12, (k, tau)
        assert (0, 100) in got  # the planted subset at tau=0.9

    def test_query_agrees_with_allpairs_plan(self, ray_session):
        from dynaalign_ray.pipelines.curation import (
            doc_containment_pairs,
            doc_containment_pairs_prefix,
        )

        def key(df):
            return sorted(zip(df["a"], df["b"], df["containment"]))

        ap = doc_containment_pairs("/root/testdata/sf0.001").to_pandas()
        pf = doc_containment_pairs_prefix("/root/testdata/sf0.001").to_pandas()
        assert key(ap) == key(pf)


class TestFoldCollisionGuard:
    def test_no_self_pair_when_doc_repeats_in_bucket(self):
        """A to_id63 fold collision can place one doc twice in a token
        bucket; the candidate kernel must never emit (a, a)."""
        t = pa.table(
            {
                "tok": pa.array([7, 7, 7], pa.int64()),
                "doc_id": pa.array([1, 1, 2], pa.int64()),  # doc 1 twice
                "n": pa.array([4, 4, 4], pa.int64()),
            }
        )
        out = prefix_candidates_block(t, threshold=0.5).to_pydict()
        pairs = set(zip(out["a"], out["b"]))
        assert (1, 1) not in pairs
        assert pairs == {(1, 2)}
