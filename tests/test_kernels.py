"""Unit tests for the vectorized kernels, mirroring the reference's property
set (/root/reference/tests/testthat/test-minHash.R): exact shingle counts,
edge cases (len == k, len < k, k = 1), signature shape/type/determinism,
similarity-estimator range, plus the engine's sketch/simhash additions."""

import numpy as np
import pytest

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.hashing import (
    content_hash,
    doc_id_from_urls,
    hash_strings,
    make_permutations,
    mix64,
    to_id63,
)
from dynaalign_ray.shingles import (
    batch_shingle_hashes,
    bottomk_sketches,
    jaccard_from_sketches,
    minhash_signatures,
    signature_estimate,
    simhash_signatures,
)

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _offsets(counts):
    return np.concatenate([[0], np.cumsum(counts)])


class TestShingling:
    def test_word_shingle_counts(self):
        # "ABCDEF" with k=3 -> 4 shingles (test-minHash.R:4 semantics, word mode)
        _, counts = batch_shingle_hashes(["a b c d e f"], 3, "word")
        assert counts.tolist() == [4]

    def test_char_mode_matches_reference_shingle(self):
        # shingle("ABCDEF", 3) == ABC BCD CDE DEF: 4 shingles; shared
        # substrings hash identically across docs
        h, counts = batch_shingle_hashes(["ABCDEF", "BCDEF"], 3, "char")
        assert counts.tolist() == [4, 3]
        o = _offsets(counts)
        s0, s1 = set(h[o[0] : o[1]].tolist()), set(h[o[1] : o[2]].tolist())
        assert len(s0 & s1) == 3  # BCD CDE DEF shared

    def test_len_equals_k(self):
        _, counts = batch_shingle_hashes(["abc"], 3, "char")
        assert counts.tolist() == [1]

    def test_len_below_k_empty(self):
        # generate_kmers returns empty for len < k (src/minHash.cpp:99-101)
        h, counts = batch_shingle_hashes(["ab"], 3, "char")
        assert counts.tolist() == [0] and len(h) == 0

    def test_k1(self):
        _, counts = batch_shingle_hashes(["x y z"], 1, "word")
        assert counts.tolist() == [3]

    def test_no_cross_doc_windows(self):
        # windows must not span doc boundaries
        h2, c2 = batch_shingle_hashes(["a b c", "d e f"], 3, "word")
        h1, c1 = batch_shingle_hashes(["a b c"], 3, "word")
        assert c2.tolist() == [1, 1]
        assert h2[0] == h1[0]

    def test_order_sensitive(self):
        ha, _ = batch_shingle_hashes(["a b c"], 3, "word")
        hb, _ = batch_shingle_hashes(["c b a"], 3, "word")
        assert ha[0] != hb[0]


class TestSignatures:
    def test_shape_and_determinism(self):
        # n_hash x n shape + fixed-seed determinism (test-minHash.R:75-89;
        # unlike the reference, which is random_device-seeded)
        a, b = make_permutations(64, 7)
        h, c = batch_shingle_hashes(["a b c d e f", "a b c d e g"], 3, "word")
        s1 = minhash_signatures(h, c, a, b)
        s2 = minhash_signatures(h, c, a, b)
        assert s1.shape == (2, 64)
        assert (s1 == s2).all()

    def test_empty_doc_sentinel(self):
        a, b = make_permutations(16, 7)
        h, c = batch_shingle_hashes(["a b c d e", ""], 4, "word")
        sig = minhash_signatures(h, c, a, b)
        assert (sig[1] == U64_MAX).all()
        assert not (sig[0] == U64_MAX).all()

    def test_estimator_tracks_jaccard(self):
        # mean matching slots ~ true Jaccard (src/minHash.cpp:160-178)
        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(200)]
        t1 = " ".join(rng.choice(words, 300))
        toks = t1.split()
        toks2 = list(toks)
        for i in rng.choice(len(toks2), 15, replace=False):
            toks2[i] = "sub" + str(i)
        t2 = " ".join(toks2)
        a, b = make_permutations(256, 3)
        h, c = batch_shingle_hashes([t1, t2], 5, "word")
        sig = minhash_signatures(h, c, a, b)
        est = signature_estimate(sig[0], sig[1])
        o = _offsets(c)
        sa = np.unique(h[o[0] : o[1]])
        sb = np.unique(h[o[1] : o[2]])
        true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
        assert 0 <= est <= 1
        assert abs(est - true_j) < 0.12

    def test_identical_docs_estimate_one(self):
        a, b = make_permutations(32, 5)
        h, c = batch_shingle_hashes(["x y z w v u", "x y z w v u"], 3, "word")
        sig = minhash_signatures(h, c, a, b)
        assert signature_estimate(sig[0], sig[1]) == 1.0


class TestSketches:
    def test_distinct_and_capped(self):
        h, c = batch_shingle_hashes(["a b a b a b a b"], 2, "word")
        vals, sizes, distinct = bottomk_sketches(h, c, cap=512)
        # shingles: ab ba ab ba ... -> 2 distinct
        assert distinct.tolist() == [2] and sizes.tolist() == [2]
        vals2, sizes2, _ = bottomk_sketches(h, c, cap=1)
        assert sizes2.tolist() == [1]
        assert vals2[0] == min(vals.tolist())  # bottom-k keeps smallest

    def test_exact_jaccard(self):
        h, c = batch_shingle_hashes(["a b c d e f", "a b c d e g"], 3, "word")
        vals, sizes, _ = bottomk_sketches(h, c, cap=512)
        o = _offsets(sizes)
        j = jaccard_from_sketches(vals[o[0] : o[1]], vals[o[1] : o[2]], 512)
        # 4 shingles each: abc bcd cde {def|deg}; 3 shared, union 5
        assert j == pytest.approx(3 / 5)

    def test_bottomk_estimator_reasonable(self):
        # shared elements must be a value-uncorrelated subset (bottom-k
        # assumes a uniform hash space, which real shingle hashes satisfy)
        rng = np.random.default_rng(1)
        a = np.unique(rng.integers(0, 2**63, 4000).astype(np.uint64))
        shared = rng.choice(a, 2000, replace=False)
        fresh = np.unique(rng.integers(0, 2**63, 2000).astype(np.uint64))
        b = np.unique(np.concatenate([shared, fresh]))
        true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
        cap = 256
        est = jaccard_from_sketches(np.sort(a)[:cap], np.sort(b)[:cap], cap)
        assert abs(est - true_j) < 0.1


class TestSimHash:
    def test_identical_and_different(self):
        h, c = batch_shingle_hashes(
            ["p q r s t u v w", "p q r s t u v w", "a b c d e f g h"], 3, "word"
        )
        sim = simhash_signatures(h, c)
        assert sim[0] == sim[1]
        assert sim[0] != sim[2]
        assert simhash_signatures(np.empty(0, np.uint64), np.array([0]))[0] == 0


class TestHashing:
    def test_string_hash_deterministic_and_seeded(self):
        h1 = hash_strings(["x", "y"], seed=1)
        h2 = hash_strings(["x", "y"], seed=1)
        h3 = hash_strings(["x", "y"], seed=2)
        assert (h1 == h2).all() and (h1 != h3).any()

    def test_id63_nonnegative(self):
        ids = doc_id_from_urls([f"https://s/{i}" for i in range(1000)])
        assert ids.dtype == np.int64 and (ids >= 0).all()
        assert len(set(ids.tolist())) == 1000

    def test_mix64_bijective_sample(self):
        x = np.arange(10000, dtype=np.uint64)
        assert len(np.unique(mix64(x))) == 10000

    def test_content_hash(self):
        h = content_hash(["same", "same", "diff"])
        assert h[0] == h[1] != h[2]
        assert to_id63(np.array([2**64 - 1], dtype=np.uint64))[0] >= 0
