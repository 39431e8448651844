"""Edit-distance join kernels: batched-DP parity vs a scalar reference,
the deletion-neighborhood recall guarantee, and variant fan-out bounds."""

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dynaalign_ray.functions.editdist import (
    deletion_variant_keys,
    deletion_variants,
    levenshtein_batch,
)


def lev_ref(s: str, t: str) -> int:
    """Scalar Wagner-Fischer reference."""
    m, n = len(s), len(t)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (s[i - 1] != t[j - 1]))
            prev = cur
    return d[n]


WORD = st.text(alphabet="abcde", min_size=0, max_size=9)


class TestBatchedDP:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(WORD, WORD), min_size=1, max_size=20))
    def test_matches_scalar_reference(self, pairs):
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        got = levenshtein_batch(a, b)
        want = np.array([lev_ref(x, y) for x, y in pairs], dtype=np.int64)
        assert np.array_equal(got, want)

    def test_empty_batch_and_empty_strings(self):
        assert levenshtein_batch([], []).shape == (0,)
        assert levenshtein_batch([""], [""]).tolist() == [0]
        assert levenshtein_batch(["", "abc"], ["xy", ""]).tolist() == [2, 3]

    def test_unicode(self):
        assert levenshtein_batch(["héllo"], ["hello"]).tolist() == [1]


class TestDeletionBlocking:
    @settings(max_examples=60, deadline=None)
    @given(WORD, WORD)
    def test_recall_complete_d2(self, s, t):
        """lev(s, t) <= 2  =>  the words share a <=2-deletion variant."""
        if lev_ref(s, t) <= 2:
            assert set(deletion_variants(s, 2)) & set(deletion_variants(t, 2))

    @settings(max_examples=40, deadline=None)
    @given(WORD)
    def test_fanout_bound(self, w):
        """|variants| <= 1 + L + C(L, 2) at d = 2."""
        L = len(w)
        assert len(deletion_variants(w, 2)) <= 1 + L + L * (L - 1) // 2

    def test_known_variants(self):
        assert deletion_variants("ab", 2) == ["", "a", "ab", "b"]
        assert "prt" in deletion_variants("part", 1)


class TestBatchedVariantKeys:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(WORD, min_size=1, max_size=15, unique=True), st.integers(0, 3))
    def test_group_structure_matches_string_variants(self, vocab, d):
        """Two words share a batched key iff they share a variant string,
        and per-word key counts equal per-word distinct-variant counts
        (no 64-bit collisions at this scale)."""
        idx, key = deletion_variant_keys(vocab, d)
        got_per_word = {
            i: {int(k) for k in key[idx == i]} for i in range(len(vocab))
        }
        want_per_word = {i: set(deletion_variants(w, d)) for i, w in enumerate(vocab)}
        for i in range(len(vocab)):
            assert len(got_per_word[i]) == len(want_per_word[i])
        for a in range(len(vocab)):
            for b in range(a + 1, len(vocab)):
                share_key = bool(got_per_word[a] & got_per_word[b])
                share_str = bool(want_per_word[a] & want_per_word[b])
                assert share_key == share_str

    def test_empty_and_unicode(self):
        idx, key = deletion_variant_keys([], 2)
        assert idx.shape == (0,) and key.shape == (0,)
        # unicode words: "héllo" minus one char reaches "hello"? no —
        # but "héllo" and "hxllo" share the deletion variant "hllo"
        idx, key = deletion_variant_keys(["héllo", "hxllo"], 1)
        k0 = {int(k) for k in key[idx == 0]}
        k1 = {int(k) for k in key[idx == 1]}
        assert k0 & k1
        assert (key >= 0).all()


class TestHotBucketGuard:
    def test_oversized_variant_bucket_raises_loudly(self, ray_session, tmp_path):
        """A variant bucket past hot_bucket_cap must raise with the
        bounding knobs named — never silently drop or sample pairs."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest
        import ray

        from dynaalign_ray.pipelines.curation import vocab_edit_pairs

        # every 3-letter word built from one repeated letter pool shares
        # the 1-char deletion variants of its letters at max_dist=2
        words = [a + b + "q" for a in "abcdefgh" for b in "abcdefgh"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0], pa.int64()),
                    "text": pa.array([" ".join(words)]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["s"]),
                    "n_chars": pa.array([1], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        with pytest.raises(ray.exceptions.RayTaskError, match="hot_bucket_cap"):
            vocab_edit_pairs(str(tmp_path), hot_bucket_cap=5).count()


class TestFixtureJoin:
    def test_fixture_pairs_match_bruteforce(self, ray_session, tmp_path):
        """The full pipeline on a small parquet fixture equals the O(n^2)
        brute force over its distinct vocabulary."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dynaalign_ray.pipelines.curation import vocab_edit_pairs

        texts = [
            "part sort spark fast hash slow row big agg",
            "the merge table batch window part fast",
            "scan column order key join value line",
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * len(texts)),
                    "source": pa.array(["s"] * len(texts)),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = vocab_edit_pairs(str(tmp_path)).to_pandas()
        got_set = set(map(tuple, got[["w1", "w2", "dist"]].itertuples(index=False)))
        vocab = sorted({w for t in texts for w in t.split() if len(w) >= 3})
        want = {
            (a, b, lev_ref(a, b))
            for a, b in itertools.combinations(vocab, 2)
            if lev_ref(a, b) <= 2
        }
        assert got_set == want
