"""Property tests for the round-4 kernels: the winnowing guarantee,
median-gap vs a quadratic reference, per-group MAD vs numpy, and JPEG
roundtrip robustness."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


class TestWinnowGuarantee:
    @settings(max_examples=40, deadline=None)
    @given(
        st.text(alphabet="abcdef ", min_size=40, max_size=120),
        st.integers(0, 20),
        st.integers(30, 60),
    )
    def test_shared_long_substring_shares_a_fingerprint(self, base, at, sub_len):
        """Schleimer et al.'s guarantee: two docs sharing a substring of
        length >= kgram + window - 1 share at least one selected
        fingerprint."""
        from dynaalign_ray.stages.substring import _gram_hashes, _winnow

        kgram, window = 16, 8
        shared = base[: kgram + window - 1 + (sub_len % 20)]
        # embed the shared run in two different contexts
        doc_a = "x" * at + shared + "qq"
        doc_b = "zz" + shared + "y" * at
        fa = set(_winnow(_gram_hashes(doc_a, kgram), window).tolist())
        fb = set(_winnow(_gram_hashes(doc_b, kgram), window).tolist())
        assert fa & fb

    @settings(max_examples=40, deadline=None)
    @given(st.text(alphabet="abcd", min_size=0, max_size=100))
    def test_winnow_subset_of_gram_hashes(self, doc):
        from dynaalign_ray.stages.substring import _gram_hashes, _winnow

        g = _gram_hashes(doc, 16)
        w = _winnow(g, 8)
        assert set(w.tolist()) <= set(g.tolist())
        if len(g):
            assert len(w)  # never empty when grams exist


class TestSegmentTriu:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(0, 7), min_size=0, max_size=12),
        st.integers(1, 6),
    )
    def test_matches_per_bucket_triu(self, sizes, cap):
        """segment_triu_rows == the naive per-bucket np.triu_indices loop
        for every bucket-size layout and selection cap."""
        from dynaalign_ray.stages.bands import segment_triu_rows

        sizes_arr = np.array(sizes, dtype=np.int64)
        ends = np.cumsum(sizes_arr)
        starts = ends - sizes_arr
        select = (sizes_arr >= 2) & (sizes_arr <= cap)
        got_a, got_b = segment_triu_rows(starts, ends, select)
        want_a, want_b = [], []
        for s, e, sel in zip(starts, ends, select):
            if not sel:
                continue
            ai, bi = np.triu_indices(e - s, k=1)
            want_a.extend((s + ai).tolist())
            want_b.extend((s + bi).tolist())
        assert got_a.tolist() == want_a
        assert got_b.tolist() == want_b


class TestBatchedWinnower:
    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.text(alphabet="abcdef x", min_size=0, max_size=90), max_size=12),
        st.integers(4, 20),
        st.integers(1, 10),
    )
    def test_matches_per_doc_path(self, docs, kgram, window):
        """winnow_batch (one zero-copy pass + O(n) sliding min) returns
        the exact per-doc anchor sets of _winnow(_gram_hashes(...))."""
        from dynaalign_ray.stages.substring import (
            _gram_hashes,
            _gram_hashes_batch,
            _winnow,
            winnow_batch,
        )

        col = pa.array(docs, type=pa.string())
        hashes, counts = _gram_hashes_batch(col, kgram)
        ends = np.cumsum(counts)
        for i, doc in enumerate(docs):
            want = _gram_hashes(doc, kgram)
            got = hashes[ends[i] - counts[i] : ends[i]]
            assert np.array_equal(got, want), f"doc {i} gram hashes differ"
        doc_idx, fps = winnow_batch(col, kgram, window)
        for i, doc in enumerate(docs):
            want_set = set(_winnow(_gram_hashes(doc, kgram), window).tolist())
            got_set = set(fps[doc_idx == i].tolist())
            assert got_set == want_set, f"doc {i} fingerprints differ"

    def test_sliding_min_matches_naive(self):
        from dynaalign_ray.stages.substring import _sliding_min_1d

        rng = np.random.Generator(np.random.PCG64(7))
        for n in (1, 5, 17, 64, 100):
            a = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
            for w in (1, 2, 3, 7, n, n + 3):
                got = _sliding_min_1d(a, w)
                m = n - w + 1
                if w <= 1:
                    assert np.array_equal(got, a)
                elif m <= 0:
                    assert len(got) == 0
                else:
                    want = np.array(
                        [a[i : i + w].min() for i in range(m)], dtype=np.uint64
                    )
                    assert np.array_equal(got, want)


class TestMedianGapProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 5), st.integers(0, 10_000)),
            min_size=1,
            max_size=60,
        )
    )
    def test_matches_quadratic_reference(self, rows):
        from dynaalign_ray.stages.windows import median_gap_block

        eids = list(range(1, len(rows) + 1))
        t = pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
            }
        )
        out = {
            r["user_id"]: (r["median_gap_us"], r["n_gaps"])
            for r in median_gap_block(t).to_pylist()
        }
        # quadratic reference via numpy
        ref = {}
        by_user: dict[int, list[tuple[int, int]]] = {}
        for eid, (u, ts) in zip(eids, rows):
            by_user.setdefault(u, []).append((ts, eid))
        for u, evs in by_user.items():
            evs.sort()
            gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
            if gaps:
                ref[u] = (float(np.median(gaps)), len(gaps))
        assert out == ref


class TestMadProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["A", "N", "R"]), st.floats(0, 1e6)),
            min_size=1,
            max_size=80,
        )
    )
    def test_seg_median_matches_numpy(self, rows):
        """The engine's vectorized segment-median kernel == per-group
        np.median, for both the value pass and the MAD pass."""
        from dynaalign_ray.pipelines.relational import _seg_median

        flags = np.array([ord(f) for f, _ in rows], dtype=np.int64)
        vals = np.array([v for _, v in rows], dtype=np.float64)
        gkeys, counts, med, _ = _seg_median(flags, vals)
        med_per_row = med[np.searchsorted(gkeys, flags)]
        _, _, mad, _ = _seg_median(flags, np.abs(vals - med_per_row))
        for i, g in enumerate(gkeys):
            v = vals[flags == g]
            assert counts[i] == len(v)
            assert med[i] == float(np.median(v))
            assert mad[i] == float(np.median(np.abs(v - np.median(v))))


class TestJpegFuzz:
    @settings(max_examples=10, deadline=None)
    @given(
        st.integers(8, 40),
        st.integers(8, 40),
        st.integers(55, 95),
        st.booleans(),
        st.integers(0, 42),
    )
    def test_roundtrip_never_crashes_and_shapes_hold(self, h, w, q, sub, seed):
        from dynaalign_ray.functions.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        assert out.dtype == np.uint8
