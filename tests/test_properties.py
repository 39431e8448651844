"""Property-based tests (hypothesis) for the pure kernels — shingle-count
laws, estimator bounds, hash determinism/injectivity, extractor totality."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dynaalign_ray.extract import extract_text
from dynaalign_ray.fixtures import build_html
from dynaalign_ray.hashing import hash_strings, mix64, to_id63
from dynaalign_ray.shingles import (
    batch_shingle_hashes,
    bottomk_sketches,
    jaccard_from_sketches,
    minhash_signatures,
    signature_estimate,
)

words = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
texts = st.lists(words, min_size=0, max_size=40).map(" ".join)


class TestShingleLaws:
    @given(st.lists(texts, min_size=1, max_size=8), st.integers(1, 6))
    @settings(max_examples=50, deadline=None)
    def test_counts_law(self, docs, k):
        _, counts = batch_shingle_hashes(docs, k, "word")
        for doc, c in zip(docs, counts):
            assert c == max(len(doc.split()) - k + 1, 0)

    @given(texts, st.integers(1, 4))
    @settings(max_examples=50, deadline=None)
    def test_batching_invariance(self, doc, k):
        # a doc's shingle hashes must not depend on its batch neighbors
        h1, c1 = batch_shingle_hashes([doc], k, "word")
        h2, c2 = batch_shingle_hashes(["padding doc here", doc, "x y z"], k, "word")
        start = c2[0]
        assert c2[1] == c1[0]
        assert np.array_equal(h2[start : start + c2[1]], h1[: c1[0]])


class TestEstimatorBounds:
    @given(
        st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=60, unique=True),
        st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=60, unique=True),
    )
    @settings(max_examples=80, deadline=None)
    def test_jaccard_range_symmetry(self, a, b):
        aa = np.sort(np.array(a, dtype=np.uint64))
        bb = np.sort(np.array(b, dtype=np.uint64))
        j1 = jaccard_from_sketches(aa, bb, cap=512)
        j2 = jaccard_from_sketches(bb, aa, cap=512)
        assert 0.0 <= j1 <= 1.0
        assert j1 == j2
        if len(aa) and np.array_equal(aa, bb):
            assert j1 == 1.0

    @given(st.lists(texts.filter(lambda t: len(t.split()) >= 3), min_size=2, max_size=6))
    @settings(max_examples=30, deadline=None)
    def test_signature_estimate_bounds(self, docs):
        from dynaalign_ray.hashing import make_permutations

        h, c = batch_shingle_hashes(docs, 2, "word")
        a, b = make_permutations(32, 1)
        sig = minhash_signatures(h, c, a, b)
        est = signature_estimate(sig[0], sig[1])
        assert 0.0 <= est <= 1.0
        assert signature_estimate(sig[0], sig[0]) == 1.0


class TestHashLaws:
    @given(st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=50))
    @settings(max_examples=50, deadline=None)
    def test_hash_deterministic(self, values):
        h1 = hash_strings(values, seed=7)
        h2 = hash_strings(values, seed=7)
        assert np.array_equal(h1, h2)

    @given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_mix64_injective(self, xs):
        arr = np.array(xs, dtype=np.uint64)
        assert len(np.unique(mix64(arr))) == len(arr)
        assert (to_id63(arr) >= 0).all()


class TestExtractorTotality:
    @given(st.binary(max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_never_raises(self, blob):
        out = extract_text(blob)
        assert isinstance(out, str)

    @given(st.lists(st.lists(words, min_size=1, max_size=10), min_size=1, max_size=4),
           st.integers(0, 96))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_invariant(self, paragraphs, site):
        text = "\n".join(" ".join(p) for p in paragraphs)
        assert extract_text(build_html(text, site)) == text


class TestSketchLaws:
    @given(st.lists(texts, min_size=1, max_size=6), st.integers(1, 64))
    @settings(max_examples=40, deadline=None)
    def test_bottomk_cap_respected(self, docs, cap):
        h, c = batch_shingle_hashes(docs, 2, "word")
        vals, sizes, distinct = bottomk_sketches(h, c, cap)
        assert (sizes <= cap).all()
        assert (sizes <= distinct).all()
        # sketches sorted ascending per doc
        off = np.concatenate([[0], np.cumsum(sizes)])
        for i in range(len(sizes)):
            seg = vals[off[i] : off[i + 1]]
            assert np.array_equal(seg, np.sort(seg))


class TestTrailingWindowLaw:
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),          # user
                st.integers(0, 500),        # ts offset (us scale shrunk)
                st.floats(-100, 100),       # value
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(1, 200),                # window size
    )
    @settings(max_examples=60, deadline=None)
    def test_matches_quadratic_reference(self, rows, window):
        """trailing_window_block == the O(n^2) literal RANGE-frame definition
        (same user, ts in [ts_i - W, ts_i], ALL peers included)."""
        import pyarrow as pa

        from dynaalign_ray.stages.windows import trailing_window_block

        t0 = 1_700_000_000_000_000
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "ts": pa.array(
                    np.array([t0 + t for _, t, _ in rows]), pa.timestamp("us")
                ),
                "value": pa.array([v for _, _, v in rows], pa.float64()),
            }
        )
        out = {
            r["event_id"]: (r["trail_cents"], r["trail_n"])
            for r in trailing_window_block(tbl, window_us=window).to_pylist()
        }
        cents = [
            int(np.sign(v * 100.0) * np.floor(abs(v * 100.0) + 0.5)) for _, _, v in rows
        ]
        for i, (u, t, _) in enumerate(rows):
            frame = [
                j
                for j, (u2, t2, _) in enumerate(rows)
                if u2 == u and t - window <= t2 <= t
            ]
            assert out[i] == (sum(cents[j] for j in frame), len(frame))


class TestPpmRoundtripLaw:
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, w, h, seed):
        from dynaalign_ray.functions.multimodal import decode_ppm, encode_ppm

        rng = np.random.Generator(np.random.PCG64(seed))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


class TestWavRoundtripLaw:
    @given(st.integers(0, 5000), st.integers(0, 2**31 - 1), st.sampled_from([8000, 16000, 44100]))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, n, seed, rate):
        from dynaalign_ray.functions.multimodal import decode_wav, encode_wav

        rng = np.random.Generator(np.random.PCG64(seed))
        samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        out, r = decode_wav(encode_wav(samples, rate))
        assert r == rate
        np.testing.assert_array_equal(out, samples)
