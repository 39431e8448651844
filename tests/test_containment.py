"""Containment-pairs operator: a short doc embedded in a long one must be
caught at containment ~1.0 even when Jaccard is far below any dedup τ."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


@pytest.fixture()
def rd(ray_session):
    return ray.data


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


class TestContainmentPairs:
    def test_planted_partial_dup(self, rd, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import (
            doc_containment_pairs,
            doc_jaccard_pairs,
        )

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(500)]
        long_doc = " ".join(rng.choice(vocab, size=400))
        short_doc = " ".join(long_doc.split()[100:140])  # 40 of 400 tokens
        other = " ".join(rng.choice(vocab, size=300))
        sf = _write_docs(tmp_path, [long_doc, short_doc, other])

        cont = {
            (r["a"], r["b"]): r["containment"]
            for r in doc_containment_pairs(sf, k=3, threshold=0.8).take_all()
        }
        assert (0, 1) in cont and cont[(0, 1)] == pytest.approx(1.0)
        jac = {
            (r["a"], r["b"])
            for r in doc_jaccard_pairs(sf, k=3, threshold=0.5).take_all()
        }
        assert (0, 1) not in jac  # invisible to Jaccard dedup

    def test_matches_python_oracle(self, rd, ray_session, tmp_path):
        from dynaalign_ray.pipelines.curation import doc_containment_pairs

        rng = np.random.default_rng(11)
        vocab = [f"t{i}" for i in range(60)]
        base = list(rng.choice(vocab, size=80))
        texts = []
        for _ in range(10):  # overlapping slices of a shared base sequence
            lo = int(rng.integers(0, 40))
            hi = int(rng.integers(lo + 5, 81))
            tail = list(rng.choice(vocab, size=rng.integers(0, 10)))
            texts.append(" ".join(base[lo:hi] + tail))
        for _ in range(20):  # unrelated noise docs
            texts.append(" ".join(rng.choice(vocab, size=rng.integers(3, 40))))
        sf = _write_docs(tmp_path, texts)

        def shingles(s, k=3):
            toks = s.split()
            return {
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            }

        sets = [shingles(t) for t in texts]
        want = {}
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                if not sets[a] or not sets[b]:
                    continue
                i = len(sets[a] & sets[b])
                c = i / min(len(sets[a]), len(sets[b]))
                if c >= 0.3:
                    want[(a, b)] = c
        got = {
            (r["a"], r["b"]): r["containment"]
            for r in doc_containment_pairs(sf, k=3, threshold=0.3).take_all()
        }
        assert set(got) == set(want)
        for key, v in want.items():
            assert got[key] == pytest.approx(v, abs=1e-4)
        assert len(want) > 0


class TestHeavyTokens:
    def _write(self, tmp_path, texts):
        return _write_docs(tmp_path, texts)

    def test_matches_exact_counter(self, ray_session, tmp_path):
        from collections import Counter

        from dynaalign_ray.pipelines.curation import doc_heavy_tokens

        rng = np.random.default_rng(9)
        # zipf-ish: token ti has weight ~ 1/(i+1)
        vocab = [f"t{i}" for i in range(200)]
        weights = np.array([1.0 / (i + 1) for i in range(200)])
        weights /= weights.sum()
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(5, 60), p=weights))
            for _ in range(120)
        ]
        sf = self._write(tmp_path, texts)
        got = [(r["token"], r["n"]) for r in doc_heavy_tokens(sf, k=10).take_all()]
        cnt = Counter(t for x in texts for t in x.split())
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == want

    def test_tiny_w_falls_back_exact(self, ray_session, tmp_path):
        """With w too small the eps bound can't certify the candidates; the
        plan must flip to the exact fallback and still be exact."""
        from collections import Counter

        from dynaalign_ray.functions.heavyhitters import top_tokens

        import ray.data as rd
        from dynaalign_ray.exec import configure_context

        rng = np.random.default_rng(10)
        vocab = [f"w{i}" for i in range(500)]  # flat distribution
        texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(80)]
        sf = self._write(tmp_path, texts)
        configure_context()
        ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]).repartition(num_blocks=6)
        got = [(r["token"], r["n"]) for r in top_tokens(ds, k=5, w=3).take_all()]
        cnt = Counter(t for x in texts for t in x.split())
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert got == want
