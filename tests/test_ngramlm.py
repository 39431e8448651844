"""Corpus-trained trigram-LM familiarity (functions/ngramlm.py)."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.functions.ngramlm import (
    familiarity_score_block,
    pack_trigram_windows,
    train_trigram_model,
)


def _naive_trigrams(t: str) -> list[str]:
    return [t[i : i + 3] for i in range(len(t) - 2)]


class TestPacking:
    def test_pack_matches_naive_windows(self):
        texts = ["abcd", "xy", "", "hello world", "ab\nc d"]
        flat, counts = pack_trigram_windows(texts)
        assert counts.tolist() == [2, 0, 0, 9, 4]
        assert len(flat) == counts.sum()
        # decode each pack back to its trigram and compare
        i = 0
        for t, c in zip(texts, counts):
            grams = _naive_trigrams(t)
            for g in grams:
                p = int(flat[i])
                got = chr(p >> 42) + chr((p >> 21) & 0x1FFFFF) + chr(p & 0x1FFFFF)
                assert got == g
                i += 1

    def test_pack_order_is_utf8_string_order(self):
        # the top-V tie-break relies on numeric pack order == binary UTF-8
        # order of the trigram strings; check across BMP + astral planes
        rng = np.random.default_rng(5)
        cps = np.concatenate(
            [
                rng.integers(32, 127, 40),
                rng.integers(0x80, 0xD7FF, 20),
                rng.integers(0x10000, 0x10FFFF, 20),
            ]
        )
        tris = [
            "".join(chr(int(c)) for c in rng.choice(cps, 3)) for _ in range(300)
        ]
        packs, _ = pack_trigram_windows(tris)
        by_pack = [t for _, t in sorted(zip(packs[::1], tris))]
        # each text of length 3 yields exactly one window
        by_bytes = sorted(tris, key=lambda s: s.encode("utf-8"))
        assert by_pack == by_bytes


def _brute(texts, ids, vocab):
    """Pure-Python reference: exact counts, top-vocab by (n desc, gram asc),
    familiarity = hits / (n_windows * T)."""
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(_naive_trigrams(t))
    T = sum(c.values())
    top = dict(
        sorted(c.items(), key=lambda kv: (-kv[1], kv[0].encode("utf-8")))[:vocab]
    )
    out = {}
    for d, t in zip(ids, texts):
        grams = _naive_trigrams(t)
        hits = sum(top.get(g, 0) for g in grams)
        fam = hits / (len(grams) * T) if grams else 0.0
        out[d] = (len(grams), hits, fam)
    return out


class TestFamiliarityEndToEnd:
    @pytest.mark.parametrize("vocab", [3, 4096])
    def test_matches_brute_force_with_truncation(self, ray_session, vocab):
        import ray.data as rd

        texts = [
            "the cat sat on the mat",
            "the cat sat",
            "zzz qqq xxx",
            "",
            "ab",
            "the the the the",
        ]
        ids = list(range(len(texts)))
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        )
        ref = train_trigram_model(docs, vocab=vocab, num_partitions=2)
        import functools

        got = {
            r["doc_id"]: (r["n_trigrams"], r["hit_count"], r["familiarity"])
            for r in docs.map_batches(
                functools.partial(familiarity_score_block, model_ref=ref),
                batch_format="pyarrow",
            ).take_all()
        }
        want = _brute(texts, ids, vocab)
        assert got.keys() == want.keys()
        for d in ids:
            assert got[d][0] == want[d][0], d
            assert got[d][1] == want[d][1], (d, vocab)
            assert got[d][2] == want[d][2], d  # bit-exact: same ints, one div

    def test_query_runs_on_testdata(self, ray_session):
        from dynaalign_ray.pipelines.curation import doc_lm_familiarity

        out = doc_lm_familiarity("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert (out["familiarity"] >= 0).all()
        assert (out["familiarity"] <= 1).all()
        # word-soup corpus: every doc shares trigrams with the corpus
        assert (out.loc[out["n_trigrams"] > 0, "hit_count"] > 0).all()


class TestCrossCorpusRef:
    def test_ref_trained_scoring_runs_and_is_ref_grounded(self, ray_session):
        from dynaalign_ray.pipelines.curation import doc_lm_familiarity_ref

        out = doc_lm_familiarity_ref(
            "/root/testdata/sf0.001", ref_source="src0"
        ).to_pandas()
        assert len(out) == 500
        assert (out["familiarity"] >= 0).all()
        # every trigram of a src0 doc is in the (untruncated-at-this-size)
        # reference model, so src0 docs must all register hits
        import duckdb

        src0 = set(
            r[0]
            for r in duckdb.sql(
                "SELECT doc_id FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet') "
                "WHERE source='src0' AND length(text) >= 3"
            ).fetchall()
        )
        sub = out[out["doc_id"].isin(src0)]
        assert (sub["hit_count"] > 0).all()
