"""DSIR importance resampling (functions/ngramlm.py:dsir_weight_block,
pipelines/curation.py:doc_dsir_weights / doc_dsir_sample)."""

import functools

import numpy as np
import pyarrow as pa

from dynaalign_ray.functions.ngramlm import (
    dsir_weight_block,
    train_trigram_model,
)


def _naive_trigrams(t: str) -> list[str]:
    return [t[i : i + 3] for i in range(len(t) - 2)]


def _brute_weights(texts, ids, tgt_texts, vocab):
    """Pure-Python DSIR: two truncated trigram models (target slice, raw
    corpus), weight = (hit_t+1)*T_raw / ((hit_r+1)*T_tgt) with the exact
    same float op order as the engine."""
    from collections import Counter

    def model(train):
        c = Counter()
        for t in train:
            c.update(_naive_trigrams(t))
        T = sum(c.values())
        top = dict(
            sorted(c.items(), key=lambda kv: (-kv[1], kv[0].encode("utf-8")))[
                :vocab
            ]
        )
        return top, T

    tgt_top, t_tgt = model(tgt_texts)
    raw_top, t_raw = model(texts)
    out = {}
    for d, t in zip(ids, texts):
        grams = _naive_trigrams(t)
        ht = sum(tgt_top.get(g, 0) for g in grams)
        hr = sum(raw_top.get(g, 0) for g in grams)
        w = (float(ht + 1) * float(t_raw)) / (float(hr + 1) * float(t_tgt))
        out[d] = (len(grams), ht, hr, w)
    return out


class TestDsirBlock:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        texts = [
            "the cat sat on the mat",  # target-like
            "the cat sat",
            "zzz qqq xxx jjj www",  # noise
            "",
            "ab",
            "the mat the mat the mat",
        ]
        tgt = ["the cat sat on the mat", "the mat sat"]
        ids = list(range(len(texts)))
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        )
        tgt_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(tgt)), pa.int64()),
                    "text": tgt,
                }
            )
        )
        for vocab in (4, 4096):
            tgt_ref = train_trigram_model(tgt_ds, vocab=vocab, num_partitions=2)
            raw_ref = train_trigram_model(docs, vocab=vocab, num_partitions=2)
            got = {
                r["doc_id"]: (
                    r["n_trigrams"],
                    r["hit_target"],
                    r["hit_raw"],
                    r["weight"],
                )
                for r in docs.map_batches(
                    functools.partial(
                        dsir_weight_block, target_ref=tgt_ref, raw_ref=raw_ref
                    ),
                    batch_format="pyarrow",
                ).take_all()
            }
            want = _brute_weights(texts, ids, tgt, vocab)
            assert got.keys() == want.keys()
            for d in ids:
                assert got[d][:3] == want[d][:3], (d, vocab)
                assert got[d][3] == want[d][3], (d, vocab)  # bit-exact

    def test_target_like_outranks_noise(self, ray_session):
        """The law DSIR selection relies on: a doc drawn from the target
        distribution gets a strictly higher weight than off-distribution
        noise."""
        import ray.data as rd

        texts = ["the cat sat on the mat", "zzz qqq xxx jjj www"]
        tgt = ["the cat sat", "on the mat", "a cat sat on a mat"]
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": texts})
        )
        tgt_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(tgt)), pa.int64()),
                    "text": tgt,
                }
            )
        )
        tgt_ref = train_trigram_model(tgt_ds, vocab=4096, num_partitions=2)
        raw_ref = train_trigram_model(docs, vocab=4096, num_partitions=2)
        w = {
            r["doc_id"]: r["weight"]
            for r in docs.map_batches(
                functools.partial(
                    dsir_weight_block, target_ref=tgt_ref, raw_ref=raw_ref
                ),
                batch_format="pyarrow",
            ).take_all()
        }
        assert w[0] > w[1]


class TestDualTrainer:
    def test_bit_identical_to_two_single_trainers(self, ray_session):
        import ray
        import ray.data as rd

        from dynaalign_ray.exec import configure_context
        from dynaalign_ray.functions.ngramlm import train_dual_trigram_models

        configure_context()
        rng = np.random.default_rng(7)
        texts = [
            "".join(rng.choice(list("abcdef "), size=40)) for _ in range(60)
        ]
        srcs = ["src0" if i % 3 == 0 else "srcX" for i in range(60)]
        t = pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(srcs),
            }
        )
        tgt_ref, raw_ref = train_dual_trigram_models(
            rd.from_arrow(t), target_source="src0", vocab=64, num_partitions=2
        )
        tgt_single = train_trigram_model(
            rd.from_arrow(t.filter(pa.compute.equal(t.column("source"), "src0"))),
            vocab=64,
            num_partitions=2,
        )
        raw_single = train_trigram_model(
            rd.from_arrow(t), vocab=64, num_partitions=2
        )
        for dual, single in ((tgt_ref, tgt_single), (raw_ref, raw_single)):
            dk, dc, dT = ray.get(dual)
            sk, sc, sT = ray.get(single)
            assert dT == sT
            assert np.array_equal(dk, sk)
            assert np.array_equal(dc, sc)


class TestDsirQueries:
    def test_weights_on_testdata(self, ray_session):
        from dynaalign_ray.pipelines.curation import doc_dsir_weights

        out = doc_dsir_weights("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert (out["weight"] > 0).all()  # smoothing: never 0
        assert out["doc_id"].is_unique
        assert np.isfinite(out["weight"]).all()
        assert (out["hit_target"] >= 0).all() and (out["hit_raw"] >= 0).all()

    def test_sample_is_topm_of_weights(self, ray_session):
        """doc_dsir_sample == the top-m rows of doc_dsir_weights under
        (weight DESC, doc_id ASC) — the partial-topk plan loses nothing."""
        from dynaalign_ray.pipelines.curation import (
            doc_dsir_sample,
            doc_dsir_weights,
        )

        m = 25
        full = doc_dsir_weights("/root/testdata/sf0.001").to_pandas()
        want = (
            full.sort_values(
                ["weight", "doc_id"], ascending=[False, True]
            )
            .head(m)[["doc_id", "weight"]]
            .reset_index(drop=True)
        )
        got = (
            doc_dsir_sample("/root/testdata/sf0.001", m=m)
            .to_pandas()
            .sort_values(["weight", "doc_id"], ascending=[False, True])
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert np.array_equal(
            got["weight"].to_numpy(), want["weight"].to_numpy()
        )
