"""Tests for the secondary dedup stages, NW rescorer, text functions,
similarity search and multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.config import DedupConfig


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


def _docs_table():
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5,  # exact dup of 0
        "ALPHA  beta gamma delta epsilon zeta eta theta iota kappa " * 5,  # norm-dup-ish
        "totally different text about completely other things entirely " * 5,
        "short",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestExactDedup:
    def test_groups_and_decisions(self, rd):
        from dynaalign_ray.stages.dedup import exact_dedup_decisions, exact_dedup_groups

        ds = rd.from_arrow(_docs_table())
        groups = {
            r["doc_id"]: r["n_dups"]
            for r in exact_dedup_groups(ds, 4).take_all()
        }
        assert groups[1] == 2  # docs 1,2 identical; min doc_id = 1
        assert sum(groups.values()) == 5
        dec = {r["doc_id"]: (r["keep"], r["duplicate_of"])
               for r in exact_dedup_decisions(ds, 4).take_all()}
        assert dec[1] == (True, 1) and dec[2] == (False, 1)
        assert dec[3][0] and dec[4][0] and dec[5][0]

    def test_normalized(self, rd):
        from dynaalign_ray.stages.dedup import exact_dedup_groups

        ds = rd.from_arrow(_docs_table())
        groups = {
            r["doc_id"]: r["n_dups"]
            for r in exact_dedup_groups(ds, 4, normalize=True).take_all()
        }
        # doc 3 differs only by case/extra whitespace -> joins group of 1,2
        assert groups[1] == 3


class TestSimHashStage:
    def test_exact_dups_found(self, rd):
        from dynaalign_ray.stages.minhash import signatures_dataset
        from dynaalign_ray.stages.simhash_stage import simhash_edges

        cfg = DedupConfig(shingle_k=3)
        sigs = signatures_dataset(rd.from_arrow(_docs_table()), cfg).materialize()
        edges = simhash_edges(sigs, cfg, 4, max_hamming=3).take_all()
        pairs = {(r["a"], r["b"]): r["hamming"] for r in edges}
        assert pairs.get((1, 2)) == 0  # identical docs: Hamming 0
        assert (1, 4) not in pairs and (2, 4) not in pairs

    def test_popcount(self):
        from dynaalign_ray.stages.simhash_stage import _popcount64

        x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
        assert _popcount64(x).tolist() == [0, 1, 2, 64]


class TestSubstringStage:
    def test_planted_long_match(self, rd, small_corpus):
        # fixture 'substring' channel members embed a >=200-byte run from the
        # cluster seed while being overall-dissimilar
        from dynaalign_ray.extract import extract_text
        from dynaalign_ray.hashing import doc_id_from_urls
        from dynaalign_ray.stages.substring import substring_edges

        pages, truth = small_corpus
        texts = [extract_text(h) for h in pages.column("html").to_pylist()]
        ids = doc_id_from_urls(pages.column("url").to_pylist())
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        ).materialize()
        edges = substring_edges(docs, 4, min_len=200).take_all()
        linked = set()
        for r in edges:
            linked.add((r["a"], r["b"]))
            assert r["match_len"] >= 200
        # every 'substring' channel doc links to some member of its cluster
        url_to_id = dict(zip(pages.column("url").to_pylist(), ids.tolist()))
        by_cluster = {}
        for u, tc, ch in zip(truth.column("doc_url").to_pylist(),
                             truth.column("true_cluster").to_pylist(),
                             truth.column("channel").to_pylist()):
            by_cluster.setdefault(tc, []).append((u, ch))
        n_sub = 0
        for members in by_cluster.values():
            cluster_ids = {url_to_id[u] for u, _ in members}
            for u, ch in members:
                if ch != "substring":
                    continue
                n_sub += 1
                me = url_to_id[u]
                partners = {x for pair in linked for x in pair if me in pair}
                assert partners & (cluster_ids - {me}), f"substring doc {u} unlinked"
        assert n_sub > 0  # the corpus must actually exercise this


class TestNW:
    def test_known_values(self):
        from dynaalign_ray.stages.nw import nw_similarity

        assert nw_similarity("ARNDC", "ARNDC") == 1.0
        assert nw_similarity("ARNDC", "ARNEC") == pytest.approx(0.8)
        assert nw_similarity("", "") == 1.0
        assert nw_similarity("A", "") == 0.0

    def test_invalid_character(self):
        from dynaalign_ray.stages.nw import nw_similarity

        with pytest.raises(ValueError, match="invalid character"):
            nw_similarity("AJ", "AA")  # J not in the AA alphabet

    def test_actor_batch(self, rd):
        from dynaalign_ray.stages.nw import NWRescorer

        tbl = pa.table(
            {
                "a": pa.array([1], pa.int64()),
                "b": pa.array([2], pa.int64()),
                "text_a": ["ARNDCQEGHI"],
                "text_b": ["ARNDCQEGHI"],
            }
        )
        out = rd.from_arrow(tbl).map_batches(
            NWRescorer, batch_format="pyarrow", concurrency=1
        ).take_all()
        assert out[0]["nw_similarity"] == 1.0


class TestTextStats:
    def test_token_counts(self, rd):
        from dynaalign_ray.functions.textstats import token_count_batch

        tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "text": ["one two  three", ""]})
        out = token_count_batch(tbl)
        assert out.column("n_tokens").to_pylist() == [3, 0]

    def test_quality_features(self):
        from dynaalign_ray.functions.textstats import quality_score_batch

        tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "text": ["the cat sat on the mat and it was good " * 10,
                                 "!!! 123 ??? %%%"]})
        out = quality_score_batch(tbl)
        scores = out.column("quality_score").to_pylist()
        assert scores[0] > scores[1]
        assert out.column("stopword_ratio").to_pylist()[0] > 0.2

    def test_langid(self):
        from dynaalign_ray.functions.textstats import LangIdActor

        actor = LangIdActor()
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "the cat is in the house and that was good for the dog",
                    "der Hund ist nicht in das Haus und die Katze war da",
                    "xyzzy plugh qwop",
                ],
            }
        )
        out = actor(tbl).column("pred_lang").to_pylist()
        assert out[0] == "en" and out[1] == "de" and out[2] == "unknown"

    def test_fingerprint_deterministic(self):
        from dynaalign_ray.functions.textstats import fingerprint_batch

        tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                        "text": ["same document text here ok", "same document text here ok", "x"]})
        fps = fingerprint_batch(tbl).column("fingerprint").to_pylist()
        assert fps[0] == fps[1] != fps[2]


class TestSimilaritySearch:
    def test_bruteforce_exact(self, rd):
        from dynaalign_ray.functions.similarity_search import brute_force_topk

        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((100, 16)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(100), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
        q = vecs[:2].astype(np.float64)
        out = brute_force_topk(rd.from_arrow(tbl), q, k=3,
                               exclude_ids=np.array([0, 1]))
        df = out.to_pandas()
        # oracle: numpy all-pairs
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for qi in (0, 1):
            sims = nv @ nv[qi]
            sims[qi] = -np.inf
            expect = np.lexsort((np.arange(100), -sims))[:3]
            got = df[df.query_id == qi].sort_values("rank").vec_id.tolist()
            assert got == expect.tolist()

    def test_lsh_variant_reasonable(self, rd):
        from dynaalign_ray.functions.similarity_search import (
            brute_force_topk,
            lsh_bucket_topk,
        )

        rng = np.random.default_rng(1)
        vecs = rng.standard_normal((200, 16)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
        q = vecs[:3].astype(np.float64)
        exact = brute_force_topk(rd.from_arrow(tbl), q, k=5).to_pandas()
        approx = lsh_bucket_topk(rd.from_arrow(tbl), q, k=5, n_bits=6).to_pandas()
        # recall@5 of the approximate variant should be decent on 200 vecs
        rec = 0
        for qi in range(3):
            e = set(exact[exact.query_id == qi].vec_id)
            a = set(approx[approx.query_id == qi].vec_id)
            rec += len(e & a) / len(e)
        assert rec / 3 >= 0.5

    def test_ivf_variant_recall_and_assign(self, rd):
        from dynaalign_ray.functions.similarity_search import (
            brute_force_topk,
            ivf_assign,
            ivf_topk,
            train_centroids,
        )

        rng = np.random.default_rng(2)
        vecs = rng.standard_normal((300, 16)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
        ds = rd.from_arrow(tbl)
        q = vecs[:3].astype(np.float64)
        exact = brute_force_topk(ds, q, k=5).to_pandas()
        # generous nprobe on random gaussian data (no cluster structure)
        approx = ivf_topk(ds, q, k=5, n_centroids=16, nprobe=8, seed=7).to_pandas()
        rec = 0.0
        for qi in range(3):
            e = set(exact[exact.query_id == qi].vec_id)
            a = set(approx[approx.query_id == qi].vec_id)
            rec += len(e & a) / len(e)
        assert rec / 3 >= 0.5
        # nprobe = n_centroids degenerates to exact
        full = ivf_topk(ds, q, k=5, n_centroids=16, nprobe=16, seed=7).to_pandas()
        for qi in range(3):
            e = exact[exact.query_id == qi].sort_values("rank").vec_id.tolist()
            f = full[full.query_id == qi].sort_values("rank").vec_id.tolist()
            assert e == f
        # centroid training is deterministic; assignment covers every row
        c1 = train_centroids(ds, 16, seed=7)
        c2 = train_centroids(ds, 16, seed=7)
        np.testing.assert_array_equal(c1, c2)
        assigned = ivf_assign(ds, c1).to_pandas()
        assert len(assigned) == 300
        assert assigned.centroid_id.between(0, 15).all()


class TestMultimodal:
    def test_strict_decodes_ppm_wav_rejects_compressed(self, rd):
        from dynaalign_ray.functions.multimodal import (
            FEATURE_DIM,
            MediaFeatureActor,
            synth_media_table,
        )

        actor = MediaFeatureActor(decode="strict")
        # rows 0 (PPM) and 1 (WAV) decode for real now
        out = actor(synth_media_table(2))
        assert out.num_rows == 2
        assert all(len(f) == FEATURE_DIM for f in out.column("feature").to_pylist())
        # compressed media (row 2: video/mp4) still honestly raises
        with pytest.raises(NotImplementedError):
            actor(synth_media_table(3))

    def test_fake_decode_pipeline(self, rd):
        from dynaalign_ray.functions.multimodal import (
            FEATURE_DIM,
            MediaFeatureActor,
            synth_media_table,
        )

        media = synth_media_table(10)
        out = (
            rd.from_arrow(media)
            .map_batches(
                MediaFeatureActor,
                fn_constructor_kwargs={"decode": "fake"},
                batch_format="pyarrow",
                batch_size=4,
                concurrency=1,
            )
            .take_all()
        )
        assert len(out) == 10
        assert all(len(r["feature"]) == FEATURE_DIM for r in out)
        # deterministic across runs
        out2 = MediaFeatureActor(decode="fake")(media)
        f1 = np.asarray(out2.column("feature").combine_chunks().values)
        out3 = MediaFeatureActor(decode="fake")(media)
        assert (f1 == np.asarray(out3.column("feature").combine_chunks().values)).all()

    def test_resize_and_frame_plan(self):
        from dynaalign_ray.functions.multimodal import (
            PPM_TYPE,
            ImageResizeActor,
            decode_ppm,
            frame_sample_plan_batch,
            synth_media_table,
        )

        media = synth_media_table(7)
        resized = ImageResizeActor(width=224, height=224)(media)
        for i, t in enumerate(resized.column("media_type").to_pylist()):
            if t == PPM_TYPE:  # REAL raster resize, metadata matches payload
                assert resized.column("width")[i].as_py() == 224
                img = decode_ppm(resized.column("payload")[i].as_py())
                assert img.shape == (224, 224, 3)
            else:  # non-image rows pass through untouched
                assert (
                    resized.column("payload")[i].as_py()
                    == media.column("payload")[i].as_py()
                )
        plan = frame_sample_plan_batch(media, every_n=10)
        assert plan.num_rows >= 2


class TestSketchOps:
    def test_hll_accuracy_and_merge(self):
        import numpy as np

        from dynaalign_ray.functions.sketches import (
            hll_estimate,
            hll_from_hashes,
            hll_merge,
        )

        rng = np.random.default_rng(3)
        a = np.unique(rng.integers(0, 2**63, 80_000, dtype=np.uint64))
        b = np.unique(
            np.concatenate([a[:40_000], rng.integers(0, 2**63, 40_000, dtype=np.uint64)])
        )
        merged = hll_merge([hll_from_hashes(a), hll_from_hashes(b)])
        union = len(np.union1d(a, b))
        assert abs(hll_estimate(merged) - union) / union < 0.05

    def test_approx_distinct_over_dataset(self, rd):
        import duckdb

        from dynaalign_ray.functions.sketches import approx_distinct_strings

        sf = "/root/testdata/sf0.01"
        ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        est = approx_distinct_strings(ds, "text", flatten_tokens=True)
        exact = duckdb.sql(
            f"""SELECT count(DISTINCT t) FROM (
                 SELECT unnest(regexp_extract_all(text, '\\S+')) t
                 FROM '{sf}/documents.parquet')"""
        ).fetchone()[0]
        assert abs(est - exact) / exact < 0.05
