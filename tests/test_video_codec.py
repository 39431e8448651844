"""Y4M video codec + temporal-SimHash near-dup
(functions/multimodal.py: decode_y4m/encode_y4m/video_hash_signature_batch)."""

import numpy as np
import pytest

from dynaalign_ray.functions.multimodal import (
    decode_y4m,
    encode_y4m,
    synth_video_corpus,
    video_frame_hashes,
    video_hash_signature_batch,
)


class TestY4mCodec:
    def test_roundtrip_444_within_matrix_quantization(self):
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (5, 24, 32, 3), dtype=np.uint8)
        rt, fps = decode_y4m(encode_y4m(frames, fps=25, fmt="444"))
        assert rt.shape == frames.shape and fps == 25.0
        # BT.601 matrix + uint8 quantization: bounded roundtrip error
        assert int(np.max(np.abs(rt.astype(int) - frames.astype(int)))) <= 3

    def test_420_subsampling_smooth_content(self):
        # smooth gradient: 2x2 chroma averaging loses little
        y, x = np.mgrid[0:24, 0:32]
        img = np.stack([(x * 8) % 256, (y * 10) % 256, ((x + y) * 4) % 256], -1)
        frames = np.stack([img, np.roll(img, 3, 1)]).astype(np.uint8)
        rt, _ = decode_y4m(encode_y4m(frames, fmt="420"))
        assert rt.shape == frames.shape
        assert np.mean(np.abs(rt.astype(int) - frames.astype(int))) < 6

    def test_bad_payloads_raise(self):
        with pytest.raises(ValueError, match="YUV4MPEG2"):
            decode_y4m(b"RIFFxxxx")
        ok = encode_y4m(np.zeros((1, 4, 4, 3), np.uint8))
        with pytest.raises(ValueError, match="FRAME"):
            decode_y4m(ok.replace(b"FRAME", b"FRoME"))

    def test_frame_sampling(self):
        frames = np.zeros((12, 8, 8, 3), np.uint8)
        hashes, n, fps = video_frame_hashes(encode_y4m(frames), every_n=5)
        assert n == 12 and len(hashes) == 3 and fps == 30.0


class TestTemporalSimhash:
    def test_noisy_copy_within_one_bit(self):
        t = synth_video_corpus(64)
        sig = video_hash_signature_batch(t)
        s = np.asarray(sig.column("simhash")).astype(np.uint64)
        ids = np.asarray(sig.column("doc_id"))
        by = dict(zip(ids.tolist(), s.tolist()))
        for i in range(64):
            if i % 4 == 3:
                d = bin(int(by[i - 1]) ^ int(by[i])).count("1")
                assert d <= 1, (i, d)

    def test_pipeline_recall_on_planted(self, ray_session):
        from dynaalign_ray.pipelines.curation import media_video_neardup

        df = media_video_neardup("/root/testdata/sf0.001").to_pandas()
        n = max(500 // 4, 16)
        planted = {(i - 1, i) for i in range(n) if i % 4 == 3}
        got = set(zip(df["a"], df["b"]))
        assert planted <= got  # recall 1.0
        # every reported pair is a true Hamming-<=3 signature match (the
        # extras are the synth pattern family's genuine repeats)
        t = synth_video_corpus(n)
        sig = video_hash_signature_batch(t)
        by = dict(
            zip(
                np.asarray(sig.column("doc_id")).tolist(),
                np.asarray(sig.column("simhash")).astype(np.uint64).tolist(),
            )
        )
        for a, b in got:
            assert bin(int(by[a]) ^ int(by[b])).count("1") <= 3, (a, b)


class TestCrossModal:
    def test_planted_frame_images_found(self, ray_session):
        from dynaalign_ray.pipelines.curation import media_image_in_video

        df = media_image_in_video("/root/testdata/sf0.001").to_pandas()
        n = max(500 // 4, 16)
        planted = {(k, k) for k in range(n) if k % 5 == 0 and k % 4 != 3}
        got = set(zip(df["video_id"], df["image_id"]))
        assert planted <= got  # recall 1.0 on planted frame-images
        assert (df["hamming"] <= 3).all()
        # note: reported hamming for a planted pair may exceed 0 — the
        # per-(bucket, doc) dedup keeps ONE frame representative per
        # bucket, which need not be the exactly-matching frame; the match
        # itself is still found through the exact frame's buckets
