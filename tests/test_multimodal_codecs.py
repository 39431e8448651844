"""Real multimodal codecs (pure-spec formats, no codec libs needed):
PPM P6 encode/decode roundtrip, nearest-neighbor resize, dHash stability,
WAV PCM roundtrip, and audio feature sanity."""

import numpy as np
import pytest

from dynaalign_ray.functions.multimodal import (
    audio_features,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    image_dhash,
    image_dhash_batch,
    resize_nearest,
    synth_image,
    synth_media_table,
)


class TestPPM:
    def test_roundtrip_bit_exact(self):
        img = synth_image(5, width=31, height=17)  # odd sizes
        out = decode_ppm(encode_ppm(img))
        np.testing.assert_array_equal(out, img)

    def test_header_comments_and_whitespace(self):
        img = synth_image(1, width=4, height=3)
        payload = b"P6\n# a comment line\n4 3\n# another\n255\n" + img.tobytes()
        np.testing.assert_array_equal(decode_ppm(payload), img)

    def test_rejects_non_p6(self):
        with pytest.raises(ValueError):
            decode_ppm(b"P3\n1 1\n255\n000")

    def test_resize_known_pattern(self):
        # 2x2 checkerboard upsampled 2x: each source pixel becomes a 2x2 block
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[0, 0] = img[1, 1] = 255
        up = resize_nearest(img, 4, 4)
        assert up.shape == (4, 4, 3)
        np.testing.assert_array_equal(up[:2, :2], np.full((2, 2, 3), 255))
        np.testing.assert_array_equal(up[:2, 2:], np.zeros((2, 2, 3)))

    def test_dhash_stable_under_noise_distinct_across_images(self):
        base = synth_image(10, width=64, height=48)
        rng = np.random.default_rng(0)
        noisy = np.clip(
            base.astype(np.int16) + rng.integers(-3, 4, base.shape), 0, 255
        ).astype(np.uint8)
        other = synth_image(11, width=64, height=48)
        d_base, d_noisy, d_other = map(image_dhash, (base, noisy, other))
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(d_base, d_noisy) <= 6  # near-dup stays close
        assert ham(d_base, d_other) > 10  # different image far away

    def test_dhash_batch_filters_to_images(self):
        media = synth_media_table(9)
        out = image_dhash_batch(media)
        assert out.column("media_id").to_pylist() == [0, 3, 6]
        assert all(0 <= h < 2**63 for h in out.column("dhash").to_pylist())


class TestWAV:
    def test_roundtrip_bit_exact(self):
        rng = np.random.default_rng(1)
        samples = rng.integers(-32768, 32767, 1001, dtype=np.int16)
        out, rate = decode_wav(encode_wav(samples, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(out, samples)

    def test_odd_data_chunk_word_alignment(self):
        samples = np.array([1, -2, 3], dtype=np.int16)
        out, rate = decode_wav(encode_wav(samples, 8000))
        np.testing.assert_array_equal(out, samples)

    def test_features_detect_sine_frequency(self):
        rate = 8000
        t = np.arange(0, 4096) / rate
        wave = (np.sin(2 * np.pi * 440.0 * t) * 12000).astype(np.int16)
        f = audio_features(wave, rate)
        assert f["dominant_hz"] == pytest.approx(440.0, abs=rate / 4096 + 0.5)
        assert f["rms"] == pytest.approx(12000 / 32768 / np.sqrt(2), rel=0.01)
        assert f["duration_s"] == pytest.approx(4096 / rate)

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError):
            decode_wav(b"OggS" + b"\x00" * 40)


class TestImageNearDup:
    def test_planted_pairs_found(self, ray_session):
        from dynaalign_ray.pipelines.curation import media_image_neardup

        rows = media_image_neardup(
            "/root/testdata/sf0.001", num_partitions=4, max_hamming=10
        ).take_all()
        got = {(r["a"], r["b"]) for r in rows}
        assert len(got) == len(rows)  # cross-chunk dedup held
        # corpus size = max(n_docs // 2, 16); planted near-dups at i % 4 == 3
        import pyarrow.parquet as pq

        n = max(pq.read_metadata("/root/testdata/sf0.001/documents.parquet").num_rows // 2, 16)
        planted = {(i - 1, i) for i in range(3, n, 4)}
        missed = planted - got
        assert not missed, f"missed planted near-dups: {sorted(missed)[:5]}"
        assert all(r["hamming"] <= 10 for r in rows)


class TestAudioNearDup:
    def test_spectral_hash_separation(self):
        from dynaalign_ray.functions.multimodal import (
            audio_spectral_hash,
            decode_wav,
            synth_audio_corpus,
        )

        corpus = synth_audio_corpus(60)
        hs = [
            audio_spectral_hash(decode_wav(corpus.column("payload")[i].as_py())[0])
            for i in range(60)
        ]
        ham = lambda a, b: bin(a ^ b).count("1")
        for i in range(3, 60, 4):
            assert ham(hs[i - 1], hs[i]) <= 3  # planted noisy copy stays close

    def test_planted_pairs_found(self, ray_session):
        import pyarrow.parquet as pq

        from dynaalign_ray.pipelines.curation import media_audio_neardup

        rows = media_audio_neardup(
            "/root/testdata/sf0.001", num_partitions=4, max_hamming=3
        ).take_all()
        got = {(r["a"], r["b"]) for r in rows}
        n = max(pq.read_metadata("/root/testdata/sf0.001/documents.parquet").num_rows // 2, 16)
        planted = {(i - 1, i) for i in range(3, n, 4)}
        missed = planted - got
        assert not missed, f"missed planted audio near-dups: {sorted(missed)[:5]}"
        assert all(r["hamming"] <= 3 for r in rows)


class TestDecoderRegistry:
    """Optional codec hook (VERDICT r2 #10): a registered decoder lights up
    strict decode for a compressed type; unchanged raise when absent."""

    def test_strict_raises_without_decoder(self):
        from dynaalign_ray.functions.multimodal import MediaFeatureActor

        actor = MediaFeatureActor(decode="strict")
        # webp has no native codec: actionable NotImplementedError
        with pytest.raises(NotImplementedError, match="register_decoder"):
            actor._decode_payload(b"RIFFxxxxWEBP", "image/webp")
        # jpeg decodes natively now; a corrupt payload raises ValueError
        # (falls through to the registry, which is empty here)
        with pytest.raises(ValueError, match="JPEG"):
            actor._decode_payload(b"\xff\xd8jpegbytes", "image/jpeg")

    def test_registered_image_decoder_activates_strict_path(self):
        from dynaalign_ray.functions.multimodal import (
            MediaFeatureActor,
            encode_ppm,
            register_decoder,
            registered_decoders,
            unregister_decoder,
        )

        img = synth_image(7)

        def fake_jpeg_decoder(payload: bytes):
            # stands in for a real codec: ignores the payload bytes and
            # returns a known RGB array
            return ("image", img)

        register_decoder("image/jpeg", fake_jpeg_decoder)
        try:
            assert "image/jpeg" in registered_decoders()
            actor = MediaFeatureActor(decode="strict")
            via_registry = actor._decode_payload(b"\xff\xd8fake", "image/jpeg")
            native = actor._decode_payload(encode_ppm(img), "image/x-portable-pixmap")
            assert np.allclose(via_registry, native)
        finally:
            unregister_decoder("image/jpeg")
        # post-unregister: native jpeg decode rejects the junk payload and
        # there is no registry fallback left
        with pytest.raises(ValueError):
            MediaFeatureActor(decode="strict")._decode_payload(b"x", "image/jpeg")

    def test_registered_audio_decoder(self):
        from dynaalign_ray.functions.multimodal import (
            MediaFeatureActor,
            encode_wav,
            register_decoder,
            unregister_decoder,
        )

        t = np.arange(2048) / 8000.0
        samples = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)

        def fake_mp3_decoder(payload: bytes):
            return ("audio", (samples, 8000))

        register_decoder("audio/mpeg", fake_mp3_decoder)
        try:
            actor = MediaFeatureActor(decode="strict")
            via_registry = actor._decode_payload(b"ID3fake", "audio/mpeg")
            native = actor._decode_payload(encode_wav(samples, 8000), "audio/wav")
            assert np.allclose(via_registry, native)
        finally:
            unregister_decoder("audio/mpeg")

    def test_bad_decoder_kind_rejected(self):
        from dynaalign_ray.functions.multimodal import (
            MediaFeatureActor,
            register_decoder,
            unregister_decoder,
        )

        register_decoder("video/mp4", lambda p: ("frames", None))
        try:
            with pytest.raises(ValueError, match="expected 'image' or 'audio'"):
                MediaFeatureActor(decode="strict")._decode_payload(b"x", "video/mp4")
        finally:
            unregister_decoder("video/mp4")
