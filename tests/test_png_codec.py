"""Pure-spec PNG codec (functions/multimodal.py: decode_png/encode_png)."""

import zlib

import numpy as np
import pytest

from dynaalign_ray.functions.multimodal import (
    PNG_TYPE,
    decode_png,
    encode_png,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + typ
        + body
        + zlib.crc32(typ + body).to_bytes(4, "big")
    )


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent in-test PNG encoder applying a CHOSEN filter per row —
    the spec's forward filter transforms, so decode must invert all five."""
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h, w * ch).astype(np.int64)
    out_rows = []
    prev = np.zeros(w * ch, np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        enc = np.empty(w * ch, np.int64)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            enc[x] = (line[x] - pred) & 0xFF
        out_rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = line
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    sig = b"\x89PNG\r\n\x1a\n"
    return (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
        + _chunk(b"IEND", b"")
    )


class TestPngRoundtrip:
    def test_encode_decode_identity(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (19, 31, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    @pytest.mark.parametrize(
        "filters",
        [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]],
    )
    def test_all_five_filters_invert(self, filters):
        rng = np.random.default_rng(sum(filters) + 1)
        img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
        payload = _png_with_filters(img, filters)
        assert np.array_equal(decode_png(payload), img), filters

    def test_grayscale_and_rgba(self):
        rng = np.random.default_rng(9)
        gray = rng.integers(0, 256, (6, 8, 1), dtype=np.uint8)
        got = decode_png(_png_with_filters(gray, [4]))
        assert np.array_equal(got, np.repeat(gray, 3, axis=2))
        rgba = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
        got = decode_png(_png_with_filters(rgba, [3]))
        assert np.array_equal(got, rgba[:, :, :3])

    def test_palette_png(self):
        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        idx = rng.integers(0, 7, (9, 5, 1)).astype(np.uint8)
        payload = bytearray(_png_with_filters(idx, [2]))
        # rewrite color type to 3 and splice a PLTE chunk before IDAT
        ihdr_at = payload.index(b"IHDR")
        payload[ihdr_at + 4 + 9] = 3
        # recompute IHDR crc
        body = bytes(payload[ihdr_at + 4 : ihdr_at + 4 + 13])
        payload[ihdr_at + 17 : ihdr_at + 21] = zlib.crc32(b"IHDR" + body).to_bytes(4, "big")
        idat_at = payload.index(b"IDAT") - 4
        plte = _chunk(b"PLTE", pal.tobytes())
        payload = bytes(payload[:idat_at]) + plte + bytes(payload[idat_at:])
        assert np.array_equal(decode_png(payload), pal[idx[:, :, 0]])

    def test_interlaced_raises(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        payload = bytearray(encode_png(img))
        ihdr_at = payload.index(b"IHDR")
        payload[ihdr_at + 4 + 12] = 1  # interlace flag
        body = bytes(payload[ihdr_at + 4 : ihdr_at + 4 + 13])
        payload[ihdr_at + 17 : ihdr_at + 21] = zlib.crc32(b"IHDR" + body).to_bytes(4, "big")
        with pytest.raises(ValueError, match="Adam7"):
            decode_png(bytes(payload))


class TestPngPipeline:
    def test_png_media_features(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.functions.multimodal import MediaFeatureActor

        rng = np.random.default_rng(13)
        payloads = [
            encode_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
            for _ in range(6)
        ]
        t = pa.table(
            {
                "media_id": pa.array(range(6), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([PNG_TYPE] * 6, pa.string()),
            }
        )
        out = (
            rd.from_arrow(t)
            .map_batches(
                MediaFeatureActor,
                batch_format="pyarrow",
                concurrency=1,
                batch_size=3,
            )
            .to_pandas()
        )
        assert len(out) == 6
