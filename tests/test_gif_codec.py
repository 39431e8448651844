"""Pure-spec GIF codec (functions/multimodal.py: decode_gif/encode_gif)."""

import numpy as np
import pytest

from dynaalign_ray.functions.multimodal import (
    GIF_TYPE,
    decode_gif,
    encode_gif,
)


def _rand_img(rng, n_colors, h, w):
    pal = np.unique(rng.integers(0, 256, (n_colors, 3), dtype=np.uint8), axis=0)
    return pal[rng.integers(0, len(pal), (h, w))]


def _real_lzw_gif(indices: np.ndarray, w: int, h: int, pal: np.ndarray) -> bytes:
    """A REAL dictionary-building LZW compressor (unlike encode_gif's
    literal form) — exercises the decoder's dict growth, variable code
    widths and the KwKwK case."""
    min_code = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    out_codes = [clear]
    s = b""
    for px in indices.reshape(-1):
        c = bytes([int(px)])
        if s + c in table:
            s += c
            continue
        out_codes.append((table[s], width))
        table[s + c] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        s = c
    out_codes.append((table[s], width))
    out_codes.append((eoi, width))
    # normalize first CLEAR to tuple form
    out_codes[0] = (clear, min_code + 1)
    bits = []
    for code, wd in out_codes:
        bits.extend((code >> b) & 1 for b in range(wd))
    arr = np.array(bits, np.uint8)
    data = np.packbits(arr, bitorder="little").tobytes()
    gct_bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    gct_n = 1 << gct_bits
    p = np.zeros((gct_n, 3), np.uint8)
    p[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((gct_bits - 1) & 0x07), 0, 0]) + p.tobytes()
    # a graphic-control extension the decoder must skip
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0, min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


class TestGifRoundtrip:
    @pytest.mark.parametrize("n_colors,h,w", [(2, 5, 7), (5, 23, 17), (200, 64, 48)])
    def test_encode_decode_identity(self, n_colors, h, w):
        rng = np.random.default_rng(n_colors)
        img = _rand_img(rng, n_colors, h, w)
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_monochrome(self):
        img = np.full((4, 6, 3), 9, np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="256"):
            encode_gif(img)


class TestRealLzwStreams:
    def test_decodes_dictionary_compressed_stream(self):
        """Repetitive image: the real compressor builds multi-byte dict
        entries and grows code width — decode must match."""
        rng = np.random.default_rng(3)
        pal = np.unique(rng.integers(0, 256, (4, 3), dtype=np.uint8), axis=0)
        idx = np.tile(np.array([0, 1, 0, 1, 2, 0, 1, 0, 1, 2], np.uint8), 60)[
            : 20 * 25
        ].reshape(20, 25)
        payload = _real_lzw_gif(idx, 25, 20, pal)
        assert np.array_equal(decode_gif(payload), pal[idx])

    def test_kwkwk_case(self):
        """'ababab...' over a 2-symbol alphabet hits the code==len(table)
        branch (KwKwK) almost immediately."""
        pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        idx = np.tile(np.array([0, 0, 0, 0], np.uint8), 64).reshape(16, 16)
        payload = _real_lzw_gif(idx, 16, 16, pal)
        assert np.array_equal(decode_gif(payload), pal[idx])

    def test_interlaced(self):
        """Interlace flag: rows stored in 4-pass order must come back in
        display order."""
        rng = np.random.default_rng(5)
        pal = np.unique(rng.integers(0, 256, (8, 3), dtype=np.uint8), axis=0)
        h, w = 13, 9
        idx = rng.integers(0, len(pal), (h, w)).astype(np.uint8)
        order = np.concatenate(
            [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        stored = idx[order]  # what an interlaced file physically stores
        payload = bytearray(_real_lzw_gif(stored, w, h, pal))
        # flip the interlace bit in the image descriptor (after GCE skip)
        desc = payload.index(b"\x2c")
        payload[desc + 9] |= 0x40
        assert np.array_equal(decode_gif(bytes(payload)), pal[idx])


class TestPipelineIntegration:
    def test_gif_media_features(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.functions.multimodal import MediaFeatureActor

        rng = np.random.default_rng(11)
        payloads = [encode_gif(_rand_img(rng, 6, 16, 16)) for _ in range(8)]
        t = pa.table(
            {
                "media_id": pa.array(range(8), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([GIF_TYPE] * 8, pa.string()),
            }
        )
        out = (
            rd.from_arrow(t)
            .map_batches(
                MediaFeatureActor,
                batch_format="pyarrow",
                concurrency=1,
                batch_size=4,
            )
            .to_pandas()
        )
        assert len(out) == 8
