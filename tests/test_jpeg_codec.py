"""Pure-spec baseline JPEG codec (functions/jpeg.py).

Known-answer coverage uses an INDEPENDENT in-test encoder: naive
O(64^2)-per-block textbook DCT, an algorithmically generated zigzag walk
(diagonal bounce, not the module's table), and custom fixed-length Huffman
tables the module has never seen — so agreement means both sides implement
T.81, not that they share code.
"""

import numpy as np
import pytest

from dynaalign_ray.functions.jpeg import (
    JPEG_TYPE,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


# ------------------------------------------------ independent in-test encoder


def _zigzag_walk() -> list[int]:
    """Diagonal-bounce zigzag order, generated rather than tabulated."""
    order = []
    x = y = 0
    up = True
    for _ in range(64):
        order.append(8 * y + x)
        if up:
            if x == 7:
                y += 1
                up = False
            elif y == 0:
                x += 1
                up = False
            else:
                x += 1
                y -= 1
        else:
            if y == 7:
                x += 1
                up = True
            elif x == 0:
                y += 1
                up = True
            else:
                x -= 1
                y += 1
    return order


def _naive_dct(block: np.ndarray) -> np.ndarray:
    """Textbook T.81 A.3.3 FDCT double loop."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            cv = np.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def _naive_idct(coef: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = 0.25 * s
    return out


# custom flat-depth Huffman tables the module does not ship:
# 12 DC categories all at code length 4; 162 AC symbols all at length 8.
_TEST_DC_BITS = [0, 0, 0, 12] + [0] * 12
_TEST_DC_VALS = list(range(12))
_TEST_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0}
)
_TEST_AC_BITS = [0] * 7 + [len(_TEST_AC_VALS)] + [0] * 8


def _canonical(bits, values):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code, k = code + 1, k + 1
        code <<= 1
    return codes


class _TestBitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = int("".join(map(str, bits[i : i + 8])), 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _independent_encode_gray(img: np.ndarray, qval: int = 16) -> bytes:
    """Single-component (grayscale) baseline JPEG built from scratch."""
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    zz_order = _zigzag_walk()
    quant = np.full(64, qval, np.int64)

    dc_codes = _canonical(_TEST_DC_BITS, _TEST_DC_VALS)
    ac_codes = _canonical(_TEST_AC_BITS, _TEST_AC_VALS)
    writer = _TestBitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_naive_dct(block).reshape(64)[zz_order] / quant).astype(int)
            diff = int(coef[0]) - pred
            pred = int(coef[0])
            s = abs(diff).bit_length()
            writer.put(*dc_codes[s])
            if s:
                writer.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            nz = np.nonzero(coef[1:])[0]
            last = (nz[-1] + 1) if len(nz) else 0
            run = 0
            for k in range(1, 64):
                v = int(coef[k])
                if v == 0:
                    if k > last:
                        writer.put(*ac_codes[0x00])
                        break
                    run += 1
                    continue
                while run > 15:
                    writer.put(*ac_codes[0xF0])
                    run -= 16
                s = abs(v).bit_length()
                writer.put(*ac_codes[(run << 4) | s])
                writer.put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + quant.astype(np.uint8).tobytes())
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_TEST_DC_BITS) + bytes(_TEST_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_TEST_AC_BITS) + bytes(_TEST_AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += writer.tobytes()
    out += b"\xff\xd9"
    return out


def _independent_reference_gray(img: np.ndarray, qval: int = 16) -> np.ndarray:
    """What a spec-correct decoder must reconstruct for the stream above."""
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    rec = np.zeros((ph, pw))
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_naive_dct(block) / qval) * qval
            rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _naive_idct(coef) + 128.0
    return np.clip(rec[:h, :w].round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- roundtrip


class TestJpegRoundtrip:
    def test_uniform_image_exact(self):
        img = np.full((16, 24, 3), 120, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=90)), img)

    @pytest.mark.parametrize("quality,min_psnr", [(95, 35.0), (75, 30.0)])
    def test_psnr_444(self, quality, min_psnr):
        rng = np.random.default_rng(quality)
        # smooth image (JPEG's domain): low-frequency gradients + mild noise
        yy, xx = np.mgrid[0:40, 0:56]
        base = 128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)
        img = np.clip(
            np.stack([base, base * 0.8 + 20, 255 - base], axis=2)
            + rng.normal(0, 2, (40, 56, 3)),
            0,
            255,
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=quality))
        assert out.shape == img.shape
        assert _psnr(out, img) >= min_psnr

    def test_subsampled_420(self):
        yy, xx = np.mgrid[0:30, 0:42]
        base = 128 + 80 * np.sin((xx + yy) / 12.0)
        img = np.clip(np.stack([base] * 3, axis=2), 0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert out.shape == img.shape
        assert _psnr(out, img) >= 30.0

    def test_restart_markers_pixel_identical(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=80))
        restarted = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=2))
        assert np.array_equal(plain, restarted)

    def test_odd_dimensions(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
        for sub in (False, True):
            out = decode_jpeg(encode_jpeg(img, quality=92, subsample=sub))
            assert out.shape == img.shape

    def test_progressive_raises(self):
        img = np.full((8, 8, 3), 33, np.uint8)
        payload = bytearray(encode_jpeg(img))
        at = payload.index(b"\xff\xc0")
        payload[at + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="sequential"):
            decode_jpeg(bytes(payload))

    def test_not_jpeg_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")


# ------------------------------------------------------------- known answer


class TestJpegKnownAnswer:
    def test_independent_gray_stream(self):
        """Decode a stream from the independent encoder (naive DCT, generated
        zigzag, custom Huffman tables) and match its reference pixels."""
        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:13, 0:22]
        img = np.clip(
            100 + 70 * np.sin(xx / 5.0) + 40 * np.cos(yy / 4.0) + rng.normal(0, 4, (13, 22)),
            0,
            255,
        ).astype(np.uint8)
        payload = _independent_encode_gray(img, qval=16)
        got = decode_jpeg(payload)
        ref = _independent_reference_gray(img, qval=16)
        assert got.shape == (13, 22, 3)
        # both sides round IEEE doubles; allow the half-ulp boundary pixel
        assert np.abs(got[:, :, 0].astype(int) - ref.astype(int)).max() <= 1
        assert np.array_equal(got[:, :, 0], got[:, :, 1])
        assert np.array_equal(got[:, :, 0], got[:, :, 2])

    def test_single_dc_block_exact(self):
        """A uniform 8x8 block quantized with a flat table reconstructs its
        DC value exactly — hand-checkable arithmetic: DC = 8*(v-128)/q."""
        img = np.full((8, 8), 200, np.uint8)
        payload = _independent_encode_gray(img, qval=16)
        got = decode_jpeg(payload)
        # DC = round(8*(200-128)/16)=36 -> dequant 576 -> idct 576/8=72 -> +128
        assert np.array_equal(got[:, :, 0], np.full((8, 8), 200, np.uint8))


# ------------------------------------------------------------------ actor


class TestJpegPipeline:
    def test_jpeg_media_features(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.functions.multimodal import MediaFeatureActor

        rng = np.random.default_rng(13)
        payloads = [
            encode_jpeg(
                rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                quality=90,
                subsample=bool(i % 2),
            )
            for i in range(6)
        ]
        t = pa.table(
            {
                "media_id": pa.array(range(6), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([JPEG_TYPE] * 6, pa.string()),
            }
        )
        out = (
            rd.from_arrow(t)
            .map_batches(
                MediaFeatureActor,
                fn_constructor_kwargs={"decode": "strict"},
                batch_format="pyarrow",
                concurrency=1,
                batch_size=3,
            )
            .to_pandas()
        )
        assert len(out) == 6
        assert all(len(f) == 64 for f in out["feature"])
