"""Sun AU / G.711 mu-law codec (functions/multimodal.py)."""

import numpy as np
import pytest

from dynaalign_ray.functions.multimodal import (
    AU_TYPE,
    _MULAW_TABLE,
    decode_au,
    encode_au,
)


def _mulaw_ref_decode(byte: int) -> int:
    """Textbook G.711 mu-law expansion, scalar form."""
    u = ~byte & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return -sample if sign else sample


class TestMulaw:
    def test_table_matches_scalar_reference(self):
        for b in range(256):
            assert int(_MULAW_TABLE[b]) == _mulaw_ref_decode(b), b

    def test_roundtrip_within_companding_error(self):
        """mu-law is lossy by design; the quantization error bound is
        half the step of the containing segment (~3% of magnitude)."""
        rng = np.random.default_rng(6)
        x = rng.integers(-30000, 30000, 5000).astype(np.int16)
        y, rate = decode_au(encode_au(x, 8000))
        assert rate == 8000 and len(y) == len(x)
        err = np.abs(y.astype(np.int64) - x.astype(np.int64))
        bound = np.maximum(np.abs(x.astype(np.int64)) // 16, 64)
        assert (err <= bound).all()

    def test_silence_and_extremes(self):
        x = np.array([0, 1, -1, 32767, -32768], np.int16)
        y, _ = decode_au(encode_au(x, 8000))
        assert abs(int(y[0])) <= 8  # zero encodes near-zero
        assert y[3] > 25000 and y[4] < -25000

    def test_multichannel_takes_channel0(self):
        # hand-build a stereo AU: interleave two distinct mono signals
        a = np.full(50, 8000, np.int16)
        b = np.full(50, -8000, np.int16)
        inter = np.empty(100, np.int16)
        inter[0::2], inter[1::2] = a, b
        payload = bytearray(encode_au(inter, 8000))
        payload[20:24] = (2).to_bytes(4, "big")  # channels = 2
        y, _ = decode_au(bytes(payload))
        assert len(y) == 50 and (y > 0).all()

    def test_bad_encoding_raises(self):
        payload = bytearray(encode_au(np.zeros(4, np.int16), 8000))
        payload[12:16] = (3).to_bytes(4, "big")  # 16-bit PCM encoding id
        with pytest.raises(ValueError, match="mu-law"):
            decode_au(bytes(payload))


class TestAuPipeline:
    def test_au_media_features(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.functions.multimodal import MediaFeatureActor

        rng = np.random.default_rng(15)
        payloads = [
            encode_au(
                (8000 * np.sin(np.arange(2048) * (0.01 + 0.002 * k))).astype(
                    np.int16
                ),
                8000,
            )
            for k in range(5)
        ]
        t = pa.table(
            {
                "media_id": pa.array(range(5), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([AU_TYPE] * 5, pa.string()),
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
        assert len(out) == 5
