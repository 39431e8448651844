"""Multimodal column plumbing (engine addition per the build brief).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, byte length).  The Ray-side
plumbing — schemas, actor-pool stages, batch sizing for large binary rows —
is real and tested; the actual codec work is stubbed because no image/audio
libraries exist in this environment:

- ``decode="strict"`` raises NotImplementedError at the decode step (the
  honest stub), while
- ``decode="fake"`` produces a deterministic hash-derived feature vector so
  downstream stages (similarity search, dedup on features) can be exercised
  end-to-end.

Batch-size guidance: with payloads of B bytes, pick
``batch_size <= target_worker_bytes / B`` — these stages default to small
batches (64) because a 1 MiB image x 1024-row batch would be 1 GiB per task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/jpeg", "audio/wav", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 64


class MediaFeatureActor:
    """payload binary -> fixed-size feature vector (actor pool stage).

    Real deployments load a codec + model in __init__ (once per actor);
    here __init__ only fixes the decode mode and the fake-feature seed.
    Use with::

        ds.map_batches(MediaFeatureActor, fn_constructor_kwargs={"decode": "fake"},
                       batch_format="pyarrow", batch_size=64, concurrency=4)
    """

    def __init__(self, decode: str = "strict", seed: int = 42):
        if decode not in ("strict", "fake"):
            raise ValueError(f"decode must be 'strict' or 'fake', got {decode!r}")
        self.decode = decode
        self.seed = seed

    def _decode_payload(self, payload: bytes) -> np.ndarray:
        if self.decode == "strict":
            raise NotImplementedError(
                "media decoding requires an image/audio codec library, which "
                "is not available in this environment; use decode='fake' for "
                "pipeline plumbing tests"
            )
        # deterministic fake: feature[i] = mix of payload bytes + i (unit norm)
        from dynaalign_ray.hashing import hash_u64

        h = np.frombuffer(
            np.pad(
                np.frombuffer(payload[: FEATURE_DIM * 8], dtype=np.uint8),
                (0, max(0, FEATURE_DIM * 8 - len(payload))),
            ).tobytes(),
            dtype=np.uint64,
        )[:FEATURE_DIM]
        if len(h) < FEATURE_DIM:
            h = np.pad(h, (0, FEATURE_DIM - len(h)))
        mixed = hash_u64(h, seed=self.seed).astype(np.float64)
        v = (mixed / 2**64) - 0.5
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode_payload(p) for p in payloads])
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), FEATURE_DIM
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "feature": arr,
            }
        )


def resize_stub_batch(batch: pa.Table, *, width: int, height: int) -> pa.Table:
    """Schema-true resize stage: passes payloads through while rewriting the
    size metadata (the real kernel would transform payload bytes)."""
    n = batch.num_rows
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "payload": batch.column("payload"),
            "width": pa.array([width] * n, type=pa.int32()),
            "height": pa.array([height] * n, type=pa.int32()),
            "n_bytes": batch.column("n_bytes"),
        }
    )


def frame_sample_plan_batch(batch: pa.Table, *, every_n: int = 30) -> pa.Table:
    """Video frame-sampling *plan*: one output row per (media, frame_index)
    without decoding — downstream decode stages consume the plan.  Frame
    count is estimated from payload size (stub: 1 frame per 4 KiB)."""
    ids = np.asarray(batch.column("media_id")).astype(np.int64)
    sizes = np.asarray(batch.column("n_bytes")).astype(np.int64)
    est_frames = np.maximum(sizes // 4096, 1)
    out_id, out_frame = [], []
    for i in range(len(ids)):
        frames = np.arange(0, est_frames[i], every_n, dtype=np.int64)
        out_id.append(np.full(len(frames), ids[i], dtype=np.int64))
        out_frame.append(frames)
    return pa.table(
        {
            "media_id": pa.array(np.concatenate(out_id) if out_id else [], type=pa.int64()),
            "frame_index": pa.array(
                np.concatenate(out_frame) if out_frame else [], type=pa.int64()
            ),
        }
    )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids = np.arange(n, dtype=np.int64)
    types = [["image/jpeg", "audio/wav", "video/mp4"][i % 3] for i in range(n)]
    payloads = [rng.bytes(int(rng.integers(256, 8192))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([640] * n, pa.int32()),
            "height": pa.array([480] * n, pa.int32()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )
