"""Signature stage — the stateful actor-pool analog of the reference's
``HashFamily`` + per-doc signature loop (/root/reference/src/minHash.cpp:67-158).

The reference creates its hash family per call from ``std::random_device``;
here the permutation parameter matrix is built ONCE per actor in
``__init__`` from the config seed and reused for every batch — the
canonical "stateful stage = actor pool" pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.hashing import make_permutations
from dynaalign_ray.shingles import (
    batch_shingle_hashes,
    bottomk_sketches,
    minhash_signatures,
    simhash_signatures,
)

SIGNATURE_SCHEMA_COLS = ("doc_id", "minhash", "simhash", "n_shingles", "sketch")


class MinHashActor:
    """``docs(doc_id, text, ...) -> signatures(doc_id, minhash, simhash,
    n_shingles, sketch)`` over zero-copy Arrow batches.

    Use as ``ds.map_batches(MinHashActor, fn_constructor_args=(cfg,),
    batch_format="pyarrow", batch_size=cfg.batch_size, concurrency=N)``.
    """

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.a, self.b = make_permutations(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch.column("text").to_pylist()
        shingles, counts = batch_shingle_hashes(texts, cfg.shingle_k, cfg.shingle_mode)
        sig = minhash_signatures(shingles, counts, self.a, self.b)
        sim = simhash_signatures(shingles, counts)
        sk_vals, sk_sizes, distinct = bottomk_sketches(shingles, counts, cfg.sketch_cap)

        n = len(texts)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.reshape(-1), type=pa.uint64()), cfg.num_perm
        )
        # sketch as a binary blob of little-endian uint64s: Arrow binary
        # passes through Acero hash joins (list payloads do not) and decodes
        # zero-copy with np.frombuffer in the verify kernel.
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(sk_sizes * 8, out=offsets[1:], dtype=np.int32)
        sketch_arr = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(sk_vals.astype("<u8").tobytes())],
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "minhash": sig_arr,
                "simhash": pa.array(sim, type=pa.uint64()),
                "n_shingles": pa.array(distinct, type=pa.int64()),
                "sketch": sketch_arr,
            }
        )


def signatures_dataset(docs_ds, cfg: DedupConfig, concurrency=None):
    """Attach the signature stage to a docs Dataset."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    elif cfg.minhash_concurrency is not None:
        kwargs["concurrency"] = cfg.minhash_concurrency
    else:
        # autoscaling actor pool sized to the cluster so the signature stage
        # doesn't bottleneck behind a fixed small pool; setup (permutation
        # arrays) is cheap here but the actor-pool shape is what matters
        # when num_perm is large or a model/tokenizer must be loaded.
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        kwargs["concurrency"] = (1, max(4, cpus // 2))
    return docs_ds.map_batches(
        MinHashActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
        **kwargs,
    )
