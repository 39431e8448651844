"""SimHash fallback dedup path (north-star secondary stage, SURVEY.md §7 M7).

Same shuffle skeleton as the MinHash LSH stage (explode -> hash-partition on
bucket key -> pair emission -> verify), but keyed on 16-bit chunks of the
64-bit SimHash fingerprint: splitting into ``c`` chunks guarantees every pair
within Hamming distance ``c - 1`` shares at least one chunk (pigeonhole), so
the default 4 chunks catches all pairs with <= 3 differing bits.
Verification is exact Hamming distance on the fingerprints themselves —
no sketch join needed (the fingerprint rides along with the bucket rows).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.hashing import U64, mix64, to_id63


def explode_simhash_chunks(batch: pa.Table, *, num_chunks: int = 4) -> pa.Table:
    """signatures -> (bucket_key, doc_id, simhash) rows, one per chunk."""
    mask = np.asarray(batch.column("n_shingles")) > 0
    doc_id = np.asarray(batch.column("doc_id")).astype(np.int64)[mask]
    sim = np.asarray(batch.column("simhash")).astype(U64)[mask]
    n = len(doc_id)
    bits = 64 // num_chunks
    keys = np.empty((n, num_chunks), dtype=np.int64)
    for c in range(num_chunks):
        chunk = (sim >> U64(c * bits)) & U64((1 << bits) - 1)
        salt = U64(((c + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        keys[:, c] = to_id63(mix64(chunk ^ salt))
    return pa.table(
        {
            "bucket_key": pa.array(keys.reshape(-1), type=pa.int64()),
            "doc_id": pa.array(np.repeat(doc_id, num_chunks), type=pa.int64()),
            "simhash": pa.array(np.repeat(sim, num_chunks), type=pa.uint64()),
        }
    )


def emit_simhash_pairs_block(batch: pa.Table, *, pair_cap: int, max_hamming: int) -> pa.Table:
    """Per-partition: within each bucket, emit pairs (all-pairs under
    pair_cap, star beyond) and verify Hamming inline."""
    keys = np.asarray(batch.column("bucket_key")).astype(np.int64)
    docs = np.asarray(batch.column("doc_id")).astype(np.int64)
    sims = np.asarray(batch.column("simhash")).astype(U64)
    empty = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "hamming": pa.array([], type=pa.int64()),
        }
    )
    if len(keys) == 0:
        return empty
    # Sort sims too: with multi-row-per-doc inputs (e.g. per-frame video
    # rows) the per-(bucket, doc) dedup must keep a DETERMINISTIC
    # representative — the minimum simhash — not whichever row arrived
    # first in block order, or the pair set passing max_hamming would vary
    # run to run.
    order = np.lexsort((sims, docs, keys))
    keys, docs, sims = keys[order], docs[order], sims[order]
    first = np.ones(len(keys), dtype=bool)
    first[1:] = (keys[1:] != keys[:-1]) | (docs[1:] != docs[:-1])
    keys, docs, sims = keys[first], docs[first], sims[first]
    boundary = np.ones(len(keys), dtype=bool)
    boundary[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], len(keys))
    m_of = ends - starts
    out_a, out_b, out_h = [], [], []
    # small buckets: one segment-vectorized triu + Hamming filter for the
    # whole block (the shared bands.segment_triu_rows kernel)
    from dynaalign_ray.stages.bands import segment_triu_rows

    a_rows, b_rows = segment_triu_rows(
        starts, ends, (m_of >= 2) & (m_of <= pair_cap)
    )
    if len(a_rows):
        ham = _popcount64(sims[a_rows] ^ sims[b_rows])
        keep = ham <= max_hamming
        out_a.append(docs[a_rows][keep])
        out_b.append(docs[b_rows][keep])
        out_h.append(ham[keep].astype(np.int64))
    # oversized buckets (rare): star edges around the first member
    for bi_ in np.flatnonzero(m_of > pair_cap):
        s, e = starts[bi_], ends[bi_]
        m = e - s
        d, v = docs[s:e], sims[s:e]
        ai = np.zeros(m - 1, dtype=np.int64)
        bi = np.arange(1, m, dtype=np.int64)
        ham = _popcount64(v[ai] ^ v[bi])
        keep = ham <= max_hamming
        out_a.append(d[ai][keep])
        out_b.append(d[bi][keep])
        out_h.append(ham[keep].astype(np.int64))
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=U64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_edges(
    sigs_ds,
    cfg: DedupConfig,
    num_partitions: int,
    *,
    num_chunks: int = 4,
    max_hamming: int = 3,
):
    """signatures -> verified SimHash edges (a, b, hamming), deduplicated."""
    exploded = sigs_ds.map_batches(
        functools.partial(explode_simhash_chunks, num_chunks=num_chunks),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = exploded.repartition(num_blocks=num_partitions, keys=["bucket_key"]).map_batches(
        functools.partial(
            emit_simhash_pairs_block, pair_cap=cfg.pair_cap, max_hamming=max_hamming
        ),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def dedup_block(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a")).astype(np.int64)
        b = np.asarray(batch.column("b")).astype(np.int64)
        h = np.asarray(batch.column("hamming")).astype(np.int64)
        if len(a) == 0:
            return batch
        order = np.lexsort((b, a))
        a, b, h = a[order], b[order], h[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "hamming": pa.array(h[keep], type=pa.int64()),
            }
        )

    return pairs.repartition(num_blocks=num_partitions, keys=["a", "b"]).map_batches(
        dedup_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
