"""Pair verification — exact Jaccard on retained shingle sketches.

The reference estimates similarity as the fraction of matching signature
slots (/root/reference/src/minHash.cpp:160-178); we keep that estimator
available (``signature_estimate``) for parity, but the keep/drop decision
uses exact Jaccard on the docs' retained (bottom-k) shingle sets — the
verify step the north star requires.  Sketches reach the pair rows through
two hash joins on doc_id (no all-pairs materialization anywhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dynaalign_ray.config import DedupConfig
from dynaalign_ray.shingles import jaccard_from_sketches


def _sketch_arrays(col) -> tuple[np.ndarray, np.ndarray]:
    """binary sketch column (LE-uint64 blobs) -> (flat values, element
    offsets) numpy views, zero-copy off the Arrow buffers."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buffers = arr.buffers()
    byte_offsets = np.frombuffer(buffers[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    values = np.frombuffer(buffers[2], dtype="<u8")
    return values, byte_offsets // 8


def verify_pairs_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """(a, b, sketch_a, sketch_b) -> verified (a, b, jaccard) rows with
    jaccard >= tau."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    # drop cross-band duplicate pairs: the upstream join partitions on `b`,
    # so every copy of (a, b) lands in this block (saves the dedicated
    # pair-dedup shuffle)
    aa = np.asarray(batch.column("a")).astype(np.int64)
    bb = np.asarray(batch.column("b")).astype(np.int64)
    order = np.lexsort((bb, aa))
    uniq = np.ones(n, dtype=bool)
    uniq[1:] = (aa[order][1:] != aa[order][:-1]) | (bb[order][1:] != bb[order][:-1])
    if not uniq.all():
        batch = batch.take(pa.array(order[uniq]))
        n = batch.num_rows
    va, oa = _sketch_arrays(batch.column("sketch_a"))
    vb, ob = _sketch_arrays(batch.column("sketch_b"))
    cap = cfg.sketch_cap
    jac = np.empty(n, dtype=np.float64)
    for i in range(n):
        jac[i] = jaccard_from_sketches(
            va[oa[i] : oa[i + 1]], vb[ob[i] : ob[i + 1]], cap
        )
    keep = jac >= cfg.tau
    return pa.table(
        {
            "a": pa.array(np.asarray(batch.column("a"))[keep], type=pa.int64()),
            "b": pa.array(np.asarray(batch.column("b"))[keep], type=pa.int64()),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        }
    )


def verified_edges(pairs_ds, sigs_ds, cfg: DedupConfig, num_partitions: int):
    """candidate_pairs ⋈ signatures (×2, on doc_id) -> verify kernel.

    Two hash joins ship only (doc_id, sketch) — the narrow projection of the
    signature table — to the pair rows; column pruning before a shuffle is
    deliberate (SURVEY.md §7 hard part 4).
    """
    import functools

    from dynaalign_ray.joins import hash_join

    def _sk(name):
        def project(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": batch.column("doc_id"), name: batch.column("sketch")}
            )

        return sigs_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    ska_schema = pa.schema([("doc_id", pa.int64()), ("sketch_a", pa.binary())])
    skb_schema = pa.schema([("doc_id", pa.int64()), ("sketch_b", pa.binary())])
    j1 = hash_join(
        pairs_ds,
        _sk("sketch_a"),
        left_on="a",
        right_on="doc_id",
        left_schema=pairs_schema,
        right_schema=ska_schema,
        num_partitions=num_partitions,
    )
    j1_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("sketch_a", pa.binary())])
    j2 = hash_join(
        j1,
        _sk("sketch_b"),
        left_on="b",
        right_on="doc_id",
        left_schema=j1_schema,
        right_schema=skb_schema,
        num_partitions=num_partitions,
    )
    return j2.map_batches(
        functools.partial(verify_pairs_batch, cfg=cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
