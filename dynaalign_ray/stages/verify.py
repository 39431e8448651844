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
    # per-pair sorted-set intersection: at realistic sketch sizes (~300
    # values) np.intersect1d per pair beats a batch-wide lexsort 5x, and the
    # stage's wall time is dominated by the joins, not this kernel
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


_SEMI_JOIN_LIMIT = 20_000_000  # pair rows under which the pair-doc set fits the driver
_BROADCAST_DOC_LIMIT = 400_000  # pair-member docs under which the filtered
# sketch table is broadcast (plasma is shared memory: ONE zero-copy replica
# per node) and verify needs NO shuffle at all


def verified_edges(
    pairs_ds,
    sigs_ds,
    cfg: DedupConfig,
    num_partitions: int,
    approx_pairs: int | None = None,
    pairs_deduped: bool = True,
):
    """candidate_pairs ⋈ signatures (×2, on doc_id) -> verify kernel.

    Three physical plans, picked by candidate-set size:
    1. pair-member docs <= _BROADCAST_DOC_LIMIT: the semi-join-filtered
       (doc_id, sketch) table is broadcast and every pairs block verifies
       with two in-block Arrow joins — zero shuffles.  Requires globally
       deduplicated pairs (``pairs_deduped=True``): this plan applies no
       shuffle, so cross-block duplicate (a, b) copies would survive as
       duplicate edges;
    2. pairs <= _SEMI_JOIN_LIMIT: two hash joins, sketch side semi-join
       reduced to pair-member docs (the second join partitions on ``b``,
       colocating any duplicates for the in-kernel drop);
    3. otherwise (the 100 TB path): two full hash joins of the narrow
       (doc_id, sketch) projection (SURVEY.md §7 hard part 4).
    """
    import functools

    from dynaalign_ray.joins import hash_join

    pair_doc_ref = None
    pair_docs = None
    if approx_pairs is not None and approx_pairs <= _SEMI_JOIN_LIMIT:
        import ray

        # per-block distinct BEFORE the driver merge: the driver sees one
        # small sorted id array per block, not every pair row (the dup-heavy
        # blocks collapse remotely; keeps this serial phase tiny — Amdahl)
        def block_ids(batch: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate(
                    [
                        np.asarray(batch.column("a")).astype(np.int64),
                        np.asarray(batch.column("b")).astype(np.int64),
                    ]
                )
            )
            return pa.table({"doc_id": pa.array(u, type=pa.int64())})

        refs = pairs_ds.select_columns(["a", "b"]).map_batches(
            block_ids, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
        parts = [
            np.asarray(t.column("doc_id")).astype(np.int64)
            for t in (ray.get(r) for r in refs)
            if t.num_rows
        ]
        pair_docs = (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
        )
        pair_doc_ref = ray.put(pair_docs)

    if (
        pairs_deduped
        and pair_docs is not None
        and len(pair_docs) <= _BROADCAST_DOC_LIMIT
    ):
        return _broadcast_verify(pairs_ds, sigs_ds, cfg, pair_doc_ref, pair_docs)

    def _sk(name):
        def project(batch: pa.Table) -> pa.Table:
            tbl = pa.table(
                {"doc_id": batch.column("doc_id"), name: batch.column("sketch")}
            )
            if pair_doc_ref is not None:
                import ray

                wanted = ray.get(pair_doc_ref)
                if len(wanted) == 0:
                    return tbl.slice(0, 0)
                ids_np = np.asarray(tbl.column("doc_id")).astype(np.int64)
                pos = np.minimum(np.searchsorted(wanted, ids_np), len(wanted) - 1)
                tbl = tbl.filter(pa.array(wanted[pos] == ids_np))
            return tbl

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


def _broadcast_verify(pairs_ds, sigs_ds, cfg: DedupConfig, pair_doc_ref, pair_docs):
    """Zero-shuffle verify: collect the semi-join-filtered (doc_id, sketch)
    table (pair-member docs only), ray.put it once, and verify each pairs
    block with two in-block pyarrow joins against the broadcast table."""
    import functools

    import ray

    def project_filtered(batch: pa.Table) -> pa.Table:
        wanted = ray.get(pair_doc_ref)
        tbl = pa.table(
            {"doc_id": batch.column("doc_id"), "sketch": batch.column("sketch")}
        )
        if len(wanted) == 0:
            return tbl.slice(0, 0)
        ids_np = np.asarray(tbl.column("doc_id")).astype(np.int64)
        pos = np.minimum(np.searchsorted(wanted, ids_np), len(wanted) - 1)
        return tbl.filter(pa.array(wanted[pos] == ids_np))

    refs = sigs_ds.map_batches(
        project_filtered, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    parts = [t for t in (ray.get(r) for r in refs) if t.num_rows]
    if parts:
        sketch_table = pa.concat_tables(parts).combine_chunks()
    else:
        sketch_table = pa.table(
            {"doc_id": pa.array([], pa.int64()), "sketch": pa.array([], pa.binary())}
        )
    sk_ref = ray.put(sketch_table)

    def verify_block(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
        sk = ray.get(sk_ref)  # zero-copy plasma read
        ska = pa.table({"doc_id": sk.column("doc_id"), "sketch_a": sk.column("sketch")})
        skb = pa.table({"doc_id": sk.column("doc_id"), "sketch_b": sk.column("sketch")})
        j = batch.join(ska, keys=["a"], right_keys=["doc_id"], join_type="inner")
        j = j.join(skb, keys=["b"], right_keys=["doc_id"], join_type="inner")
        return verify_pairs_batch(j.combine_chunks(), cfg=cfg)

    # whole blocks per call: each call pays two Acero hash-table builds over
    # the broadcast table, so per-1024-row batches would rebuild it ~1000x
    return pairs_ds.map_batches(
        functools.partial(verify_block, cfg=cfg),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
