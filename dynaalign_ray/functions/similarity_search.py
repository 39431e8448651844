"""Similarity search over an embedding column (engine addition per the build
brief): brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
approximate variant as the scale path.

Scale story: the query matrix is broadcast once (``ray.put``); every batch
computes a (batch x queries) float32/float64 matmul and keeps only its local
top-k per query, so the reduce step sees ``num_blocks * k`` candidate rows
per query instead of the full corpus — a classic partial-topk + small final
reduce, no all-to-all shuffle.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    values = np.asarray(arr.values, dtype=np.float64)
    dim = len(arr[0]) if len(arr) else 0
    return values.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _local_topk(
    batch: pa.Table, *, query_ref, k: int, id_col: str, col: str
) -> pa.Table:
    import ray

    queries = ray.get(query_ref)  # (q, dim), L2-normalized
    vecs = _normalize(_embedding_matrix(batch, col))
    ids = np.asarray(batch.column(id_col)).astype(np.int64)
    sims = vecs @ queries.T  # (n, q)
    n, q = sims.shape
    kk = min(k, n)
    out_q, out_id, out_sim = [], [], []
    for qi in range(q):
        col_sims = sims[:, qi]
        idx = np.argpartition(-col_sims, kk - 1)[:kk]
        out_q.append(np.full(kk, qi, dtype=np.int64))
        out_id.append(ids[idx])
        out_sim.append(col_sims[idx])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
        }
    )


def brute_force_topk(
    embeddings_ds,
    query_matrix: np.ndarray,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_ids: np.ndarray | None = None,
) -> pa.Table:
    """Exact cosine top-k per query row of ``query_matrix``.

    Returns a SMALL arrow table (query_id, rank, vec_id, cosine), rank
    1-based by descending cosine with vec_id as the deterministic
    tie-breaker.  ``exclude_ids[qi]`` (e.g. the query's own vec_id) is
    dropped from query qi's result.
    """
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    ref = ray.put(qm)
    fetch = k + (1 if exclude_ids is not None else 0)
    candidates = embeddings_ds.map_batches(
        functools.partial(_local_topk, query_ref=ref, k=fetch, id_col=id_col, col=col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tbl = candidates.to_arrow_refs()
    parts = [ray.get(r) for r in tbl]
    allc = pa.concat_tables([p for p in parts if p.num_rows])
    q = np.asarray(allc.column("query_id"))
    v = np.asarray(allc.column("vec_id"))
    s = np.asarray(allc.column("cosine"))
    out_q, out_r, out_v, out_s = [], [], [], []
    for qi in np.unique(q):
        m = q == qi
        vv, ss = v[m], s[m]
        if exclude_ids is not None:
            keep = vv != exclude_ids[qi]
            vv, ss = vv[keep], ss[keep]
        order = np.lexsort((vv, -ss))[:k]
        out_q.append(np.full(len(order), qi, dtype=np.int64))
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        out_v.append(vv[order])
        out_s.append(ss[order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "rank": pa.array(np.concatenate(out_r), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
        }
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_bits, dim))


def lsh_bucket_topk(
    embeddings_ds,
    query_matrix: np.ndarray,
    k: int = 5,
    *,
    n_bits: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: sign-random-projection buckets; each batch scores
    only vectors whose bucket matches a query's bucket (or differs in up to
    ``multiprobe`` bits).  Same output schema as brute_force_topk.  At scale
    this prunes the matmul to a ~2^-n_bits fraction per probe."""
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    planes = _hyperplanes(qm.shape[1], n_bits, seed)
    qsig = (qm @ planes.T > 0).astype(np.uint64)
    qbits = (qsig << np.arange(n_bits, dtype=np.uint64)).sum(axis=1)
    # probe set per query: own bucket + all buckets within Hamming distance
    # `multiprobe` (expand the flip frontier once per allowed bit flip)
    probes = [set([int(b)]) for b in qbits]
    for ps in probes:
        frontier = set(ps)
        for _ in range(max(multiprobe, 0)):
            nxt = {b ^ (1 << bit) for b in frontier for bit in range(n_bits)}
            nxt -= ps
            ps |= nxt
            frontier = nxt
    ref = ray.put((qm, planes, [np.array(sorted(p), dtype=np.uint64) for p in probes]))

    def local(batch: pa.Table) -> pa.Table:
        queries, pl, probe_sets = ray.get(ref)
        vecs = _normalize(_embedding_matrix(batch, col))
        ids = np.asarray(batch.column(id_col)).astype(np.int64)
        sig = (vecs @ pl.T > 0).astype(np.uint64)
        bits = (sig << np.arange(pl.shape[0], dtype=np.uint64)).sum(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(queries.shape[0]):
            mask = np.isin(bits, probe_sets[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ queries[qi]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[mask][idx])
            out_sim.append(sims[idx])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )

    import ray as _ray

    candidates = embeddings_ds.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [_ray.get(r) for r in candidates.to_arrow_refs()]
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    allc = pa.concat_tables(nonempty)
    q = np.asarray(allc.column("query_id"))
    v = np.asarray(allc.column("vec_id"))
    s = np.asarray(allc.column("cosine"))
    out_q, out_r, out_v, out_s = [], [], [], []
    for qi in np.unique(q):
        m = q == qi
        vv, ss = v[m], s[m]
        order = np.lexsort((vv, -ss))[:k]
        out_q.append(np.full(len(order), qi, dtype=np.int64))
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        out_v.append(vv[order])
        out_s.append(ss[order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "rank": pa.array(np.concatenate(out_r), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
        }
    )
