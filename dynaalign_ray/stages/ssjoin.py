"""Prefix-filtered EXACT set-similarity self-join (SSJoin / PPJoin family:
Chaudhuri-Ganti-Kaushik ICDE'06 prefix filter; Xiao et al. WWW'08) — the
third exact-Jaccard plan, between "broadcast all-pairs" and "LSH+verify":

- unlike the all-pairs plans it never considers O(n^2) row pairs — only
  docs sharing a PREFIX token meet;
- unlike banded LSH its recall is 1.0 BY CONSTRUCTION (the prefix-filter
  theorem), not probabilistic.

Theorem (prefix filter, Jaccard form): order the token universe by any
fixed global total order and let each set's prefix be its first
``p = n - ceil(tau*n) + 1`` tokens.  If J(r, s) >= tau then prefix(r) and
prefix(s) share at least one token.  (J >= tau forces overlap
o >= ceil(tau * max(|r|,|s|)); if the prefixes were disjoint, all o common
tokens would have to fit in the two suffixes, of combined capacity
< o + o.)  This implementation uses ``p = n - floor(tau*n) + 1`` — one
token longer when tau*n is integral — so float rounding of ``tau*n`` can
only ever LENGTHEN the prefix, never break the guarantee.

Global token order: ascending shingle-HASH value (the sets are already
stored sorted).  Hash order is a uniform random permutation of the
universe — the correct-but-unweighted baseline; the classic
rarest-first (ascending document frequency) order shrinks candidate
counts further at the cost of a df groupby over the token universe and a
broadcast/join of the df table (the TF-IDF-gate shape).  At web scale the
df ordering is worth wiring behind the same plan switch; candidates are
exact either way.

Scale shape: prefix explode (O(sum p_i) narrow rows) -> ONE keyed shuffle
on the token -> per-bucket pair emission with the length filter
(tau*|s| <= |r|) -> global pair dedup inside the verify join (partitions
on ``b``, so duplicate (a,b) copies co-locate and drop in-kernel) ->
exact-Jaccard verify via stages.verify.verified_edges.  No stage
broadcasts anything that scales with the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dynaalign_ray.hashing import to_id63


def prefix_tokens_block(batch: pa.Table, *, threshold: float) -> pa.Table:
    """(doc_id, sketch) -> (tok, doc_id, n): each doc's first
    ``n - floor(tau*n) + 1`` sorted shingle hashes (63-bit folded for the
    int64 shuffle key; a fold collision only ever ADDS a candidate pair —
    exactness lives in the verify stage)."""
    from dynaalign_ray.stages.verify import _sketch_arrays

    out_schema = pa.schema(
        [("tok", pa.int64()), ("doc_id", pa.int64()), ("n", pa.int64())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    vals, offs = _sketch_arrays(batch.column("sketch"))
    ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    starts = offs[:-1].astype(np.int64)
    sizes = (offs[1:] - offs[:-1]).astype(np.int64)
    p = np.minimum(
        sizes - np.floor(threshold * sizes).astype(np.int64) + 1, sizes
    )
    total = int(p.sum())
    first = np.cumsum(p) - p
    pos = np.arange(total, dtype=np.int64) - np.repeat(first, p)
    toks = vals[np.repeat(starts, p) + pos]
    return pa.table(
        {
            "tok": pa.array(to_id63(toks), type=pa.int64()),
            "doc_id": pa.array(np.repeat(ids, p), type=pa.int64()),
            "n": pa.array(np.repeat(sizes, p), type=pa.int64()),
        },
        schema=out_schema,
    )


def prefix_candidates_block(batch: pa.Table, *, threshold: float) -> pa.Table:
    """Token-bucket pair emission (runs after repartition(keys=["tok"])):
    within each token's bucket emit every (a < b) doc pair passing the
    length filter ``min(|r|,|s|) >= (tau - 1e-9) * max(|r|,|s|)`` (J >= tau
    implies min/max >= tau exactly; the epsilon only guards the float
    product from dropping a boundary pair — it can only ADD candidates).
    No pair cap: exactness is the contract; the downstream verify join
    drops cross-bucket duplicates."""
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    tok = np.asarray(batch.column("tok")).astype(np.int64)
    doc = np.asarray(batch.column("doc_id")).astype(np.int64)
    n = np.asarray(batch.column("n")).astype(np.int64)
    order = np.lexsort((doc, tok))
    tok, doc, n = tok[order], doc[order], n[order]
    boundary = np.ones(len(tok), dtype=bool)
    boundary[1:] = tok[1:] != tok[:-1]
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], len(tok))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    tau_eps = threshold - 1e-9
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        bucket_doc = doc[s:e]  # ascending, distinct within a token
        bucket_n = n[s:e]
        ai, bi = np.triu_indices(m, k=1)
        na, nb = bucket_n[ai], bucket_n[bi]
        keep = np.minimum(na, nb) >= tau_eps * np.maximum(na, nb)
        if keep.any():
            out_a.append(bucket_doc[ai[keep]])
            out_b.append(bucket_doc[bi[keep]])
    if not out_a:
        return out_schema.empty_table()
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
        },
        schema=out_schema,
    )


def prefix_jaccard_join(sets_ds, threshold: float, num_partitions: int):
    """(doc_id, sketch) dataset -> exact (a, b, jaccard) edges with
    jaccard >= threshold, via prefix filter + length filter + exact
    verify.  ``sets_ds`` must hold COMPLETE sorted shingle-hash sets (the
    verify is exact only below the sketch cap)."""
    import functools

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.stages.verify import verified_edges

    pairs = (
        sets_ds.map_batches(
            functools.partial(prefix_tokens_block, threshold=threshold),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(num_blocks=num_partitions, keys=["tok"])
        .map_batches(
            functools.partial(prefix_candidates_block, threshold=threshold),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    cfg = DedupConfig(tau=threshold, sketch_cap=1 << 62)
    return verified_edges(
        pairs,
        sets_ds,
        cfg,
        num_partitions,
        approx_pairs=None,
        pairs_deduped=False,
    )
