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

Global token order — two plans, both exact (the order affects only the
candidate count, never recall; any FIXED global total order satisfies
the theorem):

- ``order="value"``: ascending shingle-HASH value (the sets are already
  stored sorted) — a uniform random permutation of the universe; zero
  extra passes.
- ``order="df"``: rarest-first, the classic PPJoin ordering, WITHOUT the
  corpus-sized df table: token document frequencies are estimated by a
  count-min sketch (one bounded (d, w) partial per block, distributed
  pre-merge, ~1 MB broadcast), and each set is ordered by
  (estimated df ASC, token value ASC).  CMS error can only mis-RANK
  tokens — both endpoints of a pair use the same merged sketch, so the
  order stays a fixed global total order and recall stays 1.0;
  boilerplate tokens (df ~ corpus size, estimate within eps*N) sink to
  the suffix, so prefixes carry rare tokens and hot-token buckets
  shrink from O(corpus) to near the true-duplicate groups.

Scale shape: prefix explode (O(sum p_i) narrow rows) -> ONE keyed shuffle
on the token -> per-bucket pair emission with the length filter
(tau*|s| <= |r|) -> global pair dedup inside the verify join (partitions
on ``b``, so duplicate (a,b) copies co-locate and drop in-kernel) ->
exact-Jaccard verify via stages.verify.verified_edges.  No stage
broadcasts anything that scales with the corpus.

OUTPUT-SIZE boundary (inherent to exact pair enumeration, not to this
plan): the result is Θ(true qualifying pairs).  A duplicate cluster of m
docs contributes C(m, 2) pairs — a 100k-member boilerplate cluster alone
is 5·10^9 rows.  For corpora with huge near-dup clusters the flagship
LSH pipeline (pair_cap star edges preserve connectivity with m-1 rows)
is the dedup path; the SSJoin is the exact-JOIN operator for workloads
that need every pair (audits, similarity graphs over curated corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dynaalign_ray.hashing import to_id63


def prefix_tokens_block(
    batch: pa.Table, *, threshold: float, cms_ref=None
) -> pa.Table:
    """(doc_id, sketch) -> (tok, doc_id, n): each doc's first
    ``n - floor(tau*n) + 1`` tokens in the global order (63-bit folded for
    the int64 shuffle key; a fold collision only ever ADDS a candidate
    pair — exactness lives in the verify stage).  With ``cms_ref`` the
    order is (CMS-estimated df ASC, value ASC); without, ascending value
    (the sets are stored sorted, so the prefix is a contiguous slice)."""
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
    if cms_ref is None:
        total = int(p.sum())
        first = np.cumsum(p) - p
        pos = np.arange(total, dtype=np.int64) - np.repeat(first, p)
        toks = vals[np.repeat(starts, p) + pos]
    else:
        import ray

        from dynaalign_ray.functions.sketches import cms_query

        sk = ray.get(cms_ref)
        n_total = int(sizes.sum())
        seg = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        flat_idx = np.repeat(starts, sizes) + (
            np.arange(n_total, dtype=np.int64)
            - np.repeat(np.cumsum(sizes) - sizes, sizes)
        )
        flat = vals[flat_idx]
        est = cms_query(sk, flat)
        order = np.lexsort((flat, est, seg))  # per-set (df ASC, value ASC)
        flat_s = flat[order]
        seg_starts = np.cumsum(sizes) - sizes  # segments stay contiguous
        pos = np.arange(n_total, dtype=np.int64) - np.repeat(seg_starts, sizes)
        toks = flat_s[pos < np.repeat(p, sizes)]
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
    tau_eps = threshold - 1e-9
    # one segment-vectorized triu over every token bucket (shared
    # bands.segment_triu_rows kernel); docs ascend within a token and a
    # doc can repeat if two of its shingle hashes fold to the same 63-bit
    # key, so self-pairs are filtered after the gather
    from dynaalign_ray.stages.bands import segment_triu_rows

    m_of = ends - starts
    a_rows, b_rows = segment_triu_rows(starts, ends, m_of >= 2)
    if len(a_rows) == 0:
        return out_schema.empty_table()
    na, nb = n[a_rows], n[b_rows]
    keep = (np.minimum(na, nb) >= tau_eps * np.maximum(na, nb)) & (
        doc[a_rows] != doc[b_rows]
    )
    if not keep.any():
        return out_schema.empty_table()
    out_a = [doc[a_rows[keep]]]
    out_b = [doc[b_rows[keep]]]
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
        },
        schema=out_schema,
    )


def cms_df_order_ref(sets_ds, d: int = 4, w: int = 1 << 15, merge_fanin: int = 8):
    """Merged count-min sketch over every set token — the rarest-first
    order's frequency table, O(d*w) regardless of corpus size.  Same
    bounded distributed pre-merge shape as
    functions.sketches.approx_token_counts: one (d, w) partial per block,
    repartition to ``merge_fanin``, per-block elementwise sum (integer —
    exact under any order), tiny driver merge, broadcast ONCE."""
    import ray

    from dynaalign_ray.exec import broadcast_put
    from dynaalign_ray.functions.sketches import cms_from_hashes, cms_merge
    from dynaalign_ray.stages.verify import _sketch_arrays

    def sketch_batch(batch: pa.Table) -> pa.Table:
        vals, _ = _sketch_arrays(batch.column("sketch"))
        sk = cms_from_hashes(vals, d=d, w=w)
        return pa.table({"cms": pa.array([sk.tobytes()], type=pa.binary())})

    def sum_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"cms": pa.array([], type=pa.binary())})
        acc = np.zeros(d * w, dtype=np.int64)
        for blob in b.column("cms").to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64)
        return pa.table({"cms": pa.array([acc.tobytes()], type=pa.binary())})

    parts = (
        sets_ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=merge_fanin)
        .map_batches(
            sum_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize().to_arrow_refs()
    )
    sketches = []
    for ref in parts:
        tbl = ray.get(ref)
        if tbl.num_rows == 0 or "cms" not in tbl.column_names:
            continue  # schema-less empty repartition blocks (joins.py quirk)
        for blob in tbl.column("cms").to_pylist():
            sketches.append(np.frombuffer(blob, dtype=np.int64).reshape(d, w))
    merged = cms_merge(sketches) if sketches else np.zeros((d, w), np.int64)
    return broadcast_put(merged)


def all_tokens_block(batch: pa.Table) -> pa.Table:
    """(doc_id, sketch) -> EVERY token as (tok, doc_id, n) — the index side
    of the containment join (the smaller set's prefix must be probed
    against the larger set's FULL token list; prefix-vs-prefix only bounds
    symmetric measures like Jaccard)."""
    from dynaalign_ray.stages.verify import _sketch_arrays

    out_schema = pa.schema(
        [("tok", pa.int64()), ("doc_id", pa.int64()), ("n", pa.int64())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    vals, offs = _sketch_arrays(batch.column("sketch"))
    ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    sizes = (offs[1:] - offs[:-1]).astype(np.int64)
    return pa.table(
        {
            "tok": pa.array(to_id63(vals), type=pa.int64()),
            "doc_id": pa.array(np.repeat(ids, sizes), type=pa.int64()),
            "n": pa.array(np.repeat(sizes, sizes), type=pa.int64()),
        },
        schema=out_schema,
    )


def containment_candidates_block(batch: pa.Table) -> pa.Table:
    """Token-bucket candidate emission for the containment join (runs
    after repartition(keys=["tok"]) over the UNION of probe rows
    (role=0, prefix tokens) and index rows (role=1, all tokens)): emit
    (min_doc, max_doc) for every (probe, index) pair in the bucket with
    probe.n <= index.n and different docs.  The size gate keeps exactly
    the guaranteed direction (the smaller set's prefix is the probe);
    cross-bucket duplicates drop inside the verify join."""
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    tok = np.asarray(batch.column("tok")).astype(np.int64)
    doc = np.asarray(batch.column("doc_id")).astype(np.int64)
    n = np.asarray(batch.column("n")).astype(np.int64)
    role = np.asarray(batch.column("role")).astype(np.int64)
    order = np.lexsort((doc, role, tok))
    tok, doc, n, role = tok[order], doc[order], n[order], role[order]
    boundary = np.ones(len(tok), dtype=bool)
    boundary[1:] = tok[1:] != tok[:-1]
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], len(tok))
    # segment-vectorized probe x index cross product: rows are sorted
    # (tok, role, doc), so each bucket holds its probes (role 0) first,
    # then its index rows (role 1) — every probe row pairs with its
    # bucket's index span via repeat/offset arithmetic, no per-bucket
    # Python
    m_of = ends - starts
    bucket_of = np.repeat(np.arange(len(starts), dtype=np.int64), m_of)
    is_probe = role == 0
    p_cnt = np.bincount(bucket_of[is_probe], minlength=len(starts)).astype(np.int64)
    i_cnt = m_of - p_cnt
    i_start = starts + p_cnt
    probe_rows = np.flatnonzero(is_probe)
    rep = i_cnt[bucket_of[probe_rows]]
    total = int(rep.sum())
    if total == 0:
        return out_schema.empty_table()
    a_rows = np.repeat(probe_rows, rep)
    e2 = np.cumsum(rep)
    offs = np.arange(total, dtype=np.int64) - np.repeat(e2 - rep, rep)
    b_rows = i_start[bucket_of[a_rows]] + offs
    keep = (n[a_rows] <= n[b_rows]) & (doc[a_rows] != doc[b_rows])
    if not keep.any():
        return out_schema.empty_table()
    da, db = doc[a_rows[keep]], doc[b_rows[keep]]
    out_a = [np.minimum(da, db)]
    out_b = [np.maximum(da, db)]
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
        },
        schema=out_schema,
    )


def containment_verify_batch(batch: pa.Table, *, threshold: float) -> pa.Table:
    """(a, b, sketch_a, sketch_b) -> (a, b, containment) rows with
    containment = |A∩B| / min(|A|,|B|) >= threshold.  Duplicate (a, b)
    copies are dropped in-kernel (the upstream join partitions on ``b``,
    colocating them — the verify_pairs_batch contract).  The intersection
    count is recovered from the exact Jaccard row exactly as the
    broadcast containment plan does (i = rint(j*(la+lb)/(1+j))), so the
    emitted float matches that plan bit-for-bit."""
    from dynaalign_ray.stages.verify import _pairwise_jaccard, _sketch_arrays

    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("containment", pa.float64())]
    )
    n = batch.num_rows
    if n == 0:
        return out_schema.empty_table()
    aa = np.asarray(batch.column("a")).astype(np.int64)
    bb = np.asarray(batch.column("b")).astype(np.int64)
    order = np.lexsort((bb, aa))
    uniq = np.ones(n, dtype=bool)
    uniq[1:] = (aa[order][1:] != aa[order][:-1]) | (bb[order][1:] != bb[order][:-1])
    if not uniq.all():
        batch = batch.take(pa.array(order[uniq]))
    va, oa = _sketch_arrays(batch.column("sketch_a"))
    vb, ob = _sketch_arrays(batch.column("sketch_b"))
    oa64 = oa.astype(np.int64, copy=False)
    ob64 = ob.astype(np.int64, copy=False)
    la = (oa64[1:] - oa64[:-1]).astype(np.float64)
    lb = (ob64[1:] - ob64[:-1]).astype(np.float64)
    jac = _pairwise_jaccard(
        va, oa64[:-1], oa64[1:], vb, ob64[:-1], ob64[1:], 1 << 62
    )
    inter = np.rint(jac * (la + lb) / (1.0 + jac))
    cont = inter / np.minimum(la, lb)
    keep = cont >= threshold
    return pa.table(
        {
            "a": pa.array(np.asarray(batch.column("a"))[keep], type=pa.int64()),
            "b": pa.array(np.asarray(batch.column("b"))[keep], type=pa.int64()),
            "containment": pa.array(cont[keep], type=pa.float64()),
        },
        schema=out_schema,
    )


def prefix_containment_join(
    sets_ds, threshold: float, num_partitions: int, order: str = "value"
):
    """(doc_id, sketch) -> exact (a, b, containment) edges with
    containment >= threshold, via the asymmetric prefix filter: the
    smaller set's prefix (length n - floor(t*n) + 1) must intersect the
    larger set's FULL token list when |A∩B| >= t*min (same suffix-capacity
    argument as the Jaccard form, applied one-sided).  Index side shuffles
    every token once — O(total tokens), nothing broadcast."""
    import functools

    from dynaalign_ray.joins import hash_join

    if order not in ("value", "df"):
        raise ValueError(f"order must be 'value' or 'df', got {order!r}")
    cms_ref = cms_df_order_ref(sets_ds) if order == "df" else None

    def with_role(role):
        def add(b: pa.Table) -> pa.Table:
            return b.append_column(
                "role", pa.array(np.full(b.num_rows, role, dtype=np.int64))
            )

        return add

    probe = sets_ds.map_batches(
        functools.partial(
            prefix_tokens_block, threshold=threshold, cms_ref=cms_ref
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(with_role(0), batch_format="pyarrow", zero_copy_batch=True)
    index = sets_ds.map_batches(
        all_tokens_block, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(with_role(1), batch_format="pyarrow", zero_copy_batch=True)
    pairs = (
        probe.union(index)
        .repartition(num_blocks=num_partitions, keys=["tok"])
        .map_batches(
            containment_candidates_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    sk_a = pa.schema([("doc_id", pa.int64()), ("sketch_a", pa.binary())])
    sk_b = pa.schema([("doc_id", pa.int64()), ("sketch_b", pa.binary())])

    def _sk(name):
        def project(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b.column("doc_id"), name: b.column("sketch")})

        return sets_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    j1 = hash_join(
        pairs, _sk("sketch_a"), left_on="a", right_on="doc_id",
        left_schema=pairs_schema, right_schema=sk_a, num_partitions=num_partitions,
    )
    j1_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("sketch_a", pa.binary())]
    )
    j2 = hash_join(
        j1, _sk("sketch_b"), left_on="b", right_on="doc_id",
        left_schema=j1_schema, right_schema=sk_b, num_partitions=num_partitions,
    )
    return j2.map_batches(
        functools.partial(containment_verify_batch, threshold=threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def prefix_jaccard_join(
    sets_ds, threshold: float, num_partitions: int, order: str = "value"
):
    """(doc_id, sketch) dataset -> exact (a, b, jaccard) edges with
    jaccard >= threshold, via prefix filter + length filter + exact
    verify.  ``sets_ds`` must hold COMPLETE sorted shingle-hash sets (the
    verify is exact only below the sketch cap).  ``order``: "value"
    (zero-pass baseline) or "df" (rarest-first via a CMS — smaller
    candidate buckets on boilerplate-heavy corpora; same exact result)."""
    import functools

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.stages.verify import verified_edges

    if order not in ("value", "df"):
        raise ValueError(f"order must be 'value' or 'df', got {order!r}")
    cms_ref = cms_df_order_ref(sets_ds) if order == "df" else None
    pairs = (
        sets_ds.map_batches(
            functools.partial(
                prefix_tokens_block, threshold=threshold, cms_ref=cms_ref
            ),
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
