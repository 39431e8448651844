"""Corpus-trained character-trigram LM scoring — the CCNet-style
"train a statistical LM on the corpus, score every document" quality
filter (Wenzek et al. 2019 use KenLM 5-gram perplexity; the plumbing
here is the same three-stage distributed shape, the scoring statistic is
count-based so the DuckDB oracle is bit-exact — repo discipline: no
transcendentals in oracle-checked floats):

1. TRAIN: one vectorized pass packs every in-doc character-trigram
   window into a 63-bit integer key (3 x 21-bit codepoints — injective,
   and numeric key order == UTF-8 lexicographic order of the trigram
   string, which makes the top-V tie-break SQL-reproducible), partially
   aggregates per block, then one small ``groupby(key).sum`` shuffle
   produces exact global counts.
2. TRUNCATE + BROADCAST: the top ``vocab`` trigrams by (count DESC, key
   ASC) plus the exact total window count T are ``ray.put`` ONCE
   (``exec.broadcast_put``); at 100 TB the model stays O(vocab), never
   O(corpus).
3. SCORE: each docs block re-packs its windows, binary-searches the
   broadcast key table, and segment-sums hits per doc.  familiarity =
   hit_count / (n_trigrams * T) — ONE IEEE division of exact integers
   (numerator and denominator < 2^53 up to ~10^15 total windows), so
   DuckDB reproduces the double bit-for-bit.

Low familiarity flags text whose character statistics diverge from the
corpus (mojibake, binary spill, boilerplate code in a prose corpus) —
the same decision surface a perplexity threshold gives, with the
monotone log dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SHIFT = 21  # max codepoint 0x10FFFF < 2^21; 3 fields pack into 63 bits
_DEFAULT_VOCAB = 4096


def pack_trigram_windows(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Texts -> (packed int64 trigram keys concatenated doc-order, per-doc
    window counts).  A doc of L codepoints has max(L-2, 0) windows; the
    pack is ``(c0<<42)|(c1<<21)|c2`` over codepoints, injective and
    order-isomorphic to the trigram string under binary UTF-8 collation."""
    bufs: list[np.ndarray] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None or len(t) < 3:
            continue
        a = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        p = (a[:-2] << (2 * _SHIFT)) | (a[1:-1] << _SHIFT) | a[2:]
        bufs.append(p)
        counts[i] = len(p)
    flat = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.int64)
    return flat, counts


def trigram_counts_block(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Per-block PARTIAL trigram counts (the pre-aggregate combiner that
    keeps the global shuffle O(distinct), not O(windows))."""
    flat, _ = pack_trigram_windows(batch.column(col).to_pylist())
    keys, n = np.unique(flat, return_counts=True)
    return pa.table(
        {
            "g_pack": pa.array(keys, type=pa.int64()),
            "n": pa.array(n.astype(np.int64), type=pa.int64()),
        }
    )


def train_trigram_model(
    docs_ds, vocab: int = _DEFAULT_VOCAB, num_partitions: int = 8
):
    """docs (doc_id, text) -> broadcast ref of (keys_sorted_asc,
    counts_aligned, T).  Exact: partial per-block counts -> one
    groupby-sum over distinct trigrams -> top-``vocab`` by
    (count DESC, key ASC); T is the exact total over ALL trigrams
    (pre-truncation), so truncation changes hit_count, never the
    denominator."""
    import ray
    from ray.data.aggregate import Sum

    from dynaalign_ray.exec import broadcast_put

    grouped = (
        docs_ds.map_batches(
            trigram_counts_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("g_pack", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    ).materialize()
    total_row = grouped.aggregate(Sum("n", alias_name="T"))
    T = int(total_row["T"] or 0)
    # Top-V truncation via per-block partial top-V (no global sort over
    # the distinct-trigram table).  Tie rule at the V boundary: (count
    # DESC, g_pack ASC) — g_pack values are distinct after the groupby,
    # so this is a TOTAL order and the truncated vocab is exactly the
    # same set the global sort().limit(V) plan picks (SQL-reproducible:
    # ORDER BY n DESC, g_pack ASC LIMIT V).
    from dynaalign_ray.exec import partial_topk

    top = partial_topk(
        grouped, [("n", "descending"), ("g_pack", "ascending")], vocab
    )
    parts = [t for t in (ray.get(r) for r in top.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:  # corpus with no doc of >= 3 codepoints
        e = np.empty(0, dtype=np.int64)
        return broadcast_put((e, e, 0))
    mt = pa.concat_tables(parts)
    keys = np.asarray(mt.column("g_pack")).astype(np.int64)
    cnts = np.asarray(mt.column("n")).astype(np.int64)
    order = np.argsort(keys, kind="stable")  # searchsorted wants asc keys
    return broadcast_put((keys[order], cnts[order], T))


def dual_trigram_counts_block(
    batch: pa.Table, *, target_source: str, col: str = "text"
) -> pa.Table:
    """Per-block PARTIAL counts for BOTH the raw corpus and its
    target-source slice in one pass: (g_pack, n, n_tgt)."""
    import pyarrow.compute as pc

    texts = batch.column(col).to_pylist()
    is_tgt = np.asarray(
        pc.equal(batch.column("source"), pa.scalar(target_source))
    ).astype(bool)
    flat_all, _ = pack_trigram_windows(texts)
    flat_tgt, _ = pack_trigram_windows([t for t, m in zip(texts, is_tgt) if m])
    keys, n = np.unique(flat_all, return_counts=True)
    n_tgt = np.zeros(len(keys), dtype=np.int64)
    if len(flat_tgt):
        kt, ct = np.unique(flat_tgt, return_counts=True)
        n_tgt[np.searchsorted(keys, kt)] = ct  # target trigrams ⊆ all trigrams
    return pa.table(
        {
            "g_pack": pa.array(keys, type=pa.int64()),
            "n": pa.array(n.astype(np.int64), type=pa.int64()),
            "n_tgt": pa.array(n_tgt, type=pa.int64()),
        }
    )


def train_dual_trigram_models(
    docs_with_source_ds,
    target_source: str,
    vocab: int = _DEFAULT_VOCAB,
    num_partitions: int = 8,
):
    """One corpus pass + one shuffle training BOTH DSIR models: the raw LM
    over every doc and the target LM over the ``target_source`` slice.
    Output is bit-identical to two ``train_trigram_model`` calls (the
    target slice's trigram counts ARE the n_tgt lane; same (count DESC,
    g_pack ASC) top-V tie rule, same pre-truncation totals) — but the
    corpus is read and the distinct-trigram table shuffled ONCE instead
    of twice, which at 100 TB is a whole saved read+shuffle.

    Returns (target_ref, raw_ref); raises if the target slice has no
    trigrams (the caller's fail-loudly contract)."""
    import functools

    import ray
    from ray.data.aggregate import Sum

    from dynaalign_ray.exec import broadcast_put, partial_topk

    grouped = (
        docs_with_source_ds.map_batches(
            functools.partial(
                dual_trigram_counts_block, target_source=target_source
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("g_pack", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"), Sum("n_tgt", alias_name="n_tgt"))
    ).materialize()
    totals = grouped.aggregate(
        Sum("n", alias_name="T"), Sum("n_tgt", alias_name="T_tgt")
    )
    T_raw = int(totals["T"] or 0)
    T_tgt = int(totals["T_tgt"] or 0)
    if T_tgt == 0:
        raise ValueError(
            f"DSIR target slice source={target_source!r} has no trigrams "
            "(empty slice or all docs shorter than 3 codepoints)"
        )

    def model_ref(count_col: str, T: int):
        src = grouped
        if count_col == "n_tgt":
            import pyarrow.compute as pc

            def nonzero(b: pa.Table) -> pa.Table:
                return b.filter(pc.greater(b.column("n_tgt"), 0))

            src = grouped.map_batches(
                nonzero, batch_format="pyarrow", zero_copy_batch=True
            )
        top = partial_topk(
            src, [(count_col, "descending"), ("g_pack", "ascending")], vocab
        )
        parts = [t for t in (ray.get(r) for r in top.materialize().to_arrow_refs()) if t.num_rows]
        if not parts:
            e = np.empty(0, dtype=np.int64)
            return broadcast_put((e, e, 0))
        mt = pa.concat_tables(parts)
        keys = np.asarray(mt.column("g_pack")).astype(np.int64)
        cnts = np.asarray(mt.column(count_col)).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        return broadcast_put((keys[order], cnts[order], T))

    return model_ref("n_tgt", T_tgt), model_ref("n", T_raw)


def familiarity_score_block(
    batch: pa.Table, *, model_ref, col: str = "text"
) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_trigrams, hit_count, familiarity)."""
    import ray

    model = ray.get(model_ref)
    T = model[2]
    flat, per_doc = pack_trigram_windows(batch.column(col).to_pylist())
    hit = _model_hits(flat, per_doc, model)
    denom = per_doc.astype(np.float64) * float(T)
    fam = np.divide(
        hit.astype(np.float64),
        denom,
        out=np.zeros(len(per_doc), dtype=np.float64),
        where=denom > 0,
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_trigrams": pa.array(per_doc, type=pa.int64()),
            "hit_count": pa.array(hit, type=pa.int64()),
            "familiarity": pa.array(fam, type=pa.float64()),
        }
    )


def hash_embedding_block(
    batch: pa.Table, *, dims: int = 64, col: str = "text"
) -> pa.Table:
    """Feature-hashed bag-of-character-trigrams document embedding (the
    hashing trick, Weinberger et al. ICML'09): dim = pack % dims, sign =
    +1/-1 from the next pack bit, value = signed trigram count — exact
    integers, so the sparse (doc_id, dim, val) rows are bit-exact against
    a DuckDB oracle (the pack is SQL-expressible:
    unicode(c0)*2^42 + unicode(c1)*2^21 + unicode(c2)).  Emits only
    nonzero entries.  These vectors feed the ANN/semantic-dedup family
    when no learned embedding column exists."""
    flat, per_doc = pack_trigram_windows(batch.column(col).to_pylist())
    ids = np.asarray(batch.column("doc_id")).astype(np.int64)
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("dim", pa.int64()), ("val", pa.int64())]
    )
    if len(flat) == 0:
        return out_schema.empty_table()
    gidx = np.repeat(np.arange(len(per_doc), dtype=np.int64), per_doc)
    dim = flat % dims
    sign = 1 - 2 * ((flat // dims) & 1)
    acc = np.zeros((len(per_doc), dims), dtype=np.int64)
    np.add.at(acc, (gidx, dim), sign)
    di, dj = np.nonzero(acc)
    return pa.table(
        {
            "doc_id": pa.array(ids[di], type=pa.int64()),
            "dim": pa.array(dj.astype(np.int64), type=pa.int64()),
            "val": pa.array(acc[di, dj], type=pa.int64()),
        },
        schema=out_schema,
    )


def _model_hits(flat: np.ndarray, per_doc: np.ndarray, model) -> np.ndarray:
    """Segment-sum of model counts over each doc's packed windows."""
    keys, cnts, _T = model
    vals = np.zeros(len(flat), dtype=np.int64)
    if len(flat) and len(keys):
        idx = np.searchsorted(keys, flat)
        idx_c = np.minimum(idx, len(keys) - 1)
        ok = keys[idx_c] == flat
        vals[ok] = cnts[idx_c[ok]]
    ends = np.cumsum(per_doc)
    starts = ends - per_doc
    hit = np.zeros(len(per_doc), dtype=np.int64)
    nz = np.flatnonzero(per_doc > 0)
    if len(nz):
        hit[nz] = np.add.reduceat(vals, starts[nz])
    return hit


def dsir_weight_block(
    batch: pa.Table, *, target_ref, raw_ref, col: str = "text"
) -> pa.Table:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — hashed-n-gram importance
    estimator; here the features are the repo's packed char trigrams so the
    weight is a bit-exact-oracle-able ratio of exact integer counts).

    weight = p_target(x) / p_raw(x) over the doc's trigram bag, with the
    per-doc window count cancelling:

        weight = (hit_target + 1) * T_raw / ((hit_raw + 1) * T_target)

    +1 smoothing keeps the ratio finite when a doc misses a truncated
    vocabulary entirely (standard additive smoothing; also removes the
    zero-denominator branch from the SQL mirror).  Every term is an exact
    int64 < 2^53; the float tree is two IEEE multiplies and one divide,
    mirrored op-for-op by the DuckDB oracle.  One window-pack pass per
    block, two binary searches (target model, raw model) — both models are
    broadcast refs fetched once per task."""
    import ray

    tgt = ray.get(target_ref)
    raw = ray.get(raw_ref)
    flat, per_doc = pack_trigram_windows(batch.column(col).to_pylist())
    ht = _model_hits(flat, per_doc, tgt)
    hr = _model_hits(flat, per_doc, raw)
    t_tgt, t_raw = float(tgt[2]), float(raw[2])
    w = ((ht + 1).astype(np.float64) * t_raw) / (
        (hr + 1).astype(np.float64) * t_tgt
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_trigrams": pa.array(per_doc, type=pa.int64()),
            "hit_target": pa.array(ht, type=pa.int64()),
            "hit_raw": pa.array(hr, type=pa.int64()),
            "weight": pa.array(w, type=pa.float64()),
        }
    )
