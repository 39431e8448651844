"""Repetition-based quality signals (Gopher-style) over the ``documents``
table: per-doc duplicate-word fraction, most-common-word fraction and
most-common-2-gram fraction — the standard web-corpus repetition filters.

Fully vectorized: tokens/2-grams come from the Arrow-native shingle
tokenizer (``shingles.batch_shingle_hashes`` — split/hash off the raw
offsets buffers, no Python strings), and per-doc duplicate statistics are
one lexsort + run-length pass over the whole batch (the `emit_pairs_block`
segment pattern).  No per-row or per-group Python.

Fractions are emitted as the raw IEEE result of ``int_num / double(total)``
— the oracle SQL computes the identical expression, so the doubles are
bit-identical with no rounding convention needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _per_doc_run_stats(
    hashes: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Values grouped by doc (``counts[d]`` values for doc d, in order) ->
    per-doc ``(total, n_distinct, max_count)`` where max_count is the
    multiplicity of the doc's most frequent value."""
    n_docs = len(counts)
    total = counts.astype(np.int64)
    distinct = np.zeros(n_docs, dtype=np.int64)
    maxc = np.zeros(n_docs, dtype=np.int64)
    if len(hashes) == 0 or n_docs == 0:
        return total, distinct, maxc
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), total)
    order = np.lexsort((hashes, doc_of))
    h = hashes[order]
    d = doc_of[order]
    new = np.empty(len(h), dtype=bool)
    new[0] = True
    new[1:] = (h[1:] != h[:-1]) | (d[1:] != d[:-1])
    run_starts = np.flatnonzero(new)
    run_len = np.diff(np.append(run_starts, len(h))).astype(np.int64)
    run_doc = d[run_starts]
    distinct = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
    nonempty = np.flatnonzero(total > 0)
    if len(nonempty):
        seg_starts = np.searchsorted(run_doc, nonempty)
        maxc[nonempty] = np.maximum.reduceat(run_len, seg_starts)
    return total, distinct, maxc


def repetition_stats_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> (doc_id, n_tokens, n_distinct, dup_word_frac, top_word_frac,
    top_2gram_frac).  Tokens are ``\\S+`` runs; docs with no tokens (or no
    2-grams) get 0.0 for the respective fraction."""
    from dynaalign_ray.shingles import batch_shingle_hashes

    text = batch.column(col)
    h1, c1 = batch_shingle_hashes(text, 1, "word")
    h2, c2 = batch_shingle_hashes(text, 2, "word")
    t1, d1, m1 = _per_doc_run_stats(h1, c1)
    t2, _d2, m2 = _per_doc_run_stats(h2, c2)

    safe1 = np.maximum(t1, 1).astype(np.float64)
    safe2 = np.maximum(t2, 1).astype(np.float64)
    dup_word_frac = np.where(t1 > 0, (t1 - d1) / safe1, 0.0)
    top_word_frac = np.where(t1 > 0, m1 / safe1, 0.0)
    top_2gram_frac = np.where(t2 > 0, m2 / safe2, 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(t1, type=pa.int64()),
            "n_distinct": pa.array(d1, type=pa.int64()),
            "dup_word_frac": pa.array(dup_word_frac, type=pa.float64()),
            "top_word_frac": pa.array(top_word_frac, type=pa.float64()),
            "top_2gram_frac": pa.array(top_2gram_frac, type=pa.float64()),
        }
    )
