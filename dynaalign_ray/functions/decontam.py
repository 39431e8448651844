"""Train/test decontamination — flag training documents that leak benchmark
(eval-set) content.  Two physical forms, both broadcast-side lookups (the
benchmark set is small and fixed; it is ``ray.put`` ONCE and read by every
actor — never a shuffle join, never re-shipped per batch):

- exact-substring containment (``SnippetDecontamActor``): one vectorized
  ``pc.match_substring`` RE2-free pass per snippet per batch.  Right for
  benchmark sets up to a few thousand snippets; oracle-exact vs DuckDB
  ``contains()``.
- n-gram overlap (``NgramDecontamActor``): the 100 TB form.  Benchmark
  word-n-gram hashes -> one sorted u64 array broadcast once; per batch the
  doc's n-grams (Arrow-native tokenizer) are membership-tested with a
  single searchsorted — O(batch n-grams x log bench).  Catches paraphrased
  / partially-overlapping leaks that exact substring misses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _maybe_get(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class SnippetDecontamActor:
    """Stateful map_batches actor: benchmark snippets fetched from the
    object store once per actor in __init__ (broadcast pattern)."""

    def __init__(self, snippets_ref):
        self.snippets: list[str] = list(_maybe_get(snippets_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        hits = np.zeros(len(batch), dtype=np.int64)
        for snip in self.snippets:
            hits += np.asarray(pc.match_substring(text, snip)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": pa.array(hits, type=pa.int64()),
                "contaminated": pa.array(hits > 0, type=pa.bool_()),
            }
        )


def build_ngram_set(snippets: list[str], n: int = 8) -> np.ndarray:
    """Benchmark texts -> sorted unique u64 word-n-gram hash array (the
    broadcast side of the n-gram decontam lookup)."""
    from dynaalign_ray.shingles import batch_shingle_hashes

    hashes, _counts = batch_shingle_hashes(list(snippets), n, "word")
    return np.unique(hashes)


class NgramDecontamActor:
    """Stateful map_batches actor: sorted benchmark n-gram hash array held
    once per actor; membership via searchsorted (no Python per row)."""

    def __init__(self, ngrams_ref, n: int = 8):
        self.ngrams: np.ndarray = _maybe_get(ngrams_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dynaalign_ray.shingles import batch_shingle_hashes

        hashes, counts = batch_shingle_hashes(batch.column("text"), self.n, "word")
        n_docs = len(batch)
        overlap = np.zeros(n_docs, dtype=np.int64)
        if len(hashes) and len(self.ngrams):
            idx = np.searchsorted(self.ngrams, hashes)
            idx[idx == len(self.ngrams)] = 0
            hit = self.ngrams[idx] == hashes
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            overlap = np.bincount(doc_of[hit], minlength=n_docs).astype(np.int64)
        frac = overlap / np.maximum(counts, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ngrams": pa.array(counts.astype(np.int64), type=pa.int64()),
                "n_overlap": pa.array(overlap, type=pa.int64()),
                "overlap_frac": pa.array(frac, type=pa.float64()),
            }
        )
