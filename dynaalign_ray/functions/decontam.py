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


def build_bloom(hashes: np.ndarray, *, bits_per_key: int = 16):
    """Sorted-or-not u64 hash array -> Bloom filter ``(words, m_bits, k)``.

    The 10^8+-benchmark-n-gram decontam form: at 16 bits/key the filter is
    ~200 MB for 10^8 n-grams (vs 800 MB for the raw sorted u64 array) and
    probes are O(k) random reads instead of a log2(n) binary-search chain —
    broadcast once via ray.put like the exact array.

    Double hashing: probe_i = (h + i*h2) mod m with h2 odd and m a power of
    two, so the k probes of a key are distinct and derived from the one u64
    n-gram hash.  Inserting and probing use the same derivation — a key that
    was inserted always finds all its bits set, so there are NO false
    negatives; false-positive rate is the standard (1-e^{-k n/m})^k
    (~5e-4 at 16 bits/key, k=11)."""
    n = max(len(hashes), 1)
    m = 1 << int(np.ceil(np.log2(max(n * bits_per_key, 64))))
    k = max(1, int(round(0.693 * (m / n))))
    k = min(k, 16)
    words = np.zeros(m // 64, dtype=np.uint64)
    h = hashes.astype(np.uint64)
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    mask = np.uint64(m - 1)
    for i in range(k):
        idx = (h + np.uint64(i) * h2) & mask  # u64 wraparound is the hash mix
        np.bitwise_or.at(
            words, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    return words, m, k


def bloom_contains(words: np.ndarray, m: int, k: int, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    h = hashes.astype(np.uint64)
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    mask = np.uint64(m - 1)
    member = np.ones(len(h), dtype=bool)
    for i in range(k):
        idx = (h + np.uint64(i) * h2) & mask
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63))) & np.uint64(1)
        member &= bit.astype(bool)
        if not member.any():
            break
    return member


class BloomDecontamActor:
    """Stateful map_batches actor: Bloom filter over the benchmark n-gram
    hashes held once per actor (same broadcast discipline as the exact
    array).  ``n_maybe`` upper-bounds the true overlap (no false negatives);
    a doc flagged here goes to the exact searchsorted pass only if a second
    confirmation stage is configured — the classic cheap-filter/exact-verify
    split for 100 TB decontam."""

    def __init__(self, bloom_ref, n: int = 8):
        self.words, self.m, self.k = _maybe_get(bloom_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dynaalign_ray.shingles import batch_shingle_hashes

        hashes, counts = batch_shingle_hashes(batch.column("text"), self.n, "word")
        n_docs = len(batch)
        maybe = np.zeros(n_docs, dtype=np.int64)
        if len(hashes):
            hit = bloom_contains(self.words, self.m, self.k, hashes)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            maybe = np.bincount(doc_of[hit], minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ngrams": pa.array(counts.astype(np.int64), type=pa.int64()),
                "n_maybe": pa.array(maybe, type=pa.int64()),
                "flagged": pa.array(maybe > 0, type=pa.bool_()),
            }
        )


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
