"""Small-scale compatibility layer mirroring the reference's R API shapes.

``minhash_compat`` reproduces the output structure of the reference's
pure-R ``minhash(sequences, k, n_hash)`` (/root/reference/R/minHash.R:206-221):
vocabulary (sorted distinct shingle strings), characteristic matrix,
signature matrix (n_hash x n docs) and distance matrix (1 - fraction of
matching signature slots, diag 0 — R/minHash.R:166-182), plus
``similarity_mh_compat`` for the C++ ``similarityMH`` similarity-matrix
shape (src/minHash.cpp:119-188, diag 1).

DRIVER-SIDE, SMALL-SCALE ONLY: dense O(V·n) / O(n²) outputs are exactly
what the distributed engine never materializes; this exists so peptide
workloads written against the reference API keep working on small inputs
and so property tests can mirror the reference's testthat suite
(tests/testthat/test-minHash.R).  Deterministic (config seed) unlike the
reference's unseeded RNG.
"""

from __future__ import annotations

import numpy as np

from dynaalign_ray.hashing import make_permutations
from dynaalign_ray.shingles import batch_shingle_hashes, minhash_signatures


def _shingle_strings(seq: str, k: int) -> list[str]:
    # shingle() semantics: error if k < 1 or k > nchar(x) (R/minHash.R:15-16)
    if k < 1:
        raise ValueError("k must be >= 1")
    if k > len(seq):
        raise ValueError(f"k ({k}) must not exceed sequence length ({len(seq)})")
    return [seq[i : i + k] for i in range(len(seq) - k + 1)]


def create_vocab(sequences: list[str], k: int) -> list[str]:
    """Sorted distinct shingles across the corpus (R/minHash.R:38-41)."""
    vocab: set[str] = set()
    for s in sequences:
        vocab.update(_shingle_strings(s, k))
    return sorted(vocab)


def create_char_matrix(sequences: list[str], vocab: list[str], k: int) -> np.ndarray:
    """|vocab| x n one-hot membership matrix (R/minHash.R:60-66)."""
    index = {v: i for i, v in enumerate(vocab)}
    m = np.zeros((len(vocab), len(sequences)), dtype=np.int8)
    for j, s in enumerate(sequences):
        for sh in _shingle_strings(s, k):
            m[index[sh], j] = 1
    return m


def minhash_compat(
    sequences: list[str], k: int, n_hash: int, seed: int = 42
) -> dict:
    """{vocabulary, char_matrix, sig_matrix, dist_matrix} — the R pipeline's
    composed output, computed with the engine's vectorized kernels."""
    vocab = create_vocab(sequences, k)
    char_matrix = create_char_matrix(sequences, vocab, k)
    hashes, counts = batch_shingle_hashes(sequences, k, "char")
    a, b = make_permutations(n_hash, seed)
    sig = minhash_signatures(hashes, counts, a, b)  # (n, n_hash)
    sim = _pairwise_slot_match(sig)
    dist = 1.0 - sim
    np.fill_diagonal(dist, 0.0)
    return {
        "vocabulary": vocab,
        "char_matrix": char_matrix,
        "sig_matrix": sig.T,  # reference orientation: n_hash x n
        "dist_matrix": dist,
    }


def similarity_mh_compat(
    sequences: list[str], k: int = 4, n_hash: int = 50, seed: int = 42
) -> np.ndarray:
    """n x n similarity matrix, diag 1 (similarityMH shape,
    src/minHash.cpp:160-186) — same validation as the reference: empty
    input and k<=0 error."""
    if len(sequences) == 0:
        raise ValueError("sequences must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    if n_hash <= 0:
        raise ValueError("n_hash must be positive")
    hashes, counts = batch_shingle_hashes(sequences, k, "char")
    a, b = make_permutations(n_hash, seed)
    sig = minhash_signatures(hashes, counts, a, b)
    sim = _pairwise_slot_match(sig)
    np.fill_diagonal(sim, 1.0)
    return sim


def _pairwise_slot_match(sig: np.ndarray) -> np.ndarray:
    """similarity(i, j) = mean(sig_i == sig_j) — vectorized all-pairs (the
    estimator of src/minHash.cpp:168-176), O(n² · n_hash)."""
    n, h = sig.shape
    out = np.empty((n, n), dtype=np.float64)
    for i in range(n):
        out[i] = (sig[i][np.newaxis, :] == sig).mean(axis=1)
    return out
