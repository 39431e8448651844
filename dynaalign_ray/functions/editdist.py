"""Edit-distance (Levenshtein) similarity-join kernels.

The entity-resolution / spell-candidate operator family: find all pairs of
vocabulary strings within edit distance ``d``.  Candidate generation uses
the deletion-neighborhood (SymSpell) blocking scheme, which is
RECALL-COMPLETE for Levenshtein distance:

    if lev(s, t) <= d, fix one optimal edit script of cost
    c = c_sub + c_del + c_ins <= d; deleting from ``s`` the c_sub + c_del
    positions the script substitutes-or-deletes and from ``t`` the
    c_sub + c_ins positions it substitutes-or-inserts leaves the SAME
    string (the aligned common subsequence) on both sides, reached with
    <= d deletions from each.  So every true pair shares at least one
    deletion variant, and a groupby on variant keys loses nothing; the
    exact DP then removes false positives (distinct strings CAN share a
    variant without being within d — e.g. deletions from opposite ends).

Cost per word of length L: ``1 + L + C(L, 2)`` variant keys at d=2 —
constant per word for natural-language tokens, so the variant shuffle is
O(vocab), never O(vocab^2).

No counterpart exists in the reference (it has no string-edit operators);
this extends the engine's similarity-join family (stages/ssjoin.py) from
set similarity to string edit distance.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

# 64-bit polynomial-hash constants for the batched variant-key kernel
# (wrap-around uint64 arithmetic; FNV-1a prime as the odd multiplier)
_POLY_P = np.uint64(1099511628211)
_POLY_OFFSET = np.uint64(14695981039346656037)


def deletion_variants(word: str, d: int = 2) -> list[str]:
    """All distinct strings reachable from ``word`` by at most ``d``
    single-character deletions (including ``word`` itself)."""
    seen = {word}
    frontier = [word]
    for _ in range(d):
        nxt = []
        for w in frontier:
            for i in range(len(w)):
                v = w[:i] + w[i + 1 :]
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return sorted(seen)


def deletion_variant_keys(
    words: list[str], d: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Batched deletion-neighborhood keys: for every word, one 63-bit hash
    key per DISTINCT <=d-deletion variant, returned as aligned arrays
    ``(word_index, key)``.

    Two words share a key exactly when they share a variant STRING (modulo
    64-bit polynomial-hash collisions, which can only ADD candidate pairs
    that the exact DP verify then removes — recall is unaffected), so this
    replaces per-word ``deletion_variants`` + string hashing in the
    similarity join without changing its verified output.

    Vectorized shape: the whole column is decoded in ONE codepoint pass
    ("".join -> utf-32 -> np.frombuffer), then words are processed per
    exact length with numpy-only inner ops — prefix polynomial hashes once
    per length, and per deletion-position combination one O(n_words)
    segment fold.  Total scalar-loop count equals the per-word variant
    count (sum of C(L, k) over k <= d), the same asymptotic work as the
    string generator, but every step is a batch op instead of Python
    string slicing."""
    n = len(words)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    cp = np.frombuffer("".join(words).encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])

    out_idx: list[np.ndarray] = []
    out_key: list[np.ndarray] = []
    for length in np.unique(lens):
        L = int(length)
        rows = np.flatnonzero(lens == L)
        m = len(rows)
        if L == 0:
            # empty word: its only variant is itself
            out_idx.append(rows)
            out_key.append(np.full(m, _POLY_OFFSET, dtype=np.uint64))
            continue
        M = cp[starts[rows][:, None] + np.arange(L)[None, :]]  # (m, L)
        # prefix hashes ph[:, t] = poly-hash of the first t codepoints
        # (+1 keeps codepoint 0 distinguishable from absence)
        ph = np.zeros((m, L + 1), dtype=np.uint64)
        for t in range(L):
            ph[:, t + 1] = ph[:, t] * _POLY_P + (M[:, t] + np.uint64(1))
        ppow = np.ones(L + 1, dtype=np.uint64)
        for t in range(L):
            ppow[t + 1] = ppow[t] * _POLY_P
        for k in range(min(d, L) + 1):
            for comb in combinations(range(L), k):
                h = np.full(m, _POLY_OFFSET, dtype=np.uint64)
                prev = 0
                for pos in (*comb, L):
                    seglen = pos - prev
                    h = h * ppow[seglen] + (ph[:, pos] - ph[:, prev] * ppow[seglen])
                    prev = pos + 1
                out_idx.append(rows)
                out_key.append(h)

    idx = np.concatenate(out_idx)
    key = (np.concatenate(out_key) & np.uint64((1 << 63) - 1)).astype(np.int64)
    # distinct variants per word: repeated characters make different
    # deletion-position sets collapse to the same string — drop duplicates
    order = np.lexsort((key, idx))
    idx = idx[order]
    key = key[order]
    keep = np.empty(len(idx), dtype=bool)
    keep[0] = True
    keep[1:] = (idx[1:] != idx[:-1]) | (key[1:] != key[:-1])
    return idx[keep], key[keep]


def _codepoint_matrix(words: list[str], lens: np.ndarray, maxlen: int) -> np.ndarray:
    """(n, maxlen) 0-padded codepoint matrix in one decode pass — ONE
    "".join + utf-32 frombuffer plus offset gathers, no per-word numpy
    calls (0 never equals a real character, so padding is inert)."""
    n = len(words)
    out = np.zeros((n, max(maxlen, 1)), dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    cp = np.frombuffer("".join(words).encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    starts = np.cumsum(lens) - lens
    cols = np.arange(max(maxlen, 1), dtype=np.int64)
    valid = cols[None, :] < lens[:, None]
    out[valid] = cp[(starts[:, None] + cols[None, :])[valid]]
    return out


def levenshtein_batch(a_words: list[str], b_words: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each aligned pair, as one batched DP.

    The DP table advances column-synchronously across ALL pairs: the outer
    loops run over max-length character positions (strings are short), and
    every inner step is a vectorized numpy op over the whole pair batch —
    O(Lmax^2) scalar iterations regardless of batch size, never a
    per-pair Python DP."""
    n = len(a_words)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(w) for w in a_words), dtype=np.int64, count=n)
    lb = np.fromiter((len(w) for w in b_words), dtype=np.int64, count=n)
    ma = int(la.max())
    mb = int(lb.max())
    A = _codepoint_matrix(a_words, la, ma)
    B = _codepoint_matrix(b_words, lb, mb)
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    # capture each pair's dp row at step i == len(a): for i beyond len(a)
    # the row keeps evolving, so freeze it when its own string ends
    final_row = prev.copy()  # correct for la == 0
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, mb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1), prev[:, j - 1] + cost
            )
        hit = la == i
        if hit.any():
            final_row[hit] = cur[hit]
        prev = cur
    return final_row[np.arange(n), lb]
