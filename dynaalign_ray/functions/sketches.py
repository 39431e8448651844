"""Mergeable sketches — the partial+final aggregation pattern for
cardinality at 100 TB (emit one small sketch per batch, merge in a tiny
final step; no shuffle of raw values).

HyperLogLog (public algorithm: Flajolet et al. 2007) with 2^p registers,
fully vectorized: register index = low p bits of the 64-bit hash, rho =
1 + leading-zero count of the remaining bits.  Standard bias correction for
the small-range regime (linear counting) is included; error ~1.04/sqrt(2^p)
(~0.8% at p=14).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dynaalign_ray.shingles import _hash_utf8_spans


def hll_from_hashes(hashes: np.ndarray, p: int = 14) -> np.ndarray:
    """uint64 hashes -> HLL register array (uint8, length 2^p)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = np.asarray(hashes, dtype=np.uint64)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rho = position of first set bit in the remaining (64-p) bits, 1-based;
    # all-zero rest -> 64 - p + 1
    width = 64 - p
    rho = np.full(len(h), width + 1, dtype=np.uint8)
    nz = rest != 0
    # count trailing zeros via bit tricks: x & -x isolates lowest set bit
    low = (rest[nz] & (~rest[nz] + np.uint64(1))).astype(np.uint64)
    rho[nz] = (np.log2(low.astype(np.float64)).astype(np.uint8)) + 1
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = sketches[0].copy()
    for s in sketches[1:]:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = np.count_nonzero(regs == 0)
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting regime
    return float(est)


def approx_distinct_strings(
    ds, col: str, p: int = 14, flatten_tokens: bool = False, merge_fanin: int = 8
):
    """Approximate distinct count of a string column (or of its whitespace
    tokens with ``flatten_tokens``) — per-batch HLL partials, a distributed
    register-max pre-merge (EXACT: max is order-independent), then a
    <=merge_fanin-row driver merge.  Driver transfer is O(merge_fanin * 2^p)
    regardless of the corpus block count."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(col).combine_chunks()
        if flatten_tokens:
            # Arrow-native token flatten (no Python list building); drop the
            # boundary empty strings Arrow's split keeps
            arr = pc.list_flatten(pc.utf8_split_whitespace(arr))
            arr = arr.filter(pc.greater(pc.binary_length(arr), 0))
        h = _hash_utf8_spans(arr, seed=0x5EE7)
        regs = hll_from_hashes(h, p)
        return pa.table({"sketch": pa.array([regs.tobytes()], type=pa.binary())})

    def max_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sketch" not in b.column_names:
            return pa.table({"sketch": pa.array([], type=pa.binary())})
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in b.column("sketch").to_pylist():
            np.maximum(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
        return pa.table({"sketch": pa.array([acc.tobytes()], type=pa.binary())})

    import ray

    parts = (
        ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=merge_fanin)
        .map_batches(
            max_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize().to_arrow_refs()
    )
    sketches = []
    for ref in parts:
        tbl = ray.get(ref)
        if tbl.num_rows == 0 or "sketch" not in tbl.column_names:
            continue
        for b in tbl.column("sketch").to_pylist():
            sketches.append(np.frombuffer(b, dtype=np.uint8))
    if not sketches:
        return 0.0
    return hll_estimate(hll_merge(sketches))


def exact_int_quantiles(
    values_ds, col: str, qs: list[float], num_partitions: int
) -> pa.Table:
    """EXACT distributed quantiles of a bounded-cardinality integer column
    (token counts, lengths, sizes) via a value histogram: per-block
    ``np.unique`` partials -> keyed repartition + local Arrow group-by sum
    -> a tiny (distinct values) driver table -> cumulative counts pick rank
    ``max(0, ceil(q*n) - 1)`` of the sorted multiset — DuckDB's
    ``quantile_disc`` rule, verified empirically, so results are
    hash-exact against a SQL oracle (unlike the mergeable approximate
    quantile in pipelines/neardup._approx_quantile, which trades exactness
    for O(1) state on unbounded doubles).

    Shuffle carries (value, count) partials only — at most
    ``blocks * distinct`` narrow rows, never the data column."""
    import math

    import ray

    vals, counts = _int_value_histogram(values_ds, col, num_partitions)
    if vals is None:
        return pa.table(
            {"q": pa.array([], type=pa.float64()), "value": pa.array([], type=pa.int64())}
        )
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        out_q.append(float(q))
        out_v.append(int(vals[pos]))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "value": pa.array(out_v, type=pa.int64()),
        }
    )


def exact_int_quantiles_cont(
    values_ds, col: str, qs: list[float], num_partitions: int
) -> pa.Table:
    """EXACT interpolated quantiles (DuckDB ``quantile_cont`` rule) over the
    same distributed value histogram as :func:`exact_int_quantiles`:
    position ``p = q*(n-1)`` in the sorted multiset, linear interpolation
    ``lo + (hi-lo)*(p - floor(p))`` between the elements at ``floor(p)`` /
    ``ceil(p)``.  Inputs are exact ints, so both engines interpolate the
    same numbers; results are 4-decimal rounded on both sides."""
    import math

    vals, counts = _int_value_histogram(values_ds, col, num_partitions)
    if vals is None:
        return pa.table(
            {"q": pa.array([], type=pa.float64()), "value": pa.array([], type=pa.float64())}
        )
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        p = q * (n - 1)
        i0, i1 = math.floor(p), math.ceil(p)
        lo = float(vals[int(np.searchsorted(cum, i0 + 1, side="left"))])
        hi = float(vals[int(np.searchsorted(cum, i1 + 1, side="left"))])
        out_q.append(float(q))
        out_v.append(lo + (hi - lo) * (p - i0))
    scaled = np.asarray(out_v, dtype=np.float64) * 10_000.0
    rounded = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "value": pa.array(rounded / 10_000.0, type=pa.float64()),
        }
    )


def _int_value_histogram(values_ds, col: str, num_partitions: int):
    """Distributed (value, count) histogram of an int column; returns
    (sorted_values, counts) or (None, None) on empty input.  Shuffle
    carries (value, count) partials only — at most ``blocks * distinct``
    narrow rows, never the data column."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col)).astype(np.int64)
        vals, counts = np.unique(v, return_counts=True)
        return pa.table(
            {
                "value": pa.array(vals, type=pa.int64()),
                "c": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    def merge_block(b: pa.Table) -> pa.Table:
        g = b.group_by("value").aggregate([("c", "sum")])
        return pa.table({"value": g.column("value"), "c": g.column("c_sum")})

    hist = (
        values_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=num_partitions, keys=["value"])
        .map_batches(
            merge_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    parts = [t for t in (ray.get(r) for r in hist.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return None, None
    tbl = pa.concat_tables(parts)
    vals = np.asarray(tbl.column("value")).astype(np.int64)
    counts = np.asarray(tbl.column("c")).astype(np.int64)
    order = np.argsort(vals)
    return vals[order], counts[order]


class KLL:
    """Mergeable KLL quantile sketch (public algorithm: Karnin, Lang &
    Liberty 2016) for UNBOUNDED float columns — the general-purpose
    counterpart of :func:`exact_int_quantiles`, whose value-histogram plan
    needs bounded distinct cardinality.  Rank error is ~O(1/k) of n (the
    pytest gate asserts <= 2/k empirically); state is O(k log(n/k)) floats
    regardless of n, so one sketch per block shuffles as a few KiB of
    bytes and merges associatively on the driver — the same partial+merge
    skeleton as the HLL above.

    Compaction keeps every other element of a sorted level (weight
    doubles); the survivor parity alternates via a deterministic toggle, so
    a fixed execution plan reproduces bit-identical sketches (no RNG).
    """

    __slots__ = ("k", "levels", "_toggle")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._toggle = 0

    # --- capacity rule: level h (0 = raw) holds k * (2/3)^(depth-1-h),
    # floored at 8 — higher (coarser, heavier-weighted) levels get more room
    def _cap(self, h: int) -> int:
        depth = len(self.levels)
        c = self.k * (2.0 / 3.0) ** (depth - 1 - h)
        return max(8, int(c))

    def add(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self.levels[0] = np.concatenate([self.levels[0], v])
            self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) <= self._cap(h):
                h += 1
                continue
            buf = np.sort(self.levels[h])
            # compact an EVEN count; an odd leftover stays at this level so
            # total weight n is preserved exactly (sum over levels of
            # len * 2^h never changes)
            if len(buf) % 2:
                leftover, buf = buf[-1:], buf[:-1]
            else:
                leftover = np.empty(0, dtype=np.float64)
            self._toggle ^= 1
            promoted = buf[self._toggle :: 2]
            self.levels[h] = leftover
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    def merge(self, other: "KLL") -> "KLL":
        for h, arr in enumerate(other.levels):
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h] = np.concatenate([self.levels[h], arr])
        self._compress()
        return self

    def n(self) -> int:
        return int(sum(len(a) << h for h, a in enumerate(self.levels)))

    def quantiles(self, qs: list[float]) -> np.ndarray:
        """Estimated quantile values at ranks ceil(q*n) of the weighted
        sample (the quantile_disc convention)."""
        vals = np.concatenate(self.levels) if self.levels else np.empty(0)
        if not len(vals):
            return np.full(len(qs), np.nan)
        w = np.concatenate(
            [np.full(len(a), 1 << h, dtype=np.int64) for h, a in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        cum = np.cumsum(w)
        n = cum[-1]
        out = np.empty(len(qs), dtype=np.float64)
        for i, q in enumerate(qs):
            target = max(1, int(np.ceil(q * n)))
            out[i] = vals[int(np.searchsorted(cum, target, side="left"))]
        return out

    def to_bytes(self) -> bytes:
        import struct

        parts = [struct.pack("<iii", self.k, self._toggle, len(self.levels))]
        for a in self.levels:
            parts.append(struct.pack("<i", len(a)))
            parts.append(a.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        import struct

        k, toggle, nlev = struct.unpack_from("<iii", blob, 0)
        off = 12
        sk = cls(k)
        sk._toggle = toggle
        sk.levels = []
        for _ in range(nlev):
            (ln,) = struct.unpack_from("<i", blob, off)
            off += 4
            sk.levels.append(
                np.frombuffer(blob, dtype="<f8", count=ln, offset=off).copy()
            )
            off += 8 * ln
        return sk


def approx_float_quantiles(
    values_ds, col: str, qs: list[float], *, k: int = 256, merge_fanin: int = 8
) -> pa.Table:
    """Distributed approximate quantiles of an UNBOUNDED float column: one
    KLL partial per block (a few KiB of bytes each — never the column), a
    distributed pre-merge to ``merge_fanin`` blocks (KLL merge is
    associative; the rank-error bound composes over any merge tree), then a
    <=merge_fanin-row driver merge.  Returns (q, value) like
    :func:`exact_int_quantiles`; rank error ~2/k of n (pytest-gated)."""
    import ray

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sk = KLL(k).add(np.asarray(batch.column(col), dtype=np.float64))
        return pa.table({"sketch": pa.array([sk.to_bytes()], type=pa.binary())})

    def merge_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sketch" not in b.column_names:
            return pa.table({"sketch": pa.array([], type=pa.binary())})
        acc: KLL | None = None
        for blob in b.column("sketch").to_pylist():
            sk = KLL.from_bytes(blob)
            acc = sk if acc is None else acc.merge(sk)
        return pa.table({"sketch": pa.array([acc.to_bytes()], type=pa.binary())})

    parts = (
        values_ds.map_batches(
            sketch_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .repartition(num_blocks=merge_fanin)
        .map_batches(
            merge_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize().to_arrow_refs()
    )
    merged: KLL | None = None
    for ref in parts:
        tbl = ray.get(ref)
        if tbl.num_rows == 0 or "sketch" not in tbl.column_names:
            continue
        for blob in tbl.column("sketch").to_pylist():
            sk = KLL.from_bytes(blob)
            merged = sk if merged is None else merged.merge(sk)
    if merged is None or merged.n() == 0:
        return pa.table(
            {"q": pa.array([], type=pa.float64()), "value": pa.array([], type=pa.float64())}
        )
    vals = merged.quantiles(qs)
    return pa.table(
        {
            "q": pa.array([float(q) for q in qs], type=pa.float64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )


def grouped_approx_distinct(
    ds, key: str, value: str, num_partitions: int, p: int = 12
) -> "object":
    """Approximate COUNT(DISTINCT value) per group via GROUPED mergeable HLL
    — the 100 TB form of events_type_users (whose exact plan must co-locate
    every distinct (key, value) pair; this one shuffles one 2^p-byte
    register row per (block, group) instead).

    Plan: per block, one lexsort by key delimits groups and each group's
    int64 values are splitmix-hashed into an HLL register array (binary
    column); keyed repartition by hash(key); per block, register-wise max
    merge per group (exact string compare delimits — routing hash never
    enters correctness); estimate locally.  Error ~1.04/sqrt(2^p) (~1.6%
    at p=12, 4 KiB per group-partial)."""
    import functools

    import pyarrow as pa
    import pyarrow.compute as pc

    from dynaalign_ray.hashing import hash_strings, mix64, to_id63

    out_partial = pa.schema(
        [("grp", pa.string()), ("regs", pa.binary()), ("route", pa.int64())]
    )

    def partial(batch: pa.Table, *, p: int) -> pa.Table:
        if batch.num_rows == 0:
            return out_partial.empty_table()
        idx = pc.sort_indices(batch, sort_keys=[(key, "ascending")])
        s = batch.take(idx)
        grp = s.column(key).combine_chunks()
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.chunk(0)
        codes = np.asarray(grp.dictionary_encode().indices, dtype=np.int64)
        vals = mix64(np.asarray(s.column(value)).astype(np.uint64))
        bounds = np.flatnonzero(
            np.concatenate([[True], codes[1:] != codes[:-1], [True]])
        )
        names, blobs = [], []
        for g in range(len(bounds) - 1):  # O(groups-per-block)
            lo, hi = int(bounds[g]), int(bounds[g + 1])
            names.append(grp[lo].as_py())
            blobs.append(hll_from_hashes(vals[lo:hi], p=p).tobytes())
        route = to_id63(hash_strings(names))
        return pa.table(
            {
                "grp": pa.array(names, pa.string()),
                "regs": pa.array(blobs, pa.binary()),
                "route": pa.array(route, pa.int64()),
            },
            schema=out_partial,
        )

    out_schema = pa.schema([("grp", pa.string()), ("n_approx", pa.int64())])

    def merge_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(b, sort_keys=[("grp", "ascending")])
        s = b.take(idx)
        grp = s.column("grp").combine_chunks()
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.chunk(0)
        codes = np.asarray(grp.dictionary_encode().indices, dtype=np.int64)
        blobs = s.column("regs").to_pylist()
        bounds = np.flatnonzero(
            np.concatenate([[True], codes[1:] != codes[:-1], [True]])
        )
        names, ests = [], []
        for g in range(len(bounds) - 1):
            lo, hi = int(bounds[g]), int(bounds[g + 1])
            regs = hll_merge(
                [np.frombuffer(blobs[i], dtype=np.uint8) for i in range(lo, hi)]
            )
            names.append(grp[lo].as_py())
            ests.append(int(round(hll_estimate(regs))))
        return pa.table(
            {"grp": pa.array(names, pa.string()), "n_approx": pa.array(ests, pa.int64())},
            schema=out_schema,
        )

    return (
        ds.map_batches(
            functools.partial(partial, p=p), batch_format="pyarrow", zero_copy_batch=True
        )
        .repartition(num_blocks=num_partitions, keys=["route"])
        .map_batches(
            merge_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (public algorithm: Cormode & Muthukrishnan 2005) — the
# mergeable FREQUENCY sketch completing the family (HLL = distinct, KLL =
# quantiles, CMS = per-item counts).  d hash rows x w counters; estimate =
# min over rows; always >= the true count, and <= true + eps*N with
# probability 1-delta for w = ceil(e/eps), d = ceil(ln 1/delta).
# Distributed shape: one (d*w) int64 partial per batch, elementwise-sum
# merge on the driver — raw tokens never shuffle.

_CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)


def cms_from_hashes(
    hashes: np.ndarray, d: int = 4, w: int = 8192
) -> np.ndarray:
    """uint64 item hashes -> (d, w) int64 counter matrix (one batch's
    partial).  Row j uses an independent tabulation: mix64(h ^ seed_j) % w.
    Fully vectorized (np.add.at per row)."""
    from dynaalign_ray.hashing import mix64

    sk = np.zeros((d, w), dtype=np.int64)
    if len(hashes) == 0:
        return sk
    h = np.asarray(hashes, dtype=np.uint64)
    for j in range(d):
        idx = (mix64(h ^ np.uint64(_CMS_SEEDS[j])) % np.uint64(w)).astype(np.int64)
        np.add.at(sk[j], idx, 1)
    return sk


def cms_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = sketches[0].copy()
    for s in sketches[1:]:
        out += s
    return out


def cms_query(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """(d, w) sketch + uint64 item hashes -> int64 estimates (min over
    rows; never below the true count)."""
    from dynaalign_ray.hashing import mix64

    d, w = sk.shape
    h = np.asarray(hashes, dtype=np.uint64)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(d):
        idx = (mix64(h ^ np.uint64(_CMS_SEEDS[j])) % np.uint64(w)).astype(np.int64)
        np.minimum(est, sk[j, idx], out=est)
    return est


def approx_token_counts(
    ds, col: str, probe_tokens: list[str], d: int = 4, w: int = 8192,
    merge_fanin: int = 8,
):
    """Approximate whitespace-token frequencies via a distributed count-min
    sketch: per-batch (d, w) partials (d*w*8 bytes each — the ONLY bytes
    that leave the workers), a DISTRIBUTED pre-merge (repartition to
    ``merge_fanin`` blocks, per-block elementwise sum — integer sums are
    order-independent, so this is exact), then a final <=merge_fanin-row
    driver merge and one vectorized probe of ``probe_tokens``.  Driver
    transfer is O(merge_fanin * d * w), independent of the corpus block
    count (the per-batch-to-driver form would ship one 256 KB partial per
    block — a real cap at 10^6 blocks).  Deterministic given the seeds.

    Returns a pyarrow table (token, est_count) in probe order."""
    import pyarrow.compute as pc

    from dynaalign_ray.shingles import _hash_utf8_spans

    def sketch_batch(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).combine_chunks()
        arr = pc.list_flatten(pc.utf8_split_whitespace(arr))
        arr = arr.filter(pc.greater(pc.binary_length(arr), 0))
        h = _hash_utf8_spans(arr, seed=0xC0F3)
        sk = cms_from_hashes(h, d=d, w=w)
        return pa.table({"sketch": pa.array([sk.tobytes()], type=pa.binary())})

    def sum_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"sketch": pa.array([], type=pa.binary())})
        acc = np.zeros(d * w, dtype=np.int64)
        for blob in b.column("sketch").to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64)
        return pa.table({"sketch": pa.array([acc.tobytes()], type=pa.binary())})

    import ray

    parts = (
        ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=merge_fanin)
        .map_batches(
            sum_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize().to_arrow_refs()
    )
    sketches = []
    for ref in parts:
        tbl = ray.get(ref)
        # repartition emits schema-LESS empty blocks (the same Ray quirk
        # joins.py documents) — skip anything without the sketch column
        if tbl.num_rows == 0 or "sketch" not in tbl.column_names:
            continue
        for b in tbl.column("sketch").to_pylist():
            sketches.append(np.frombuffer(b, dtype=np.int64).reshape(d, w))
    if not sketches:
        est = np.zeros(len(probe_tokens), dtype=np.int64)
    else:
        merged = cms_merge(sketches)
        ph = _hash_utf8_spans(pa.array(probe_tokens, type=pa.string()), seed=0xC0F3)
        est = cms_query(merged, ph)
    return pa.table(
        {
            "token": pa.array(probe_tokens, type=pa.string()),
            "est_count": pa.array(est, type=pa.int64()),
        }
    )


def exact_range_bounds(
    ds, col: str, num_shards: int, num_partitions: int
) -> np.ndarray:
    """Shard boundaries for range partitioning: the exact ``i/num_shards``
    quantiles of ``col`` (i = 1..num_shards-1).  Shared by the sorted
    range sink (sources/io.write_range_shards) and its auditing query
    (pipelines/curation.doc_range_bucket) so the boundary rule cannot
    drift between writer and reader."""
    qs = [i / num_shards for i in range(1, num_shards)]
    return np.asarray(
        exact_int_quantiles(ds, col, qs, num_partitions).column("value"),
        dtype=np.int64,
    )


def assign_range_bucket(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """bucket = #boundaries <= value (searchsorted side='right': a value
    equal to a boundary goes to the HIGHER bucket) — the single tie rule
    both the sink and the query use."""
    return np.searchsorted(bounds, values, side="right").astype(np.int64)
