"""Distributed joins for the engine.

The reference has no joins inside the package (its workspace evaluation uses
``dplyr::left_join``, /root/reference/workspace/troyWspc.Rmd:153); the engine
needs them on the hot path (pair -> sketch lookup, label propagation, final
cluster assignment).  Ray 2.49's ``Dataset.join`` crashes whenever a join
partition receives zero rows of one side (its ArrowBlockBuilder produces a
schema-less empty table that pyarrow's join rejects), so the engine carries
its own:

- :func:`hash_join` — portable partitioned hash join: tag each side, union,
  ONE hash shuffle on the key, then a pyarrow (C++) join per partition
  block.  Explicit schemas make empty partitions well-typed.
- :func:`broadcast_join` — small right side: ``ray.put`` the built right
  table once, pyarrow-join against it inside every map task (no shuffle).
"""

from __future__ import annotations

from dynaalign_ray.exec import broadcast_put

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE_COL = "__daside"
_KEY_COL = "__dakey"


def _widen(
    batch: pa.Table, *, key: str, lfields: list, rfields: list, side: int
) -> pa.Table:
    """Project one side onto the combined (key, side, left..., right...)
    schema — identical column order on both sides so unioned block schemas
    line up.  ``lfields``/``rfields`` are the non-key fields of each side."""
    n = batch.num_rows
    own = {f.name for f in (lfields if side == 0 else rfields)}
    cols: dict = {
        _KEY_COL: batch.column(key).cast(pa.int64()),
        _SIDE_COL: pa.array([side] * n, type=pa.int8()),
    }
    for f in lfields + rfields:
        cols[f.name] = (
            batch.column(f.name).cast(f.type) if f.name in own else pa.nulls(n, type=f.type)
        )
    return pa.table(cols)


def _merge_block(
    batch: pa.Table,
    *,
    lfields: list,
    rfields: list,
    left_key: str,
    right_key: str,
    how: str,
) -> pa.Table:
    left_mask = pc.equal(batch.column(_SIDE_COL), 0)
    left_rows = batch.filter(left_mask)
    right_rows = batch.filter(pc.invert(left_mask))
    left_tbl = pa.table(
        {left_key: left_rows.column(_KEY_COL)}
        | {f.name: left_rows.column(f.name) for f in lfields}
    )
    right_tbl = pa.table(
        {right_key: right_rows.column(_KEY_COL)}
        | {f.name: right_rows.column(f.name) for f in rfields}
    )
    joined = left_tbl.join(
        right_tbl,
        keys=[left_key],
        right_keys=[right_key],
        join_type=how,
        right_suffix="_r",
    )
    return joined.combine_chunks()


def hash_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    num_partitions: int,
    how: str = "inner",
):
    """Partitioned hash join on int64 keys.

    ``left_schema`` / ``right_schema`` describe each side INCLUDING the key
    column — passed explicitly so empty partitions stay typed (the stages
    know their schemas statically).  ``how`` is pyarrow's join_type
    ("inner", "left outer", ...).  Non-key column names must not overlap.
    """
    lfields = [f for f in left_schema if f.name != left_on]
    rfields = [f for f in right_schema if f.name != right_on]
    overlap = {f.name for f in lfields} & {f.name for f in rfields}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")
    lt = left_ds.map_batches(
        functools.partial(_widen, key=left_on, lfields=lfields, rfields=rfields, side=0),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rt = right_ds.map_batches(
        functools.partial(_widen, key=right_on, lfields=lfields, rfields=rfields, side=1),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    unioned = lt.union(rt).repartition(num_blocks=num_partitions, keys=[_KEY_COL])
    return unioned.map_batches(
        functools.partial(
            _merge_block,
            lfields=lfields,
            rfields=rfields,
            left_key=left_on,
            right_key=right_on,
            how=how,
        ),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def broadcast_join(
    left_ds,
    right_table: pa.Table,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
):
    """Join against a SMALL right side: the built table is put in the object
    store once and every map task joins its batch against it — no shuffle
    (the broadcast-lookup pattern for dimension tables / label maps)."""
    import ray

    ref = broadcast_put(right_table)

    def _join(batch: pa.Table) -> pa.Table:
        right = ray.get(ref)
        return batch.join(
            right, keys=[left_on], right_keys=[right_on], join_type=how, right_suffix="_r"
        ).combine_chunks()

    return left_ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


BROADCAST_ROW_LIMIT = 2_000_000  # dimension rows above this hash-join instead


def pack_int64_list(list_arr) -> pa.Array:
    """list<int64> -> binary (little-endian int64 payload) — pyarrow's acero
    join rejects nested types as non-key payload ("Data type list<...> is not
    supported in join non-key field"), so list payloads ride joins as packed
    bytes.  Zero per-row Python: the list's values/offsets buffers are
    re-labelled as a BinaryArray's data/offsets (x8)."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    flat = np.asarray(list_arr.flatten()).astype(np.int64)
    # rebuild offsets from per-row lengths (robust to sliced arrays, whose
    # raw offsets buffer still carries the pre-slice positions)
    lens = np.asarray(
        pc.fill_null(pc.list_value_length(list_arr), 0)
    ).astype(np.int64)
    offs = (np.concatenate([[0], np.cumsum(lens)]) * 8).astype(np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        len(list_arr),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def unpack_int64_blob(value) -> np.ndarray:
    """One packed row (bytes or None) back to its int64 ndarray."""
    if value is None:
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(value, dtype=np.int64)


def collect_arrow(ds) -> pa.Table:
    """Concat a (known-small) Dataset into one Arrow table directly from its
    block refs — zero-copy concat of Arrow blocks, never a per-row Python
    rebuild (``take_all`` materializes Python dicts row by row)."""
    import ray

    refs = ds.materialize().to_arrow_refs()
    parts = [ray.get(r) for r in refs]
    nonempty = [p for p in parts if p.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty).combine_chunks()
    return parts[0] if parts else pa.table({})


def dim_join(
    fact_ds,
    dim_ds,
    *,
    left_on: str,
    right_on: str,
    fact_schema: pa.Schema,
    dim_schema: pa.Schema,
    num_partitions: int,
    how: str = "inner",
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
    approx_dim_rows: int | None = None,
):
    """Fact ⋈ dimension with a size-gated physical plan: the dimension side
    is broadcast (one plasma replica, no shuffle) while it fits
    ``broadcast_limit`` rows, else both sides go through the partitioned
    :func:`hash_join`.  The row count is metadata-cheap for Parquet reads;
    pass ``approx_dim_rows`` when a count would trigger execution."""
    n = approx_dim_rows if approx_dim_rows is not None else dim_ds.count()
    if n <= broadcast_limit:
        return broadcast_join(
            fact_ds, collect_arrow(dim_ds), left_on=left_on, right_on=right_on, how=how
        )
    return hash_join(
        fact_ds,
        dim_ds,
        left_on=left_on,
        right_on=right_on,
        left_schema=fact_schema,
        right_schema=dim_schema,
        num_partitions=num_partitions,
        how=how,
    )


def broadcast_semi_join(left_ds, keys: "pa.Table | list[int]", *, left_on: str, anti: bool = False):
    """Semi / anti join against a broadcast key set: keep rows whose key is
    (semi) / is not (anti) in ``keys`` — the filter-by-keyset pattern from
    the scale playbook (broadcast the key set, filter inside map_batches;
    no shuffle).  ``keys`` may be an int64 list/array or a one-column table."""
    import ray

    if isinstance(keys, pa.Table):
        arr = np.asarray(keys.column(0)).astype(np.int64)
    else:
        arr = np.asarray(keys, dtype=np.int64)
    key_ref = broadcast_put(np.unique(arr))

    def filt(batch: pa.Table) -> pa.Table:
        wanted = ray.get(key_ref)
        vals = np.asarray(batch.column(left_on)).astype(np.int64)
        if len(wanted) == 0:
            member = np.zeros(len(vals), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(wanted, vals), len(wanted) - 1)
            member = wanted[pos] == vals
        return batch.filter(pa.array(~member if anti else member))

    return left_ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
