"""Parquet sources/sinks (SURVEY.md §2.5: the reference has only lazy .rda
loads and NO sink — results live in RAM; here every table is Parquet in and
partitioned Parquet out).

Readers prune columns at the scan (only requested columns leave storage);
the writer lays output out as one directory per key-range so a rerun can
skip finished partitions (resume story, with state/lineage.py on top).
"""

from __future__ import annotations

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path: str, *, with_html: bool = True, with_text: bool = False):
    """Read a Common-Crawl-style pages table (BASELINE.json input_hint
    shape).  By default only the columns the extract stage needs leave
    storage — reading all 5 columns for a 2-column transform is wrong."""
    import ray.data as rd

    cols = ["url", "lang"] + (["html"] if with_html else []) + (
        ["text"] if with_text else []
    )
    return rd.read_parquet(path, columns=cols)


def read_table(path: str, columns=None, *, format: str = "parquet"):
    """Columnar table source.  ``format``: "parquet" (default; columns are
    pruned AT THE SCAN — only requested columns/row-groups leave storage),
    "jsonl" (newline-delimited JSON — the common web-crawl interchange
    shape), or "csv".  jsonl/csv have no row-group projection, so column
    pruning happens right after decode (still before the first shuffle)."""
    import ray.data as rd

    if format == "parquet":
        return rd.read_parquet(path, columns=columns)
    if format == "jsonl":
        ds = rd.read_json(path)
    elif format == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unknown format {format!r}")
    return ds.select_columns(list(columns)) if columns else ds


def write_partitioned(ds, out_dir: str, *, num_partitions: int, keys=None):
    """Partitioned Parquet sink: hash-partition on ``keys`` (or keep block
    layout) and write one file per partition — never one giant file."""
    if keys:
        ds = ds.repartition(num_blocks=num_partitions, keys=list(keys))
    else:
        ds = ds.repartition(num_blocks=num_partitions)
    ds.write_parquet(out_dir)
    return out_dir
