"""Per-cluster reduce — the reference's ``clusterconsensus``
(/root/reference/R/clusterbreak.R:309-320) re-expressed as
``groupby(cluster_id).map_groups``.

For web dedup the per-group reduce picks a canonical representative; the
consensus function is PLUGGABLE (the reference's Biostrings/DECIPHER MSA
consensus becomes an injectable UDF — a cheap positional majority-vote
consensus ships for equal-length sequence payloads).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa


def representative_longest(group: pd.DataFrame) -> pd.DataFrame:
    """Default reduce: the longest text wins (ties -> min doc_id)."""
    g = group.sort_values(["n_chars", "doc_id"], ascending=[False, True])
    top = g.iloc[0]
    return pd.DataFrame(
        {
            "cluster_id": [top["cluster_id"]],
            "consensus": [top["text"]],
            "representative_doc": [top["doc_id"]],
            "n_members": [len(group)],
        }
    )


def consensus_majority_vote(group: pd.DataFrame) -> pd.DataFrame:
    """Positional majority-vote consensus for equal-length sequences (the
    lightweight stand-in for the reference's MSA consensus); falls back to
    the longest-text representative for ragged groups."""
    texts = group["text"].tolist()
    lengths = {len(t) for t in texts}
    if len(lengths) != 1:
        return representative_longest(group)
    cons = "".join(
        Counter(chars).most_common(1)[0][0] for chars in zip(*texts)
    )
    top = group.sort_values("doc_id").iloc[0]
    return pd.DataFrame(
        {
            "cluster_id": [top["cluster_id"]],
            "consensus": [cons],
            "representative_doc": [top["doc_id"]],
            "n_members": [len(group)],
        }
    )


def cluster_consensus(
    clusters_ds,
    docs_ds,
    num_partitions: int,
    consensus_fn=representative_longest,
    min_members: int = 2,
):
    """clusters(doc_id, cluster_id) ⋈ docs -> one consensus row per cluster
    with >= min_members members (singletons are skipped by default, like the
    reference which only builds consensus for emitted clusters)."""
    import pyarrow.compute as pc

    from dynaalign_ray.joins import hash_join

    docs = docs_ds.select_columns(["doc_id", "text"])

    def add_len(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_chars", pc.utf8_length(batch.column("text")).cast(pa.int64())
        )

    joined = hash_join(
        clusters_ds.select_columns(["doc_id", "cluster_id"]),
        docs,
        left_on="doc_id",
        right_on="doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        num_partitions=num_partitions,
    ).map_batches(add_len, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_group(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < min_members:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series(dtype="int64"),
                    "consensus": pd.Series(dtype="object"),
                    "representative_doc": pd.Series(dtype="int64"),
                    "n_members": pd.Series(dtype="int64"),
                }
            )
        return consensus_fn(group)

    return joined.groupby("cluster_id", num_partitions=num_partitions).map_groups(
        reduce_group, batch_format="pandas"
    )
