"""Peptide-payload query pipelines — driver-checkable queries() entries for
the reference's sequence operators (SURVEY.md §2 #13-16, #18-19):
substitution matrices + Needleman-Wunsch rescoring (src/pairwiseSeqAlign.cpp
via stages/nw.py), Louvain community detection (R/clusterbreak.R:37-67 via
stages/louvain.py), the clusterbreak size controller with "round.cid"
labels (R/clusterbreak.R:180-275 via pipelines/clusterbreak.py), and
center-star MSA consensus (R/clusterbreak.R:309-320 via stages/consensus).

The input is the deterministic isolate fixture (fixtures_peptide
.generate_isolates — h3n2sample-shaped, clades planted as mutation
families): there is no peptide table in the driver's parquet set, so
``sf_dir`` is accepted for the queries() signature but the corpus is
synthesized in-process (seeded — identical rows every run).  These entries
are rows-only for the driver (sequence DP / community detection are not
SQL-expressible over the registered views); their semantics are pinned by
the pytest oracle suite (tests/test_peptide_parity.py, test_louvain.py,
test_consensus_windows.py, test_peptide_queries.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dynaalign_ray.config import DedupConfig

_N_ISOLATES = 160
_N_CLADES = 5
_SEQ_LEN = 180
_SEED = 17
_CFG = dict(shingle_mode="char", shingle_k=4, tau=0.4)


def _isolate_docs(num_partitions: int = 4):
    """Deterministic (doc_id, text) Dataset of h3n2-shaped isolates plus
    the raw fixture table (for clade labels in tests)."""
    import ray.data as rd

    from dynaalign_ray.exec import configure_context
    from dynaalign_ray.fixtures_peptide import generate_isolates

    configure_context()
    iso = generate_isolates(
        n=_N_ISOLATES, n_clades=_N_CLADES, seq_len=_SEQ_LEN, seed=_SEED
    )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(1, iso.num_rows + 1), pa.int64()
                ),
                "text": iso.column("sequence"),
            }
        )
    ).repartition(num_partitions)
    return docs.materialize(), iso


def _edges_with_texts(docs, edges, num_partitions: int):
    """(a, b) candidate pairs joined to both endpoint sequences — the
    shuffle-side pair+payload prep for the exact NW rescorer."""
    from dynaalign_ray.joins import hash_join

    def _t(name):
        def project(b: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": b.column("doc_id"), name: b.column("text")}
            )

        return docs.map_batches(
            project, batch_format="pyarrow", zero_copy_batch=True
        )

    j1 = hash_join(
        edges.select_columns(["a", "b"]),
        _t("text_a"),
        left_on="a",
        right_on="doc_id",
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        right_schema=pa.schema(
            [("doc_id", pa.int64()), ("text_a", pa.string())]
        ),
        num_partitions=num_partitions,
    )
    return hash_join(
        j1,
        _t("text_b"),
        left_on="b",
        right_on="doc_id",
        left_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("text_a", pa.string())]
        ),
        right_schema=pa.schema(
            [("doc_id", pa.int64()), ("text_b", pa.string())]
        ),
        num_partitions=num_partitions,
    )


def peptide_nw_rescore(sf_dir: str, num_partitions: int = 4):
    """Operators #13-15 (getSubstitutionMatrix / calculate_similarity /
    similarityNW): exact BLOSUM62 affine-gap Needleman-Wunsch similarity
    for every LSH-candidate isolate pair — the candidate-pair rescorer
    (NEVER all-pairs; the reference's similarityNW loops O(n^2),
    src/pairwiseSeqAlign.cpp:331-365).  The substitution matrix is
    resolved ONCE per actor (NWRescorer.__init__ — the HashFamily-shaped
    stateful stage).  Returns (a, b, nw_similarity) rounded to 4dp."""
    from dynaalign_ray.pipelines.neardup import near_dedup
    from dynaalign_ray.pipelines.relational import round4
    from dynaalign_ray.stages.nw import NWRescorer

    docs, _ = _isolate_docs(num_partitions)
    res = near_dedup(
        docs_ds=docs, cfg=DedupConfig(**_CFG), num_partitions=num_partitions
    )
    pairs = _edges_with_texts(docs, res.edges, num_partitions)
    scored = pairs.map_batches(
        NWRescorer, batch_format="pyarrow", concurrency=2
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": b.column("a"),
                "b": b.column("b"),
                "nw_similarity": round4(
                    np.asarray(b.column("nw_similarity"))
                ),
            }
        )

    return scored.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def peptide_clusterbreak(sf_dir: str, num_partitions: int = 4):
    """Operator #18 (clusterbreak): the recursive size controller over the
    isolate near-dup graph — oversized components are re-split at the
    per-component thresh_p quantile, emitted clusters carry the
    reference's "<round>.<cid>" labels (R/clusterbreak.R:234), members of
    clusters below size_min land in the filtered set (returned here as
    cluster_label='filtered', round=0 rows so every isolate appears
    exactly once)."""
    from dynaalign_ray.pipelines.clusterbreak import cluster_break

    docs, _ = _isolate_docs(num_partitions)
    res = cluster_break(
        docs_ds=docs,
        cfg=DedupConfig(**_CFG),
        size_max=40,
        size_min=2,
        thresh_p=0.8,
        max_rounds=5,
        num_partitions=num_partitions,
    )
    clustered = res.clustered.select_columns(
        ["doc_id", "cluster_id", "cluster_label", "round"]
    )

    def as_filtered(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "cluster_id": pa.array(
                    np.asarray(b.column("doc_id")).astype(np.int64),
                    type=pa.int64(),
                ),
                "cluster_label": pa.array(["filtered"] * n, pa.string()),
                "round": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    return clustered.union(
        res.filtered.map_batches(
            as_filtered, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def peptide_consensus(sf_dir: str, num_partitions: int = 4):
    """Operator #19 (clusterconsensus): per emitted cluster, the
    center-star NW-anchored consensus sequence (the scale-shaped analog of
    DECIPHER::AlignSeqs -> ConsensusSequence, R/clusterbreak.R:309-320) —
    one map_groups reduce per cluster, sizes bounded by the clusterbreak
    size controller.  Returns (cluster_id, consensus, representative_doc,
    n_members)."""
    from dynaalign_ray.pipelines.clusterbreak import cluster_break
    from dynaalign_ray.stages.consensus import (
        cluster_consensus,
        make_center_star_consensus,
    )

    docs, _ = _isolate_docs(num_partitions)
    res = cluster_break(
        docs_ds=docs,
        cfg=DedupConfig(**_CFG),
        size_max=40,
        size_min=2,
        thresh_p=0.8,
        max_rounds=5,
        num_partitions=num_partitions,
    )
    return cluster_consensus(
        res.clustered.select_columns(["doc_id", "cluster_id"]),
        docs,
        num_partitions,
        consensus_fn=make_center_star_consensus(matrix_name="BLOSUM62"),
        min_members=2,
    )


def peptide_consensus_msa(sf_dir: str, num_partitions: int = 4):
    """Operator #19, full-MSA form: the same clusterbreak -> consensus
    pipeline as peptide_consensus but with the REAL progressive aligner
    (stages/msa.progressive_msa: UPGMA guide tree + profile-profile
    affine-gap NW — the faithful analog of DECIPHER::AlignSeqs ->
    ConsensusSequence, R/clusterbreak.R:313-318; insertions relative to
    any single member ARE representable, unlike center-star)."""
    from dynaalign_ray.pipelines.clusterbreak import cluster_break
    from dynaalign_ray.stages.consensus import cluster_consensus
    from dynaalign_ray.stages.msa import make_progressive_msa_consensus

    docs, _ = _isolate_docs(num_partitions)
    res = cluster_break(
        docs_ds=docs,
        cfg=DedupConfig(**_CFG),
        size_max=40,
        size_min=2,
        thresh_p=0.8,
        max_rounds=5,
        num_partitions=num_partitions,
    )
    return cluster_consensus(
        res.clustered.select_columns(["doc_id", "cluster_id"]),
        docs,
        num_partitions,
        consensus_fn=make_progressive_msa_consensus(matrix_name="BLOSUM62"),
        min_members=2,
    )


def peptide_louvain(sf_dir: str, num_partitions: int = 4):
    """Operators #16-17 (louvain_mod / netcluster): the flagship pipeline
    with the REAL Louvain community-detection backend injected through the
    cluster_backend hook (the reference's pluggable cluster_fn,
    R/clusterbreak.R:185-188), resolution grid 1.05 +/- 10% step 0.05.
    Returns (doc_id, cluster_id) with cluster_id = min doc_id per
    community (permutation-invariant labels)."""
    from dynaalign_ray.pipelines.neardup import near_dedup
    from dynaalign_ray.stages.louvain import make_louvain_backend

    docs, _ = _isolate_docs(num_partitions)
    res = near_dedup(
        docs_ds=docs,
        cfg=DedupConfig(**_CFG),
        num_partitions=num_partitions,
        cluster_backend=make_louvain_backend(
            resolution=1.05, res_range_perc=0.1, res_step=0.05
        ),
    )
    return res.clusters
