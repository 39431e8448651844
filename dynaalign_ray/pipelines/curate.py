"""End-to-end corpus curation — the composed LLM-training-data funnel:

    pages/docs -> quality + language filter (one fused actor pass)
               -> exact dedup (content-hash groupby, keep min-id rep)
               -> near dedup (flagship MinHash-LSH, keep cluster rep)
               -> kept docs + per-stage funnel report

This is the "switch from the reference" entry point for a data-curation
user: one call owns the whole funnel, each stage is the already-oracle-
checked operator, and the intermediate keep-sets travel as broadcast id
sets (no shuffle) below a size gate and as hash joins above it.

Design notes (100 TB posture):
- the filter pass is ONE actor-pool map_batches (patterns compiled in
  ``__init__``), emitting only surviving rows — wide text columns of
  dropped docs never reach the object store;
- keep-sets are int64 id arrays: broadcast via ``ray.put`` below
  ``broadcast_id_limit`` (50M ids = 400 MB, one zero-copy replica per
  node), ``joins.hash_join`` past it;
- each funnel count comes from the stage's materialized output — no extra
  passes over text.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from dynaalign_ray.config import DedupConfig


@dataclass
class CurationResult:
    kept: Any  # Dataset of surviving docs (doc_id, text, ...)
    clusters: Any  # near-dup clusters table of the exact-dedup survivors
    funnel: dict = field(default_factory=dict)  # stage -> surviving row count


class CurationFilter:
    """Fused quality + language filter (actor pool: language marker regexes
    compile once per actor).  Emits only surviving rows."""

    def __init__(self, min_quality: float, allowed_langs, min_tokens: int):
        from dynaalign_ray.functions.textstats import LangIdActor

        self.min_quality = float(min_quality)
        self.allowed = set(allowed_langs) if allowed_langs else None
        self.min_tokens = int(min_tokens)
        self.langid = LangIdActor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dynaalign_ray.functions.textstats import quality_score_batch

        if batch.num_rows == 0:
            return batch
        q = quality_score_batch(batch)
        keep = (
            np.asarray(q.column("quality_score")) >= self.min_quality
        ) & (np.asarray(q.column("n_tokens")) >= self.min_tokens)
        if self.allowed is not None:
            import pyarrow.compute as pc

            langs = self.langid(batch).column("pred_lang")
            keep &= np.asarray(
                pc.is_in(langs, value_set=pa.array(sorted(self.allowed)))
            )
        return batch.filter(pa.array(keep))


_BROADCAST_ID_LIMIT = 50_000_000  # int64 keep-set ids broadcast below this


def _keep_only(ds, ids_ds, num_partitions: int, approx_ids: int | None):
    """Semi-join ``ds`` (on doc_id) against the id column of ``ids_ds`` —
    broadcast keyset below _BROADCAST_ID_LIMIT, hash join past it."""
    from dynaalign_ray.joins import broadcast_semi_join, hash_join

    if approx_ids is None or approx_ids <= _BROADCAST_ID_LIMIT:
        import ray

        parts = [
            np.asarray(t.column(0)).astype(np.int64)
            for t in (ray.get(r) for r in ids_ds.materialize().to_arrow_refs())
            if t.num_rows
        ]
        ids = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        # pass the ndarray straight through — tolist() would build millions
        # of Python ints only for the join to np.asarray them back
        return broadcast_semi_join(ds, ids, left_on="doc_id")
    ids_schema = pa.schema([("doc_id", pa.int64())])
    # schema of ds is (doc_id, text); the hash_join path needs it explicit
    ds_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    return hash_join(
        ds,
        ids_ds,
        left_on="doc_id",
        right_on="doc_id",
        left_schema=ds_schema,
        right_schema=ids_schema,
        num_partitions=num_partitions,
    )


def curate_corpus(
    pages_ds=None,
    docs_ds=None,
    cfg: DedupConfig = DedupConfig(),
    *,
    min_quality: float = 0.3,
    allowed_langs=("en",),
    min_tokens: int = 20,
    chunk_unit: str | None = None,
    chunk_words: int = 10,
    span_k: int | None = None,
    num_partitions: int | None = None,
    approx_rows: int | None = None,
    checkpoint_dir: str | None = None,
) -> CurationResult:
    """Run the full curation funnel; see module docstring.

    ``chunk_unit`` ("line" / "words"; the alias "lines" is normalised)
    inserts the CCNet-style chunk-level
    exact-dedup tier and ``span_k`` the ExactSubstr span-removal tier
    between exact and near dedup, completing the tiered chain
    doc-exact -> chunk -> byte-span -> MinHash-near: each tier rewrites
    ``text`` (duplicated units cut, first occurrence kept) and the funnel
    records what it removed (``chunks_removed`` / ``span_bytes_removed``).

    Returns kept docs (doc_id, text), the near-dup clusters table of the
    exact-dedup survivors, and the funnel counts per stage.  With
    ``checkpoint_dir`` the filter and exact-dedup outputs persist as
    per-stage Parquet + lineage (a rerun resumes past them; stage resume
    markers land in ``funnel["stages"]``), and the inner near-dup pipeline
    checkpoints its own stages under a subdirectory — the resume story a
    multi-day 100 TB curation run needs.
    """
    import os

    from dynaalign_ray.exec import configure_context, pick_num_partitions
    from dynaalign_ray.extract import extract_text_batch
    from dynaalign_ray.pipelines.neardup import near_dedup
    from dynaalign_ray.stages.dedup import exact_dedup_groups
    from dynaalign_ray.state.lineage import CheckpointContext

    configure_context()
    if (pages_ds is None) == (docs_ds is None):
        raise ValueError("provide exactly one of pages_ds / docs_ds")
    if chunk_unit == "lines":  # accept the documented plural alias
        chunk_unit = "line"
    P = num_partitions or pick_num_partitions(approx_rows)
    langs_token = ",".join(sorted(allowed_langs)) if allowed_langs else "*"
    tiers_token = f"cd{chunk_unit or '-'}:{chunk_words}|sd{span_k or '-'}"
    ckpt = CheckpointContext(
        checkpoint_dir,
        f"{cfg.config_hash()}|q{min_quality}|l={langs_token}|t{min_tokens}"
        f"|{tiers_token}|P{P}",
    )

    if docs_ds is None:
        docs_ds = pages_ds.map_batches(
            extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    docs_ds = docs_ds.select_columns(["doc_id", "text"])

    funnel: dict = {}

    # stage 1: fused quality + language filter (actor pool), then pin -
    # every later stage consumes this table
    filtered, fp1 = ckpt.run_stage(
        "filtered",
        "docs-input",
        lambda: docs_ds.map_batches(
            CurationFilter,
            fn_constructor_args=(min_quality, allowed_langs, min_tokens),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(2, max(2, P)),
        ),
    )
    if checkpoint_dir is None:
        filtered = filtered.materialize()
    funnel["after_quality_lang"] = filtered.count()

    # stage 2: exact dedup - the groupby's min-id column IS the keep set
    exact_kept, fp2 = ckpt.run_stage(
        "exact_kept",
        fp1,
        lambda: _keep_only(
            filtered,
            exact_dedup_groups(filtered, P).select_columns(["doc_id"]),
            P,
            approx_ids=funnel["after_quality_lang"],
        ),
    )
    if checkpoint_dir is None:
        exact_kept = exact_kept.materialize()
    funnel["after_exact_dedup"] = exact_kept.count()

    # optional mid-funnel tiers: each rewrites text in place (duplicated
    # units cut, lexicographic-first occurrence kept) before the near-dup
    # tier sees it — the tiered-dedup chain doc -> chunk -> span -> near
    def _clean_to_text(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("clean_text"),
            }
        )

    if chunk_unit is not None:
        from dynaalign_ray.stages.chunk_dedup import chunk_dedup

        cd, fp2 = ckpt.run_stage(
            "chunk_dedup",
            fp2,
            lambda: chunk_dedup(exact_kept, P, unit=chunk_unit, chunk_words=chunk_words),
        )
        if checkpoint_dir is None:
            cd = cd.materialize()
        funnel["chunks_removed"] = int(cd.sum("n_removed") or 0)
        exact_kept = cd.map_batches(
            _clean_to_text, batch_format="pyarrow", zero_copy_batch=True
        )

    if span_k is not None:
        from dynaalign_ray.stages.span_dedup import span_dedup

        sd, fp2 = ckpt.run_stage(
            "span_dedup", fp2, lambda: span_dedup(exact_kept, P, k=span_k)
        )
        if checkpoint_dir is None:
            sd = sd.materialize()
        funnel["span_bytes_removed"] = int(sd.sum("n_removed_bytes") or 0)
        exact_kept = sd.map_batches(
            _clean_to_text, batch_format="pyarrow", zero_copy_batch=True
        )

    # stage 3: near dedup - cluster reps (keep flag) survive.  The inner
    # pipeline owns its own checkpoint lineage under a subdirectory.
    res = near_dedup(
        docs_ds=exact_kept,
        cfg=cfg,
        num_partitions=P,
        approx_rows=funnel["after_exact_dedup"],
        checkpoint_dir=(
            os.path.join(checkpoint_dir, "neardup") if checkpoint_dir else None
        ),
    )

    def keep_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("keep")).select(["doc_id"])

    reps = res.clusters.map_batches(
        keep_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = _keep_only(
        exact_kept, reps, P, approx_ids=funnel["after_exact_dedup"]
    ).materialize()
    funnel["after_near_dedup"] = kept.count()

    if checkpoint_dir is not None:
        funnel["stages"] = ckpt.counters
    return CurationResult(kept=kept, clusters=res.clusters, funnel=funnel)
