"""PII / repetition / decontamination operators — kernel-level known-answer
tests plus DuckDB parity on the real sf0.001 table (pre-validating the
driver's oracle SQL).  All tests here are driver-side kernel calls (the
batch fns take pa.Table directly) — no Ray session needed."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs_table() -> pa.Table:
    return pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------- PII


def _pii_fixture() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "contact me at jane.doe+spam@example.co.uk or bob@x.io today",
                    "server at 192.168.0.1 and 10.0.0.255 responded",
                    "call +1 (555) 123-4567 now",
                    "no personal data here at all",
                ]
            ),
        }
    )


def test_pii_counts_planted():
    from dynaalign_ray.functions.pii import pii_stats_batch

    out = pii_stats_batch(_pii_fixture())
    assert out.column("n_emails").to_pylist() == [2, 0, 0, 0]
    assert out.column("n_ips").to_pylist() == [0, 2, 0, 0]
    assert out.column("n_phones").to_pylist() == [0, 0, 1, 0]
    assert out.column("has_pii").to_pylist() == [True, True, True, False]


def test_pii_redact_planted():
    from dynaalign_ray.functions.pii import pii_redact_batch

    red = pii_redact_batch(_pii_fixture()).column("redacted").to_pylist()
    assert red[0] == "contact me at <EMAIL> or <EMAIL> today"
    assert red[1] == "server at <IP> and <IP> responded"
    assert "<PHONE>" in red[2] and "4567" not in red[2]
    assert red[3] == "no personal data here at all"


def test_pii_duckdb_parity_on_testdata():
    """Same pattern strings through Arrow RE2 vs DuckDB RE2 on real data."""
    from dynaalign_ray.functions.pii import (
        EMAIL_PATTERN,
        IPV4_PATTERN,
        PHONE_PATTERN,
        pii_stats_batch,
    )

    t = _docs_table()
    got = pii_stats_batch(t).sort_by("doc_id")
    want = duckdb.sql(
        f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{IPV4_PATTERN}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(text, '{PHONE_PATTERN}')) AS BIGINT) AS n_phones
        FROM t ORDER BY doc_id
        """
    ).arrow()
    for col in ["n_emails", "n_ips", "n_phones"]:
        assert got.column(col).to_pylist() == want.column(col).to_pylist(), col


def test_bpe_token_count_known_answer():
    from dynaalign_ray.functions.textstats import bpe_token_count_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["it's a test-case 42", ""]),
        }
    )
    # pieces: "it", "'s", " a", " test", "-", "case", " 42"
    assert bpe_token_count_batch(t).column("n_pieces").to_pylist() == [7, 0]


def test_bpe_token_count_duckdb_parity():
    from dynaalign_ray.functions.textstats import bpe_token_count_batch

    t = _docs_table()
    got = bpe_token_count_batch(t).sort_by("doc_id")
    want = duckdb.sql(
        """
        SELECT doc_id, CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
            AS BIGINT) AS n_pieces
        FROM t ORDER BY doc_id
        """
    ).arrow()
    assert got.column("n_pieces").to_pylist() == want.column("n_pieces").to_pylist()


# ---------------------------------------------------------- repetition


def test_repetition_known_answer():
    from dynaalign_ray.functions.repetition import repetition_stats_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a b", "x y z", ""]),
        }
    )
    out = repetition_stats_batch(t)
    assert out.column("n_tokens").to_pylist() == [3, 3, 0]
    assert out.column("n_distinct").to_pylist() == [2, 3, 0]
    assert out.column("dup_word_frac").to_pylist() == [1 / 3, 0.0, 0.0]
    assert out.column("top_word_frac").to_pylist() == [2 / 3, 1 / 3, 0.0]
    # 2-grams of doc0: "a a", "a b" -> top fraction 1/2; doc2 has none
    assert out.column("top_2gram_frac").to_pylist() == [0.5, 0.5, 0.0]


def test_repetition_duckdb_parity_on_testdata():
    from dynaalign_ray.functions.repetition import repetition_stats_batch

    t = _docs_table()
    got = repetition_stats_batch(t).sort_by("doc_id")
    want = duckdb.sql(
        """
        WITH s AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM t),
        wc AS (SELECT doc_id, w, count(*) AS c
               FROM (SELECT doc_id, unnest(toks) AS w FROM s) GROUP BY doc_id, w),
        wagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                        CAST(count(*) AS BIGINT) AS n_distinct,
                        CAST(max(c) AS BIGINT) AS maxc
                 FROM wc GROUP BY doc_id),
        grams AS (SELECT doc_id, unnest(list_transform(
                      generate_series(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1])) AS g
                  FROM s WHERE len(toks) >= 2),
        gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
        gagg AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS maxc2,
                        CAST(sum(c) AS BIGINT) AS total2 FROM gc GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(wagg.total, 0) AS n_tokens,
               COALESCE(wagg.n_distinct, 0) AS n_distinct,
               CASE WHEN wagg.total > 0
                    THEN (wagg.total - wagg.n_distinct) / CAST(wagg.total AS DOUBLE)
                    ELSE 0.0 END AS dup_word_frac,
               CASE WHEN wagg.total > 0
                    THEN wagg.maxc / CAST(wagg.total AS DOUBLE) ELSE 0.0 END AS top_word_frac,
               CASE WHEN gagg.total2 > 0
                    THEN gagg.maxc2 / CAST(gagg.total2 AS DOUBLE) ELSE 0.0 END AS top_2gram_frac
        FROM t d
        LEFT JOIN wagg ON wagg.doc_id = d.doc_id
        LEFT JOIN gagg ON gagg.doc_id = d.doc_id
        ORDER BY d.doc_id
        """
    ).arrow()
    for col in ["n_tokens", "n_distinct"]:
        assert got.column(col).to_pylist() == want.column(col).to_pylist(), col
    for col in ["dup_word_frac", "top_word_frac", "top_2gram_frac"]:
        np.testing.assert_array_equal(
            np.asarray(got.column(col)), np.asarray(want.column(col)), err_msg=col
        )


def test_repetition_batching_invariance():
    """Splitting the batch must not change per-doc stats (no cross-doc
    leakage through the flattened token array)."""
    from dynaalign_ray.functions.repetition import repetition_stats_batch

    t = _docs_table().slice(0, 60)
    whole = repetition_stats_batch(t)
    parts = pa.concat_tables(
        [repetition_stats_batch(t.slice(i, 7)) for i in range(0, 60, 7)]
    )
    assert whole.sort_by("doc_id").equals(parts.sort_by("doc_id"))


# ----------------------------------------------------------- decontam


def test_snippet_decontam_planted():
    from dynaalign_ray.functions.decontam import SnippetDecontamActor

    actor = SnippetDecontamActor(["needle one", "second marker"])
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "contains the needle one right here",
                    "has second marker and also needle one",
                    "totally clean document",
                ]
            ),
        }
    )
    out = actor(batch)
    assert out.column("n_hits").to_pylist() == [1, 2, 0]
    assert out.column("contaminated").to_pylist() == [True, True, False]


def test_ngram_decontam_planted():
    from dynaalign_ray.functions.decontam import NgramDecontamActor, build_ngram_set

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    ngrams = build_ngram_set(bench, n=4)
    actor = NgramDecontamActor(ngrams, n=4)
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    # shares the 5-word run "quick brown fox jumps over"
                    # -> two overlapping 4-grams
                    "then a quick brown fox jumps over everything else",
                    "completely different words in this one here",
                ]
            ),
        }
    )
    out = actor(batch)
    assert out.column("n_overlap").to_pylist() == [2, 0]
    assert out.column("overlap_frac").to_pylist()[1] == 0.0
    assert out.column("overlap_frac").to_pylist()[0] == pytest.approx(2 / 6)


def test_decontam_bench_snippets_deterministic():
    from dynaalign_ray.pipelines.curation import _bench_snippets

    a = _bench_snippets(SF_DIR)
    b = _bench_snippets(SF_DIR)
    assert a == b and len(a) == 20
    assert all(len(s) <= 120 for s in a)
