"""Chunk-level exact dedup (CCNet paragraph-dedup analog): split kernels,
keep-first rule vs an independent pure-Python oracle, line mode, and the
Ray end-to-end path."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.stages.chunk_dedup import (
    _CHUNK_CAP,
    _split_chunks,
    chunk_dedup,
    chunk_dup_stats,
    explode_chunk_keys,
)


def _py_oracle(docs, unit, chunk_words):
    """Independent keep-first chunk dedup: dict keyed by chunk STRING (not
    hash), first (doc_id, chunk_no) in lexicographic order wins."""
    ex = []  # (doc_id, chunk_no, chunk)
    for doc_id, text in docs:
        if unit == "line":
            chunks = text.split("\n")
        else:
            words = text.split()
            chunks = [
                " ".join(words[i : i + chunk_words])
                for i in range(0, len(words), chunk_words)
            ]
        ex.extend((doc_id, i, c) for i, c in enumerate(chunks))
    first = {}
    for doc_id, cno, c in sorted(ex):
        first.setdefault(c, (doc_id, cno))
    out = {}
    joiner = "\n" if unit == "line" else " "
    for doc_id, text in docs:
        mine = sorted((cno, c) for d, cno, c in ex if d == doc_id)
        kept = [c for cno, c in mine if first[c] == (doc_id, cno)]
        removed = len(mine) - len(kept)
        out[doc_id] = (joiner.join(kept), len(mine), removed)
    return out


DOCS = [
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "totally different words here that repeat the quick brown fox jumps over"),
    (4, ""),
    (5, "the quick brown fox"),
]


class TestSplit:
    def test_word_chunks_and_numbering(self):
        texts = pa.array(["a b c d e", "  x  y "])
        chunks, parent, cno = _split_chunks(texts, unit="words", chunk_words=2)
        assert chunks.to_pylist() == ["a b", "c d", "e", "x y"]
        assert parent.tolist() == [0, 0, 0, 1]
        assert cno.tolist() == [0, 1, 2, 0]

    def test_line_mode(self):
        texts = pa.array(["l1\nl2\n\nl3", "only"])
        chunks, parent, cno = _split_chunks(texts, unit="line", chunk_words=0)
        assert chunks.to_pylist() == ["l1", "l2", "", "l3", "only"]
        assert cno.tolist() == [0, 1, 2, 3, 0]

    def test_empty_doc_yields_no_chunks(self):
        chunks, parent, cno = _split_chunks(
            pa.array(["", "a b"]), unit="words", chunk_words=2
        )
        assert chunks.to_pylist() == ["a b"]
        assert parent.tolist() == [1]

    def test_enc_guard(self):
        batch = pa.table(
            {"doc_id": pa.array([1 << 44], pa.int64()), "text": pa.array(["a"])}
        )
        with pytest.raises(ValueError, match="overflow"):
            explode_chunk_keys(batch, unit="words", chunk_words=1)


@pytest.mark.parametrize("unit,cw", [("words", 3), ("words", 4), ("line", 0)])
def test_dedup_matches_python_oracle(ray_session, unit, cw):
    import ray.data as rd

    docs = DOCS
    if unit == "line":
        docs = [
            (1, "dup line\nunique a\ndup line"),
            (2, "dup line\nunique b"),
            (3, "unique c"),
        ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(3)
    out = {
        r["doc_id"]: (r["clean_text"], r["n_chunks"], r["n_removed"])
        for r in chunk_dedup(ds, 4, unit=unit, chunk_words=cw).take_all()
    }
    assert out == _py_oracle(docs, unit, cw)


def test_dup_stats_first_doc(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS]),
            }
        )
    )
    rows = chunk_dup_stats(ds, 4, unit="words", chunk_words=4).take_all()
    got = {r["chunk"]: (r["n_occ"], r["first_doc"]) for r in rows}
    # "the quick brown fox" is a 4-word chunk at (1,0), (3,0) and (5,0)
    assert got["the quick brown fox"] == (3, 1)
    # every reported chunk occurs at least twice
    assert all(n >= 2 for n, _ in got.values())


def test_no_duplicates_is_identity(ray_session):
    import ray.data as rd

    docs = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    rows = chunk_dedup(ds, 2, unit="words", chunk_words=2).take_all()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["clean_text"] == "alpha beta gamma"
    assert all(r["n_removed"] == 0 for r in rows)
    assert chunk_dup_stats(ds, 2, unit="words", chunk_words=2).count() == 0
