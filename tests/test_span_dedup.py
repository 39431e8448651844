"""Exact long-match span removal (span_dedup) vs a string-keyed pure-Python
oracle: same keep-first rule, but keyed by the actual k-byte substring so
hash collisions / enc-key bugs / distribution bugs would all surface."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.stages.span_dedup import span_dedup, window_keys_batch


def _py_oracle(docs, k):
    """Byte removed iff covered by a duplicate window whose (doc_id, pos) is
    not the lexicographic-first occurrence of that exact substring."""
    occ = []
    for doc_id, text in docs:
        b = text.encode("utf-8")
        for p in range(len(b) - k + 1):
            occ.append((doc_id, p, bytes(b[p : p + k])))
    counts = Counter(s for _, _, s in occ)
    first = {}
    for doc_id, p, s in sorted(occ, key=lambda t: (t[0], t[1])):
        first.setdefault(s, (doc_id, p))
    out = {}
    for doc_id, text in docs:
        b = text.encode("utf-8")
        covered = np.zeros(len(b), dtype=bool)
        n_lose = 0
        for p in range(len(b) - k + 1):
            s = bytes(b[p : p + k])
            if counts[s] > 1 and first[s] != (doc_id, p):
                covered[p : p + k] = True
                n_lose += 1
        kept = bytes(np.frombuffer(b, dtype=np.uint8)[~covered].tobytes())
        out[doc_id] = (kept.decode("utf-8", errors="ignore"), int(covered.sum()), n_lose)
    return out


PARA = " ".join(f"boiler{i}plate{i * 7} word{i}" for i in range(16))  # ~300 chars, aperiodic
DOCS = [
    (1, "unique opening text. " + PARA + " unique tail one."),
    (2, "other document start " + PARA + " different ending two."),
    (3, "entirely unique document with no duplicated spans at all in it."),
    (4, "short"),
    (5, PARA),
]


def test_window_keys_shape():
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["abcdef", "ab"])}
    )
    t = window_keys_batch(batch, k=4)
    # doc 1: 3 windows; doc 2: too short -> none
    assert t.num_rows == 3
    assert t.column("enc").to_pylist() == [1 << 26, (1 << 26) + 1, (1 << 26) + 2]


def test_doc_id_guard():
    batch = pa.table(
        {"doc_id": pa.array([1 << 40], pa.int64()), "text": pa.array(["abcdef"])}
    )
    with pytest.raises(ValueError, match="overflow"):
        window_keys_batch(batch, k=4)


@pytest.mark.parametrize("k", [60, 100])
def test_matches_string_keyed_oracle(ray_session, k):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS]),
            }
        )
    ).repartition(3)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_bytes"], r["n_dup_windows"])
        for r in span_dedup(ds, 4, k=k).take_all()
    }
    assert got == _py_oracle(DOCS, k)
    # the first occurrence (doc 1) keeps its copy intact
    assert PARA in got[1][0]
    # later occurrences lose the span entirely
    assert PARA not in got[2][0] and PARA not in got[5][0]
    assert got[3][1] == 0 and got[4][1] == 0


def test_no_duplicates_identity(ray_session):
    import ray.data as rd

    docs = [(7, "alpha beta gamma delta"), (8, "epsilon zeta eta theta")]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    rows = span_dedup(ds, 2, k=10).take_all()
    assert {r["doc_id"]: r["clean_text"] for r in rows} == dict(docs)
    assert all(r["n_removed_bytes"] == 0 for r in rows)
