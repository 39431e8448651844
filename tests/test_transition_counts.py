"""Tests for the Markov-transition window kernel (stages/windows.py:
transition_count_block / user_transition_counts) and the session-4
TPC-H-shape queries' kernels-level edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from dynaalign_ray.stages.windows import transition_count_block


def _block(rows):
    eid, uid, ts, et = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(list(ts), type=pa.timestamp("us")),
            "event_type": pa.array(et, type=pa.string()),
        }
    )


def _counts(tbl):
    return {
        (p, c): n
        for p, c, n in zip(
            tbl.column("prev_type").to_pylist(),
            tbl.column("event_type").to_pylist(),
            tbl.column("n").to_pylist(),
        )
    }


def test_bigrams_within_user_only():
    # user 1: a->b->a ; user 2: b (no transition)
    out = transition_count_block(
        _block(
            [
                (1, 1, 10, "a"),
                (2, 1, 20, "b"),
                (3, 1, 30, "a"),
                (4, 2, 5, "b"),
            ]
        )
    )
    assert _counts(out) == {("a", "b"): 1, ("b", "a"): 1}


def test_order_is_ts_then_event_id():
    # equal timestamps: event_id breaks the tie, so the sequence is a,b,c
    out = transition_count_block(
        _block([(3, 1, 10, "c"), (1, 1, 10, "a"), (2, 1, 10, "b")])
    )
    assert _counts(out) == {("a", "b"): 1, ("b", "c"): 1}


def test_unordered_input_rows():
    rng = np.random.default_rng(7)
    rows = []
    for u in range(5):
        for i in range(20):
            rows.append((u * 100 + i, u, i * 1000, "t%d" % (i % 3)))
    perm = rng.permutation(len(rows))
    shuffled = [rows[i] for i in perm]
    a = _counts(transition_count_block(_block(rows)))
    b = _counts(transition_count_block(_block(shuffled)))
    assert a == b
    # each user contributes 19 transitions
    assert sum(a.values()) == 5 * 19


def test_empty_and_singletons():
    empty = transition_count_block(_block([(1, 1, 1, "a")]).slice(0, 0))
    assert empty.num_rows == 0
    assert empty.schema.names == ["prev_type", "event_type", "n"]
    single = transition_count_block(
        _block([(1, 1, 1, "a"), (2, 2, 1, "b"), (3, 3, 1, "c")])
    )
    assert single.num_rows == 0


def test_partial_aggregation_bound():
    # 1000 events over 2 types -> at most 4 output rows from the block
    rows = [(i, 1, i, "x" if i % 2 else "y") for i in range(1000)]
    out = transition_count_block(_block(rows))
    assert out.num_rows <= 4
    assert sum(out.column("n").to_pylist()) == 999


@pytest.mark.usefixtures("ray_session")
def test_user_transition_counts_multiblock(tmp_path):
    """The keyed repartition must make per-block bigram counting globally
    exact: compare a 7-partition run against the single-block kernel on
    the same rows."""
    import ray.data as rd

    from dynaalign_ray.stages.windows import user_transition_counts

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "user_id": pa.array(rng.integers(0, 97, n), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 10**9, n), type=pa.timestamp("us")),
            "event_type": pa.array(
                np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)],
                type=pa.string(),
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(13)
    got = user_transition_counts(ds, num_partitions=7).to_pandas()
    want = transition_count_block(tbl).to_pandas()
    got = got.sort_values(["prev_type", "event_type"]).reset_index(drop=True)
    want = want.sort_values(["prev_type", "event_type"]).reset_index(drop=True)
    assert list(got["prev_type"]) == list(want["prev_type"])
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n_transitions"]) == list(want["n"])
