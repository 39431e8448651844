"""hash_join / broadcast_join semantics, including the empty/sparse
partition cases that break ray.data.Dataset.join."""

import pyarrow as pa
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


def _tbl_left(rows=None):
    rows = rows if rows is not None else [(1, "x"), (2, "y"), (3, "z")]
    return pa.table(
        {"k": pa.array([r[0] for r in rows], pa.int64()),
         "lv": pa.array([r[1] for r in rows], pa.string())}
    )


def _tbl_right(rows=None):
    rows = rows if rows is not None else [(2, 20.0), (3, 30.0), (4, 40.0)]
    return pa.table(
        {"rk": pa.array([r[0] for r in rows], pa.int64()),
         "rv": pa.array([r[1] for r in rows], pa.float64())}
    )


LS = pa.schema([("k", pa.int64()), ("lv", pa.string())])
RS = pa.schema([("rk", pa.int64()), ("rv", pa.float64())])


class TestHashJoin:
    def test_inner(self, rd):
        from dynaalign_ray.joins import hash_join

        out = hash_join(
            rd.from_arrow(_tbl_left()), rd.from_arrow(_tbl_right()),
            left_on="k", right_on="rk", left_schema=LS, right_schema=RS,
            num_partitions=3,
        )
        rows = sorted((r["k"], r["lv"], r["rv"]) for r in out.take_all())
        assert rows == [(2, "y", 20.0), (3, "z", 30.0)]

    def test_left_outer(self, rd):
        from dynaalign_ray.joins import hash_join

        out = hash_join(
            rd.from_arrow(_tbl_left()), rd.from_arrow(_tbl_right()),
            left_on="k", right_on="rk", left_schema=LS, right_schema=RS,
            num_partitions=3, how="left outer",
        )
        rows = sorted((r["k"], r["rv"]) for r in out.take_all())
        assert rows == [(1, None), (2, 20.0), (3, 30.0)]

    def test_sparse_partitions(self, rd):
        # one left row, many partitions: most partitions see zero left rows
        from dynaalign_ray.joins import hash_join

        out = hash_join(
            rd.from_arrow(_tbl_left([(2, "only")])), rd.from_arrow(_tbl_right()),
            left_on="k", right_on="rk", left_schema=LS, right_schema=RS,
            num_partitions=8,
        )
        assert [(r["k"], r["rv"]) for r in out.take_all()] == [(2, 20.0)]

    def test_empty_left(self, rd):
        from dynaalign_ray.joins import hash_join

        out = hash_join(
            rd.from_arrow(_tbl_left([])), rd.from_arrow(_tbl_right()),
            left_on="k", right_on="rk", left_schema=LS, right_schema=RS,
            num_partitions=4,
        )
        assert out.count() == 0

    def test_overlapping_columns_rejected(self, rd):
        from dynaalign_ray.joins import hash_join

        with pytest.raises(ValueError, match="overlapping"):
            hash_join(
                rd.from_arrow(_tbl_left()), rd.from_arrow(_tbl_left()),
                left_on="k", right_on="k", left_schema=LS, right_schema=LS,
                num_partitions=2,
            )


class TestBroadcastJoin:
    def test_inner(self, rd):
        from dynaalign_ray.joins import broadcast_join

        out = broadcast_join(
            rd.from_arrow(_tbl_left()), _tbl_right(), left_on="k", right_on="rk"
        )
        rows = sorted((r["k"], r["rv"]) for r in out.take_all())
        assert rows == [(2, 20.0), (3, 30.0)]


class TestSemiAntiJoin:
    def test_semi_and_anti(self, rd):
        from dynaalign_ray.joins import broadcast_semi_join

        left = rd.from_arrow(_tbl_left())  # keys 1,2,3
        semi = broadcast_semi_join(left, [2, 3, 99], left_on="k")
        assert sorted(r["k"] for r in semi.take_all()) == [2, 3]
        anti = broadcast_semi_join(left, [2, 3, 99], left_on="k", anti=True)
        assert sorted(r["k"] for r in anti.take_all()) == [1]
        none = broadcast_semi_join(left, [], left_on="k")
        assert none.count() == 0
        all_ = broadcast_semi_join(left, [], left_on="k", anti=True)
        assert all_.count() == 3
