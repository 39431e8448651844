"""Schema-evolution reader: union-by-name alignment, integer/float
widening, null-fill for missing columns, and loud failure on
incompatible types."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dynaalign_ray.sources.io import evolved_schema, read_parquet_evolved


def _write(path, table):
    pq.write_table(table, path)
    return str(path)


class TestEvolvedSchema:
    def test_union_by_name_and_widening(self, tmp_path):
        a = _write(
            tmp_path / "a.parquet",
            pa.table(
                {
                    "id": pa.array([1, 2], pa.int32()),
                    "score": pa.array([0.5, 1.5], pa.float32()),
                }
            ),
        )
        b = _write(
            tmp_path / "b.parquet",
            pa.table(
                {
                    "id": pa.array([3], pa.int64()),
                    "lang": pa.array(["en"]),
                }
            ),
        )
        s = evolved_schema([a, b])
        assert s.field("id").type == pa.int64()
        assert s.field("score").type == pa.float32()
        assert s.field("lang").type == pa.string()
        assert s.names == ["id", "score", "lang"]  # first-seen order

    def test_int_promotes_to_float(self, tmp_path):
        a = _write(tmp_path / "a.parquet", pa.table({"x": pa.array([1], pa.int64())}))
        b = _write(
            tmp_path / "b.parquet", pa.table({"x": pa.array([1.5], pa.float64())})
        )
        assert evolved_schema([a, b]).field("x").type == pa.float64()

    def test_int64_plus_float32_promotes_to_float64(self, tmp_path):
        # a narrow float must not win over a wide int: int64 values
        # outside float32's 2^24 mantissa would fail the align cast
        big = 1 << 40
        a = _write(
            tmp_path / "a.parquet", pa.table({"x": pa.array([big], pa.int64())})
        )
        b = _write(
            tmp_path / "b.parquet", pa.table({"x": pa.array([1.5], pa.float32())})
        )
        assert evolved_schema([a, b]).field("x").type == pa.float64()
        assert evolved_schema([b, a]).field("x").type == pa.float64()

    def test_incompatible_types_raise(self, tmp_path):
        a = _write(tmp_path / "a.parquet", pa.table({"x": pa.array([1], pa.int64())}))
        b = _write(tmp_path / "b.parquet", pa.table({"x": pa.array(["s"])}))
        with pytest.raises(ValueError, match="cannot unify"):
            evolved_schema([a, b])


class TestEvolvedRead:
    def test_aligned_union(self, ray_session, tmp_path):
        a = _write(
            tmp_path / "a.parquet",
            pa.table(
                {
                    "id": pa.array([1, 2], pa.int32()),
                    "score": pa.array([0.5, 1.5], pa.float32()),
                }
            ),
        )
        b = _write(
            tmp_path / "b.parquet",
            pa.table(
                {
                    "id": pa.array([3], pa.int64()),
                    "lang": pa.array(["en"]),
                }
            ),
        )
        df = (
            read_parquet_evolved([a, b])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert list(df["id"]) == [1, 2, 3]
        assert df["score"].tolist()[:2] == [0.5, 1.5]
        assert np.isnan(df["score"][2])
        assert df["lang"].tolist()[:2] == [None, None]
        assert df["lang"][2] == "en"

    def test_column_pruning(self, ray_session, tmp_path):
        a = _write(
            tmp_path / "a.parquet",
            pa.table({"id": pa.array([1], pa.int32()), "x": pa.array([9], pa.int64())}),
        )
        b = _write(tmp_path / "b.parquet", pa.table({"id": pa.array([2], pa.int64())}))
        ds = read_parquet_evolved([a, b], columns=["id"])
        t = ds.to_pandas()
        assert list(t.columns) == ["id"]
        assert sorted(t["id"]) == [1, 2]
