"""Pinned-golden oracle infrastructure (dynaalign_ray/goldens.py): the
JSON is well-formed, every emitted VALUES SQL runs in DuckDB with the
pinned row count / column names, doubles round-trip bit-exactly, and one
live query (sf-independent peptide Louvain) still matches its golden."""

import json
import os

import duckdb
import numpy as np
import pandas as pd

from dynaalign_ray.goldens import _JSON_PATH, golden_names, golden_sql


class TestGoldenSql:
    def test_all_goldens_execute_with_pinned_shape(self):
        with open(_JSON_PATH) as f:
            data = json.load(f)
        con = duckdb.connect()
        assert len(golden_names()) >= 20
        for name in golden_names():
            meta = data["tables"][name]
            df = con.execute(golden_sql(name)).df()
            assert len(df) == len(meta["rows"]), name
            assert list(df.columns) == meta["columns"], name

    def test_doubles_round_trip_bit_exact(self):
        """Every pinned DOUBLE comes back from DuckDB with identical bits
        (the e0-suffix guard against DECIMAL-literal parsing)."""
        with open(_JSON_PATH) as f:
            data = json.load(f)
        con = duckdb.connect()
        checked = 0
        for name in golden_names():
            meta = data["tables"][name]
            dbl_cols = [
                i for i, t in enumerate(meta["types"]) if t == "DOUBLE"
            ]
            if not dbl_cols:
                continue
            df = con.execute(golden_sql(name)).df()
            # goldens store rows in run order; SQL returns VALUES order
            for i in dbl_cols:
                col = meta["columns"][i]
                want = np.array([r[i] for r in meta["rows"]], dtype=np.float64)
                got = df[col].to_numpy()
                assert np.array_equal(
                    want.view(np.int64), got.view(np.int64)
                ), f"{name}.{col} double bits differ"
                checked += 1
        assert checked >= 3

    def test_peptide_louvain_matches_golden_live(self, ray_session):
        """The sf-independent peptide Louvain query still reproduces its
        pinned golden byte-for-byte (determinism + regression seal)."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __ray_entry__ as entrymod

        got = (
            entrymod.queries()["peptide_louvain"]("/unused")
            .to_pandas()
            .sort_values(["doc_id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        want = (
            con.execute(golden_sql("peptide_louvain"))
            .df()
            .sort_values(["doc_id"])
            .reset_index(drop=True)
        )
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
