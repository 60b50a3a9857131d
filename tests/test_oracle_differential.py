"""Local replica of the driver's DuckDB oracle check (SURVEY §5.2).

For every queries() entry with an oracle_sql(): run both at sf0.01 (or
$SPARK_GRAFT_TEST_SF), sort columns by name, and compare row multisets
EXACTLY (floats included — the driver hashes values, so exact agreement
is the bar; every float column is rounded inside the queries
themselves).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_ORACLES = entry_mod.oracle_sql()
_QUERIES = entry_mod.queries()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean").astype("object")
        elif pd.api.types.is_integer_dtype(s) or s.dtype == "object" and all(
            isinstance(v, int) for v in s.dropna()
        ):
            # errors="ignore" is removed in pandas 3; the guard above
            # already ensures int-like values, so a failure keeps the
            # column as-is (the old "ignore" semantics, made explicit)
            try:
                df[c] = pd.to_numeric(s)
            except (ValueError, TypeError):
                pass
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    got = _normalize(_QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(_duck(_ORACLES[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = pd.to_numeric(g).to_numpy()
            wa = pd.to_numeric(w).to_numpy()
            import numpy as np

            exact = (
                np.array_equal(ga, wa)
                or np.nanmax(np.abs(ga - wa)) == 0.0
            )
            assert exact, (
                f"{name}.{c}: max float diff "
                f"{np.nanmax(np.abs(ga - wa))}"
            )
        else:
            mism = (g.astype(str) != w.astype(str)).sum()
            assert mism == 0, f"{name}.{c}: {mism} mismatched values"


def test_every_query_runs(spark):
    """rows-only smoke for queries without oracle (driver's weak check)."""
    no_oracle = set(_QUERIES) - set(_ORACLES)
    for name in sorted(no_oracle):
        df = _QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_query_runs(spark, name):
    """Driver fallback check for non-SQL-expressible entries: the query
    must run at sf and produce a stable schema with >= 0 rows."""
    df = _QUERIES[name](spark, SF_DIR)
    assert df.schema.fields, name
    assert df.count() >= 0, name


def test_extract_text_identity_on_driver_corpus():
    """pipeline_result_sql computes from raw `text`; that is valid only
    while extract_text(encode(text)) == text for the driver corpus —
    assert it for every sf directory (no Spark needed)."""
    import glob

    import duckdb

    from dqmtools_spark.functions.textproc import extract_text

    # always cover the directory the oracle gate actually runs on,
    # plus every local sf tier
    dirs = sorted({SF_DIR, *glob.glob("/root/testdata/sf*")})
    assert dirs, "no testdata directories found"
    for d in dirs:
        rows = duckdb.sql(f"SELECT text FROM '{d}/documents.parquet'").fetchall()
        assert rows
        for (t,) in rows:
            assert t is not None
            assert extract_text(t.encode("utf-8")) == t, f"{d}: not identity"
