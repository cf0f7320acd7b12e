"""Mimic the driver's correctness gate: run every ``queries()`` entry on
sf0.001 and compare to its ``oracle_sql()`` twin via DuckDB (row count +
column names + order-insensitive values)."""

import glob

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{SF_DIR}/*.parquet")):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"create view {name} as select * from read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # unify resolution too: Spark arrives as ns, DuckDB as us —
            # identical instants otherwise compare as different epochs
            df[c] = (pd.to_datetime(df[c]).dt.tz_localize(None)
                     .astype("datetime64[us]"))
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def _dtype_kind(s: pd.Series) -> str:
    """Collapse dtypes the way the driver's typed hasher sees them: every
    integer width is one family, but int-vs-float is a mismatch (DuckDB
    HUGEINT surfaces as float64 and fails the driver's hash even when the
    values are identical — the r1 a2/w1/a3 bug)."""
    k = s.dtype.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "m": "timedelta"}.get(k, "object")


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count"
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: columns"
    for c in spark_pdf.columns:
        sk, dk = _dtype_kind(spark_pdf[c]), _dtype_kind(duck_pdf[c])
        assert sk == dk, (
            f"{name}.{c}: typed-hash mismatch — spark {spark_pdf[c].dtype} ({sk}) "
            f"vs oracle {duck_pdf[c].dtype} ({dk}); CAST the oracle side"
        )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=1e-5, atol=1e-8)


NO_ORACLE = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_driver_window_policy_invariants():
    """SURVEY §8 rotation policy, pinned: the driver hashes only the
    first 50 queries() entries — those must be exactly _DRIVER_WINDOW
    (no dupes, all oracled, pinned head intact)."""
    qs = list(entry_mod.queries())
    win = entry_mod._DRIVER_WINDOW
    assert len(win) == 50 and len(set(win)) == 50
    assert qs[:50] == win
    osql = entry_mod.oracle_sql()
    assert all(name in osql for name in win)
    assert set(osql) == set(qs), "every query needs an oracle (r6+)"
    assert win[0] == "extract_documents_flagship"
