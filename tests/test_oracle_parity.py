"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + column
names + exact values, order-insensitive)."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(by=list(df.columns))
            .reset_index(drop=True))


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_exactly_fifty_queries_all_oracled():
    # the driver verifies the FIRST 50 insertion-order keys (r2 lesson)
    assert len(QUERIES) == 50
    assert set(QUERIES) == set(ORACLES)


def test_no_query_emits_complex_typed_columns(spark):
    """The driver's canonicalizer pandas-sorts RAW column values before
    hashing; an array/map/struct output column crashes it (round-2
    doc_winnow_fingerprints: TypeError unhashable list).  Analysis-only
    — no query executes."""
    from pyspark.sql import types as T

    complex_types = (T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name, fn in QUERIES.items():
        for f in fn(spark, SF_DIR).schema.fields:
            if isinstance(f.dataType, complex_types):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, (
        f"scalar-ize these columns (concat_ws/explode) or the driver's "
        f"canonicalizer dies: {offenders}")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = duck.sql(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {spark_df.columns} vs {duck_df.columns}")
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}")
    a, b = _normalize(spark_df), _normalize(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True,
                                  obj=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert "extracted_text" in df.columns
