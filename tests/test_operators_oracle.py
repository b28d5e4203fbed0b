"""Local mirror of the driver's DuckDB-oracle comparison: row count, column
names, and order-insensitive value equality for every queries()/oracle_sql()
pair, at sf0.001 for speed (driver uses sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA

SF_DIR = str(TESTDATA / "sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, value-normalized, row-sorted frame for comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float).round(6).map(lambda v: f"{v:.6f}")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64").astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    ddf = ddb.execute(entrymod.oracle_sql()[name]).df()
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    a, b = _canon(sdf), _canon(ddf)
    if not a.equals(b):
        diff = pd.concat([a, b]).drop_duplicates(keep=False)
        raise AssertionError(f"{name}: value mismatch; sample diff:\n{diff.head(10)}")


def test_rows_only_entries(spark):
    """rows-only entries must still survive the driver's pandas canonicalizer
    (sort_values over all columns — r1's er_full_cascade died there on an
    unhashable array column)."""
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        pdf = qs[name](spark, SF_DIR).toPandas()
        assert len(pdf.columns) > 0
        _canon(pdf)  # raises on unhashable/unsortable column types


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
