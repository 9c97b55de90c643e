"""Dtype-affinity guard for every driver-gate oracle.

Two rounds were lost to driver-canonicalizer type coercion the local gate
didn't model (r2: unhashable list cells; r3: DuckDB HUGEINT -> pandas
float64 while Spark emits int64, breaking the value hash). This test makes
the class impossible: every oracle's DuckDB output schema must consist of
types the driver's pandas canonicalizer maps 1:1 onto Spark's — so a bare
``SUM(BIGINT)`` (HUGEINT in DuckDB) or a DECIMAL/LIST output column fails
here, in pytest, before it ever reaches a CORRECTNESS_r{N} row.
"""

from __future__ import annotations

import duckdb
import pytest

from ingestion3_spark.plans.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB column types whose pandas rendering matches Spark's toPandas for
# the same logical value: 64-bit ints, doubles, strings, bools, timestamps.
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
           "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP_NS"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


ORACLE_NAMES = sorted(ORACLES)


def test_every_query_has_oracle_or_is_declared():
    # names with no oracle take the driver's weaker rows-only check; keep
    # the list explicit so a silently-dropped oracle is a test failure
    no_oracle = sorted(set(QUERIES) - set(ORACLES))
    assert no_oracle == [], f"unexpected oracle-less entries: {no_oracle}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_output_types_driver_safe(duck, name):
    sql = ORACLES[name]
    rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if typ.upper() not in ALLOWED
    ]
    assert not bad, (
        f"{name}: driver-hostile DuckDB output types {bad} — HUGEINT/DECIMAL "
        f"render as float64 in pandas and break the value hash; wrap with "
        f"CAST(... AS BIGINT/DOUBLE)"
    )
