"""Driver-gate regression: the round-3 gate entries vs their DuckDB oracles.

The full 51-entry sweep lives in tools/check_correctness.py; this pins the
entries whose Spark side drives ENGINE machinery (replay, schema evolution,
MOR reconciliation, snapshot time travel, file-format round-trips) so a
behavioral regression fails fast in pytest instead of first appearing on
the driver's correctness board.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ingestion3_spark.plans.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

ENTRIES = [
    "schema_evolution_replay",
    "mor_replay_state",
    "snapshot_discovery",
    "csv_log_roundtrip",
    "doc_exact_dups",
    "multimodal_features",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


@pytest.mark.parametrize("name", ENTRIES)
def test_gate_entry_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    # the driver's canonicalizer cannot hash complex cells — every gate
    # entry must emit scalars only (the round-2 kernel-sweep red)
    hostile = [
        f.name for f in sdf.schema.fields
        if f.dataType.simpleString().startswith(("array", "map", "struct"))
    ]
    assert not hostile, f"driver-hostile columns {hostile}"
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols)
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    snorm = sorted([tuple(_norm(r[i]) for i in sorder) for r in srows], key=repr)
    dnorm = sorted([tuple(_norm(r[i]) for i in dorder) for r in drows], key=repr)
    assert snorm == dnorm
