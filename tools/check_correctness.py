"""Local replica of the driver's correctness gate.

Runs every oracle-backed query from the registry in Spark AND DuckDB at the
given sf dir, compares row count, column names, and order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from ingestion3_spark.plans.queries import ORACLES, QUERIES  # noqa: E402
from ingestion3_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # the DRIVER's pandas canonicalizer cannot sort/hash list cells
            # (round-2 string_normalize_kernels red) — treat complex output
            # columns as failures here even though norm_cell tolerates them
            hostile = [
                f.name for f in sdf.schema.fields
                if f.dataType.simpleString().startswith(("array", "map", "struct"))
            ]
            if hostile:
                failures.append(name)
                print(f"FAIL {name}: driver-hostile complex columns {hostile}")
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok~  {name}: rows={len(srows)} (no oracle; rows-only)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        _, sn = norm_rows(scols, srows)
        _, dn = norm_rows(dcols, drows)
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(dn)}")
            continue
        if sn != dn:
            failures.append(name)
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            continue
        print(f"ok   {name}: rows={len(sn)}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
