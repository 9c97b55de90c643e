"""Interleaved A/B sampling for Part-A headline queries (drift-robust).

Same idea as tools/ab_replay.py but at query granularity: this host's
effective CPU speed drifts 2-7x over minutes, so comparing two single
samples of a 3-second query (today's run vs last round's number) is a
lottery. Here every (query, config) cell is sampled once per round,
round-robin inside ONE JVM, so a throttle episode hits all cells of that
round equally; the per-cell MIN estimates the unthrottled time (throttle
only adds time) and the median + raw samples stay disclosed.

Usage:
  python tools/ab_queries.py <cores> <sf_dir> <rounds> <q1,q2,...> \
      ["<envA>"] ["<envB>" ...]

With no env specs it benchmarks the named queries as-is (regression
pinning: run before and after a change, compare per-query min). With 2+
specs it becomes a config A/B: each spec is a space-separated K=V list;
keys starting with ``sql:`` are set via spark.conf for the duration of
that cell, everything else via os.environ.

Prints one JSON line: {query: {spec: {min, median, all}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingestion3_spark.session import get_spark  # noqa: E402


def main() -> int:
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2]
    rounds = int(sys.argv[3])
    names = [q.strip() for q in sys.argv[4].split(",") if q.strip()]
    specs = sys.argv[5:] or [""]

    from ingestion3_spark.plans.queries import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("ab-queries", cores=cores, shuffle_partitions=cores)

    def apply(spec: str) -> dict:
        old: dict = {}
        for kv in spec.split():
            k, v = kv.split("=", 1)
            if k.startswith("sql:"):
                k2 = k[4:]
                old[k] = spark.conf.get(k2, None)
                spark.conf.set(k2, v)
            else:
                old[k] = os.environ.get(k)
                os.environ[k] = v
        return old

    def revert(old: dict) -> None:
        for k, v in old.items():
            if k.startswith("sql:"):
                if v is None:
                    spark.conf.unset(k[4:])
                else:
                    spark.conf.set(k[4:], v)
            elif v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # sketch queries persist narrow intermediates for their self-joins;
        # release them so the next cell is not charged for leaked storage
        spark.catalog.clearCache()
        return dt

    # warmup: absorb session-level one-time costs (codegen, python worker
    # pool, parquet footers) under config A so round 0 is not polluted
    old = apply(specs[0])
    for name in names:
        run_one(name)
    revert(old)

    times: dict[str, dict[str, list[float]]] = {
        n: {s: [] for s in specs} for n in names
    }
    for r in range(rounds):
        for name in names:
            for s in specs:
                old = apply(s)
                dt = run_one(name)
                revert(old)
                times[name][s].append(dt)
                print(f"[ab] round={r} q={name} cfg={s!r} {dt:.2f}s", flush=True)
    out = {
        n: {
            s: {
                "min": round(min(ts), 3),
                "median": round(statistics.median(ts), 3),
                "all": [round(t, 3) for t in ts],
            }
            for s, ts in per.items()
        }
        for n, per in times.items()
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
