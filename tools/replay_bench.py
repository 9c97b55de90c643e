"""Single CDC replay benchmark run at a given core count (subprocess unit).

Usage: python tools/replay_bench.py <cores> <events_parquet> <n_base_docs> \
           <num_batches> <work_dir>
Prints one JSON line: {"cores": N, "events": E, "seconds": s, "events_per_sec": t}

Run in its own process so each parallelism level gets a fresh JVM (the
sandbox evidence protocol for the two-cluster-size scaling criterion —
see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingestion3_spark.cdc.generator import make_corpus  # noqa: E402
from ingestion3_spark.cdc.replay import ReplayEngine  # noqa: E402
from ingestion3_spark.session import get_spark  # noqa: E402


def main() -> int:
    cores = int(sys.argv[1])
    events_path = sys.argv[2]
    n_base = int(sys.argv[3])
    num_batches = int(sys.argv[4])
    work = sys.argv[5]

    spark = get_spark(f"replay-bench-{cores}", cores=cores, shuffle_partitions=max(cores, 8))

    table_path = os.path.join(work, f"corpus_{cores}")
    err_dir = os.path.join(work, f"err_{cores}")
    shutil.rmtree(table_path, ignore_errors=True)
    shutil.rmtree(err_dir, ignore_errors=True)

    table = ReplayEngine.create_table(spark, table_path, num_buckets=64)
    if n_base:
        import pyarrow.parquet as pq

        base_pq = os.path.join(work, f"base_{n_base}.parquet")
        if not os.path.exists(base_pq):
            pq.write_table(make_corpus(n_base, seed=42, max_len=128), base_pq)
        files = table.write_files(spark.read.parquet(base_pq))
        table.commit("append", add_files=files)

    events = spark.read.parquet(events_path)
    n_events = events.count()

    eng = ReplayEngine(spark, table, error_dir=err_dir)
    t0 = time.perf_counter()
    eng.replay(events, num_batches=num_batches)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "cores": cores,
        "events": n_events,
        "seconds": round(dt, 3),
        "events_per_sec": round(n_events / dt, 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
