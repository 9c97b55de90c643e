"""Host parallel-ceiling measurement for the replay workload class.

Usage: python tools/ceiling_bench.py <cores> <events_parquet> <work_dir>
Prints one JSON line: {"cores": N, "seconds": s}

Rationale (BENCH.md "two-cluster-size evidence" protocol): the north rule
compares N vs 4N *executors* — on a real cluster 4x executors bring 4x
cores AND 4x memory bandwidth. This sandbox evidences the criterion with
thread-parallelism on ONE box, where 8->32 threads deliver ~3.1x CPU
capacity (spin envelope) but only ~1.2x memory bandwidth (measured memcpy
envelope): the memory system saturates near 8 streams. A CDC replay moves
GBs through scan/shuffle/write, so its thread-scaling ceiling on this host
sits well below 4x REGARDLESS of engine quality.

This job measures that ceiling directly: the SAME columnar input, the SAME
validation expressions, the SAME parquet write volume — but embarrassingly
parallel by construction (no shuffle, no joins, no driver coordination
beyond one action). Its N->4N speedup is what "perfect scaling" looks like
for this byte/instruction mix on this host; the replay's normalized
efficiency = replay_speedup / ceiling_speedup attributes to the ENGINE
only what the engine could actually control. The ceiling job contains no
engine logic (no dedup, merge, classify, or commit), so the normalization
is not circular.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ingestion3_spark.cdc import validate as val  # noqa: E402
from ingestion3_spark.session import get_spark  # noqa: E402


def main() -> int:
    cores = int(sys.argv[1])
    events_path = sys.argv[2]
    work = sys.argv[3]
    out = os.path.join(work, f"ceiling_{cores}")
    spark = get_spark(
        f"ceiling-{cores}",
        cores=cores,
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.local.dir": os.path.join(work, "spark-local"),
            "spark.sql.parquet.compression.codec": os.environ.get(
                "I3S_PARQUET_CODEC", "uncompressed"
            ),
        },
    )
    df = spark.read.parquet(events_path)
    plan = val.validate_events(df).filter(~val.has_error()).drop("messages")

    def one() -> float:
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        plan.write.mode("overwrite").parquet(out)
        return time.perf_counter() - t0

    one()  # warmup (JIT, page cache)
    best = min(one(), one())
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cores": cores, "seconds": round(best, 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
