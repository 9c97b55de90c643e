"""Benchmark harness.

Part A — headline analytic queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; each timed to a noop
sink (no collect cost).

Part B — CDC replay throughput: a seeded synthetic feed replayed into a
fresh LakeTable, at TWO parallelism levels (N=CPUS/4 and 4N=CPUS cores,
fresh JVM each via subprocess) to evidence the north_rule scaling
criterion: efficiency = thr_4N / (4 * thr_N).

Prints ONE JSON line:
{"metric": "change_events_per_sec", "value": thr_4N, "unit": "events/sec",
 "queries": {name: sec, ...}, "sf": ..., "cdc": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "10000000"))
CDC_BASE = int(os.environ.get("SPARK_GRAFT_CDC_BASE", "500000"))
CDC_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
CDC_REPS = int(os.environ.get("SPARK_GRAFT_CDC_REPS", "2"))
# tmpfs by default: the sandbox's single virtio disk saturates at ~8 cores
# and hides CPU scaling; a real cluster has NVMe/distributed storage.
WORK = os.environ.get(
    "SPARK_GRAFT_WORK",
    "/dev/shm/i3s_bench" if os.path.isdir("/dev/shm") else "/tmp/i3s_bench",
)

HEADLINE = [
    "cdc_last_event_wins",
    "cdc_merge_classify",
    "cdc_sessionize",
    "q1_pricing_summary",
    "q3_revenue_by_order",
    "q5_nation_revenue",
    "window_running_total",
    "topk_orders_per_cust",
    "props_k_distribution",
    "doc_stats",
    "doc_fingerprint",
    "lang_id",
    "doc_jaccard_pairs",
    "doc_minhash_pairs",
    "doc_simhash_pairs",
    "knn_topk",
    "ann_lsh_topk",
    "doc_embed_dups",
]


def ensure_feed(path: str, n_events: int, n_base: int) -> str:
    from ingestion3_spark.cdc.generator import make_events, write_fixture

    feed = os.path.join(path, f"events_{n_events}_{n_base}.parquet")
    if not os.path.exists(feed):
        os.makedirs(path, exist_ok=True)
        write_fixture(
            feed,
            make_events(n_events, n_base_docs=n_base, seed=42, n_parts=32, max_len=128),
        )
    return feed


def run_queries() -> dict[str, float]:
    from ingestion3_spark.plans.queries import QUERIES
    from ingestion3_spark.session import get_spark

    spark = get_spark("bench-queries", cores=CPUS, shuffle_partitions=CPUS)
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return times


def run_replay(cores: int, feed: str, num_batches: int = 1) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "tools", "replay_bench.py"),
         str(cores), feed, str(CDC_BASE), str(num_batches), WORK, str(CDC_REPS)],
        capture_output=True, text=True, check=True,
    )
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> int:
    feed = ensure_feed(WORK, CDC_EVENTS, CDC_BASE)
    times = run_queries()

    n = max(CPUS // 4, 1)
    r_4n = run_replay(CPUS, feed)
    cdc = {
        "events": r_4n["events"],
        "cores_4N": CPUS,
        "thr_4N": r_4n["events_per_sec"],
        "seconds_4N": r_4n["seconds"],
    }
    times["cdc_replay"] = r_4n["seconds"]
    if CDC_SCALING:
        r_n = run_replay(n, feed)
        cdc.update({
            "cores_N": n,
            "thr_N": r_n["events_per_sec"],
            "seconds_N": r_n["seconds"],
            "scaling_efficiency": round(r_4n["events_per_sec"] / (4 * r_n["events_per_sec"]), 3),
        })

    print(json.dumps({
        "metric": "change_events_per_sec",
        "value": cdc["thr_4N"],
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cdc": cdc,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
