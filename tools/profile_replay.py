"""One instrumented replay + per-stage metrics dump (Spark UI REST API).

Usage: python tools/profile_replay.py <cores> <events_parquet> <n_base> <work>
Prints each completed stage's name, wall seconds, executor-cpu seconds,
input bytes, shuffle read/write bytes — the ground truth for where replay
core-seconds go at a given parallelism level.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingestion3_spark.cdc.generator import make_corpus, write_fixture  # noqa: E402
from ingestion3_spark.cdc.replay import ReplayEngine  # noqa: E402
from ingestion3_spark.session import get_spark  # noqa: E402


def main() -> int:
    cores = int(sys.argv[1])
    events_path = sys.argv[2]
    n_base = int(sys.argv[3])
    work = sys.argv[4]

    spark = get_spark(
        f"profile-{cores}", cores=cores, shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.local.dir": os.path.join(work, "spark-local"),
            "spark.sql.parquet.compression.codec": "uncompressed",
        },
    )
    events = spark.read.parquet(events_path)

    marks = {}

    def one(tag):
        tp = os.path.join(work, f"prof_{cores}_{tag}")
        ed = os.path.join(work, f"proferr_{cores}_{tag}")
        shutil.rmtree(tp, ignore_errors=True)
        shutil.rmtree(ed, ignore_errors=True)
        table = ReplayEngine.create_table(
            spark, tp, num_buckets=64,
            merge_mode=os.environ.get("I3S_MERGE_MODE", "cow"),
        )
        if n_base:
            base_pq = os.path.join(work, f"base_{n_base}.parquet")
            if not os.path.exists(base_pq):
                write_fixture(base_pq, make_corpus(n_base, seed=42, max_len=128))
            table.commit("append", add_files=table.write_files(spark.read.parquet(base_pq)))
        eng = ReplayEngine(spark, table, error_dir=ed)
        # mark AFTER the base append so the REST-API window holds only
        # replay jobs (the 4M-doc base write would otherwise dominate the
        # stage table and make the jobs-union exceed the replay wall)
        marks[tag] = time.time() * 1000
        t0 = time.perf_counter()
        eng.replay(events, num_batches=1)
        dt = time.perf_counter() - t0
        shutil.rmtree(tp, ignore_errors=True)
        shutil.rmtree(ed, ignore_errors=True)
        return dt

    one("warm")  # JIT + page cache
    dt = one("measured")
    mark = marks["measured"]
    print(f"replay wall: {dt:.2f}s", flush=True)

    app = json.load(urllib.request.urlopen("http://localhost:4040/api/v1/applications"))
    app_id = app[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete"
    ))

    def _ms(ts: str) -> float:
        # '2026-08-18T10:00:00.123GMT' — keep the milliseconds; second-
        # truncation alone skews a 20-job union by +/-1-2s
        base = time.mktime(time.strptime(ts[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        frac = ts[19:23]
        return base + (float(frac) * 1000 if frac.startswith(".") else 0.0)

    # Jobs timeline: the union of [submission, completion] intervals is the
    # time SOME job was in flight; wall minus that union is pure driver-side
    # serial time (Catalyst analysis, py4j, commit JSON, Observation.get) —
    # the Amdahl term that caps N->4N scaling regardless of executor count.
    jobs = json.load(urllib.request.urlopen(
        f"http://localhost:4040/api/v1/applications/{app_id}/jobs?status=succeeded"
    ))
    intervals = []
    stage_to_job = {}
    for j in jobs:
        if "completionTime" not in j:
            continue
        sub, comp = _ms(j["submissionTime"]), _ms(j["completionTime"])
        if comp < mark - 1000:
            continue
        intervals.append((sub, comp))
        for sid in j.get("stageIds", []):
            stage_to_job[sid] = j["jobId"]
    intervals.sort()
    busy = 0.0
    cur_s = cur_e = None
    for s_, e_ in intervals:
        if cur_e is None or s_ > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s_, e_
        else:
            cur_e = max(cur_e, e_)
    if cur_e is not None:
        busy += cur_e - cur_s
    print(f"jobs in flight (union): {busy / 1000:.2f}s of {dt:.2f}s wall "
          f"-> driver-serial gaps ~{dt - busy / 1000:.2f}s "
          f"({len(intervals)} jobs)")

    rows = []
    for s in stages:
        # stage submissionTime like '2026-08-18T10:00:00.000GMT'
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        t = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        if t < mark - 1000:
            continue
        rows.append({
            "job": stage_to_job.get(s["stageId"]),
            "stage": s["stageId"],
            "tasks": s["numCompleteTasks"],
            "wall_s": round((s["completionTime"] and (
                time.mktime(time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                - time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")))) or -1, 1),
            "cpu_s": round(s["executorCpuTime"] / 1e9, 1),
            "run_s": round(s["executorRunTime"] / 1e3, 1),
            "input_mb": round(s["inputBytes"] / 1e6, 1),
            "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "out_mb": round(s["outputBytes"] / 1e6, 1),
            "name": s["name"][:60],
        })
    rows.sort(key=lambda r: -r["run_s"])
    tot_run = sum(r["run_s"] for r in rows)
    print(f"total executor-run core-seconds: {tot_run:.0f} "
          f"(wall*cores budget = {dt * cores:.0f})")
    for r in rows:
        print(json.dumps(r))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
