"""Interleaved A/B replay experiment (drift-robust config comparison).

Usage:
  python tools/ab_replay.py <cores> <events_parquet> <n_base> <rounds> \
      "<envA>" "<envB>" ["<envC>" ...]

Each env spec is a space-separated K=V list applied (and reverted) around
each replay; configs alternate A,B,...,A,B,... inside ONE JVM so the
host's minute-scale CPU drift hits every config equally. Conf keys
starting with ``sql:`` are set via spark.conf (runtime SQL confs).
Prints per-replay seconds and the per-config min/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingestion3_spark.session import get_spark  # noqa: E402
from tools.replay_bench import one_replay  # noqa: E402


def main() -> int:
    cores = int(sys.argv[1])
    events_path = sys.argv[2]
    n_base = int(sys.argv[3])
    rounds = int(sys.argv[4])
    specs = sys.argv[5:]
    work = os.environ.get("I3S_AB_WORK", "/dev/shm/i3s_bench")

    spark = get_spark(
        f"ab-replay-{cores}", cores=cores, shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.local.dir": os.path.join(work, "spark-local"),
            "spark.sql.parquet.compression.codec": "uncompressed",
        },
    )
    events = spark.read.parquet(events_path)

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

    # warm with config A
    old = apply(specs[0])
    one_replay(spark, events, work, cores, n_base, 1, "warm")
    one_replay(spark, events, work, cores, n_base, 1, "warm2")
    revert(old)

    times: dict[str, list[float]] = {s: [] for s in specs}
    for r in range(rounds):
        for s in specs:
            old = apply(s)
            dt = one_replay(spark, events, work, cores, n_base, 1, f"ab{r}")
            revert(old)
            times[s].append(dt)
            print(f"[ab] round={r} cfg={s!r} {dt:.2f}s", flush=True)
    out = {
        s: {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "all": [round(t, 3) for t in ts],
        }
        for s, ts in times.items()
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
