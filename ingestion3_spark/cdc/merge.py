"""Key-partitioned MERGE INTO the LakeTable (bucket-pruned, narrow-shuffle).

Distributed replacement for the reference's collect-and-broadcast merge
(``utils/NaraMergeUtil.scala:54-320``): where the reference collects delta
ids to the driver and filters base with a closure UDF (correct only because
delta << base), this merge is joins against the NARROW winner-key set
produced by ``dedup.winner_keys`` —

  classify: winners LEFT JOIN base-keys    -> insert/update/delete/invalid_delete
  apply:    base ANTI JOIN winner-keys ∪ late-materialized upserts

The wide token payload never enters a dedup shuffle: ``changes`` is built by
the caller as a (broadcast) semi-join of the winner keys back to the
columnar source scan. Only buckets containing delta keys are read and
rewritten (manifest-level file pruning), so merge cost scales with |delta| +
|touched buckets|, not |base|. Classification and the data write are
INDEPENDENT Spark jobs and run concurrently (FAIR scheduler) — per-batch
wall time is max(classify, write), not their sum. Lineage counts per
event-feed partition and the new checkpoint are committed atomically with
the data (MergeLogs analog, ``NaraMergeUtil.scala:12-39,242-307``).
"""

from __future__ import annotations

from concurrent import futures
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingestion3_spark.lakehouse.adapter import TableAdapter
from ingestion3_spark.lakehouse.table import LakeTable, Snapshot

LINEAGE_COLS = [
    "batch_id", "part", "inserts", "updates", "deletes",
    "invalid_deletes", "dedup_dropped", "errors",
]


@dataclass
class MergeResult:
    snapshot: Snapshot
    lineage: list[dict]
    rows_before: int
    rows_after: int

    @property
    def counts(self) -> dict:
        tot = {"inserts": 0, "updates": 0, "deletes": 0, "invalid_deletes": 0}
        for row in self.lineage:
            for k in tot:
                tot[k] += row.get(k, 0)
        return tot


def merge_batch(
    table: TableAdapter,
    changes: DataFrame,
    winners: DataFrame,
    batch_id: int,
    checkpoint: dict[int, int],
    touched: set[int],
    broadcast_winners: bool = True,
    extra_lineage_future: "futures.Future | None" = None,
    extra_lineage: dict[tuple, dict] | None = None,
    clean_count: int | None = None,
    n_winners: int | None = None,
) -> MergeResult:
    """Apply deduped per-key changes to the table in one transaction.

    ``changes``: one (wide) row per doc_id with columns ``(doc_id, op,
    <payload...>, seq, part)`` — already deduped by the caller.
    ``winners``: the PERSISTED narrow winner keys ``(doc_id, seq, part, op,
    __bucket)`` — reused for classification, the base anti-join, and bucket
    pruning without recomputing anything wide. ``extra_lineage_future``: an
    in-flight error-routing job whose per-part counts must land in the same
    atomic commit; it is awaited only after the write jobs are submitted, so
    error routing overlaps the merge write. Op classification recomputes
    insert-vs-update against actual base state (an 'insert' of an existing
    key is an update and vice versa, mirroring upsert semantics,
    ``NaraMergeUtil.scala:246-264``).
    """
    key = table.key_column
    data_cols = table.column_names()
    mor = table.merge_mode == "mor"

    import os as _os
    import time as _time
    debug = _os.environ.get("I3S_DEBUG_TIMING") == "1"
    _t0 = _time.perf_counter()

    def _t(label):
        if debug:
            print(f"[timing]   merge {label}: {_time.perf_counter() - _t0:.2f}s", flush=True)

    # anti-join strategy: broadcasting a multi-million-entry STRING key set
    # builds a large hash map single-threaded on the driver — measured
    # 2-4x slower than a shuffled hash join of the (small) base against the
    # narrow persisted winners. Broadcast only genuinely small winner sets.
    win_keys = winners.select(key)
    if (
        broadcast_winners
        and n_winners is not None
        and n_winners <= int(_os.environ.get("I3S_ANTI_BCAST_MAX", "1000000"))
    ):
        win_keys = F.broadcast(win_keys)
    else:
        win_keys = win_keys.hint("shuffle_hash")

    def classify_job() -> list:
        # narrow columns only: winner keys vs live base keys (token arrays
        # never decoded — live_keys prunes to the key column)
        base_keys = table.live_keys(buckets=touched).withColumn(
            "_matched", F.lit(True)
        )
        rows = (
            winners.select(key, "part", "op")
            .join(base_keys, key, "left")
            .withColumn(
                "action",
                F.when((F.col("op") == "delete") & F.col("_matched").isNotNull(), "delete")
                .when(F.col("op") == "delete", "invalid_delete")
                .when(F.col("_matched").isNotNull(), "update")
                .otherwise("insert"),
            )
            .groupBy("part")
            .agg(
                F.sum(F.when(F.col("action") == "insert", 1).otherwise(0)).alias("inserts"),
                F.sum(F.when(F.col("action") == "update", 1).otherwise(0)).alias("updates"),
                F.sum(F.when(F.col("action") == "delete", 1).otherwise(0)).alias("deletes"),
                F.sum(F.when(F.col("action") == "invalid_delete", 1).otherwise(0)).alias(
                    "invalid_deletes"
                ),
            )
            .collect()
        )
        _t("classify_agg")
        return rows

    rows_before_total = -1 if mor else sum(e.rows for e in table.live_files())

    def write_job():
        if not touched:
            return []
        if mor:
            # merge-on-read: append the deduped changes (upserts + delete
            # tombstones) as delta files — O(delta) write, no base rewrite.
            # ``changes`` is feed-scan-partitioned (late materialization),
            # so every task holds rows of EVERY bucket: the no-exchange
            # fanout path (key_partitioned=True) makes the dynamic-
            # partition writer sort the wide token payload in each task
            # and spray tasks×buckets small files — measured 2-3x slower
            # than paying the one co-locating exchange (same shape as the
            # COW upsert path; knob kept for bucket-aligned callers).
            files = table.write_delta_files(
                changes.select(*data_cols, "op", "seq", "part"),
                key_partitioned=(
                    _os.environ.get("I3S_MOR_FANOUT", "0") == "1"
                    # one-exchange mode: the dedup exchange in replay.py is
                    # already bucket-aligned, so skip the write's own
                    or _os.environ.get("I3S_ONE_EXCHANGE", "1") == "1"
                ),
            )
            _t("delta_write")
            return files
        # copy-on-write: base rows not touched by delta ∪ upsert payloads.
        upserts = changes.filter(F.col("op") != "delete").select(*data_cols)
        base = table.read(buckets=touched)
        if _os.environ.get("I3S_COW_SPLIT", "1") == "1" and broadcast_winners:
            # SPLIT write (round-3 scale design): only the UPSERTS — O(delta)
            # wide rows — go through the co-locating exchange; base
            # survivors take a map-side broadcast anti-join and a fanout
            # write with NO exchange at all. Base-scan tasks are bucket-
            # aligned (each parquet file belongs to exactly one bucket
            # dir), so the dynamic-partition writer sees ~1 partition value
            # per task and the fanout sort penalty (the reason the r2
            # whole-union fanout lost) vanishes. At 10^10-row scale this is
            # the difference between shuffling the TABLE and shuffling the
            # DELTA per merge. Requires broadcastable winners; the huge-
            # winner fallback below keeps the single-exchange union plan.
            with futures.ThreadPoolExecutor(max_workers=2) as wpool:
                # base-survivor anti-join strategy (A/B knob): 'bcast'
                # broadcasts the winner keys — no exchange, bucket-aligned
                # fanout write, but the driver builds a |winners|-entry
                # string hash map serially (~2s at 3.5M keys); 'shuffle'
                # pays two small exchanges (wide base + narrow winners)
                # with zero serial driver time — better when |winners| is
                # millions and base is comparatively small.
                if _os.environ.get("I3S_BASE_ANTI", "bcast") == "shuffle":
                    f_base = wpool.submit(
                        lambda: table.write_files(
                            base.select(*data_cols).join(
                                winners.select(key).hint("shuffle_hash"),
                                key,
                                "left_anti",
                            )
                        )
                    )
                else:
                    f_base = wpool.submit(
                        lambda: table.write_files(
                            base.select(*data_cols).join(
                                F.broadcast(winners.select(key)), key, "left_anti"
                            ),
                            key_partitioned=True,
                        )
                    )
                # the dedup exchange (dropDuplicates' hash(key) shuffle)
                # already co-locates equal keys, so the upsert write can
                # reuse it as its partitioning (fanout) instead of paying a
                # second full exchange of the wide delta — knobbed because
                # the fanout writer's per-task dynamic-partition handling
                # (sort fallback vs concurrent writers) is storage-profile
                # dependent; pair with spark.sql.maxConcurrentOutputFileWriters
                fan = (
                    _os.environ.get("I3S_SPLIT_UPSERT_FANOUT", "0") == "1"
                    # one-exchange mode: changes arrive already bucket-
                    # partitioned (replay.py dedup exchange), so the write
                    # must NOT pay a second exchange
                    or _os.environ.get("I3S_ONE_EXCHANGE", "1") == "1"
                )
                f_ups = wpool.submit(
                    lambda: table.write_files(upserts, key_partitioned=fan)
                )
                base_files = f_base.result()
                _t("cow_split base done")
                ups_files = f_ups.result()
                _t("cow_split upserts done")
                files = base_files + ups_files
            _t("cow_write_split")
            return files
        new_data = (
            base.select(*data_cols)
            .join(win_keys, key, "left_anti")
            .unionByName(upserts)
        )
        # single-exchange union fallback (huge winner sets): fanout
        # (key_partitioned=True) measured SLOWER for the union despite
        # saving an exchange — a union task holds MANY buckets, so Spark's
        # dynamic-partition write locally sorts every task's rows
        # (maxConcurrentOutputFileWriters=0 default) and ~900 small files
        # add writer overhead; the single repartition("__bucket") exchange
        # is cheaper there (+9s vs +3s at 32 cores).
        files = table.write_files(
            new_data,
            key_partitioned=_os.environ.get("I3S_FANOUT", "0") == "1",
        )
        _t("cow_write")
        return files

    # classification and the data write are independent — run them as
    # concurrent Spark jobs; commit happens only after both (and the error
    # job, if any) have landed.
    with futures.ThreadPoolExecutor(max_workers=2) as pool:
        f_classify = pool.submit(classify_job)
        f_write = pool.submit(write_job)
        agg = f_classify.result()
        new_files = f_write.result()
    _t("jobs joined")

    lineage_rows = {}
    for r in agg:
        p = int(r["part"]) if r["part"] is not None else -1
        lineage_rows[(batch_id, p)] = {
            "batch_id": batch_id,
            "part": p,
            "inserts": int(r["inserts"]),
            "updates": int(r["updates"]),
            "deletes": int(r["deletes"]),
            "invalid_deletes": int(r["invalid_deletes"]),
            "dedup_dropped": 0,
            "errors": 0,
        }
    post = sum(
        r["inserts"] + r["updates"] + r["deletes"] + r["invalid_deletes"]
        for r in lineage_rows.values()
    )
    if n_winners is not None and post != n_winners:
        raise AssertionError(
            f"classification covered {post} winners, expected {n_winners}"
        )
    if extra_lineage_future is not None:
        got = extra_lineage_future.result()
        if got:
            extra_lineage = {**(extra_lineage or {}), **got}
    if clean_count is not None and clean_count - post:
        # dedup_dropped = clean deliveries minus surviving changes —
        # derived from already-collected counts, no extra Spark job
        extra_lineage = dict(extra_lineage or {})
        e = extra_lineage.setdefault((batch_id, -1), {})
        e["dedup_dropped"] = e.get("dedup_dropped", 0) + (clean_count - post)
    for k, extra in (extra_lineage or {}).items():
        row = lineage_rows.setdefault(
            k,
            {
                "batch_id": k[0], "part": k[1], "inserts": 0, "updates": 0,
                "deletes": 0, "invalid_deletes": 0, "dedup_dropped": 0, "errors": 0,
            },
        )
        row.update({kk: row.get(kk, 0) + vv for kk, vv in extra.items()})

    touched_files = (
        [] if mor else [e for e in table.live_files() if e.bucket in touched]
    )
    counts = {
        "inserts": sum(r["inserts"] for r in lineage_rows.values()),
        "updates": sum(r["updates"] for r in lineage_rows.values()),
        "deletes": sum(r["deletes"] for r in lineage_rows.values()),
        "invalid_deletes": sum(r["invalid_deletes"] for r in lineage_rows.values()),
    }
    snap = table.commit(
        operation="merge-delta" if mor else "merge",
        add_files=new_files,
        remove_paths={e.path for e in touched_files},
        checkpoint=checkpoint,
        batch_id=batch_id,
        lineage=list(lineage_rows.values()),
        summary=counts,
    )
    _t("commit")
    if mor:
        # physical file rows include superseded versions + tombstones, so
        # the COW count invariant does not apply; the oracle-equality tests
        # and compaction (which re-establishes exact file counts) are the
        # MOR correctness gates
        rows_after_total = -1
    else:
        rows_after_total = sum(e.rows for e in table.live_files())
        # count reconciliation invariant (NaraMergeUtil.scala:188,284)
        expected = rows_before_total + counts["inserts"] - counts["deletes"]
        if rows_after_total != expected:
            raise AssertionError(
                f"merge reconciliation failed: before={rows_before_total} "
                f"+ins={counts['inserts']} -del={counts['deletes']} "
                f"expected={expected} got={rows_after_total}"
            )
    return MergeResult(snap, list(lineage_rows.values()), rows_before_total, rows_after_total)


def lineage_df(table: LakeTable, spark=None) -> DataFrame:
    """All committed lineage rows as a DataFrame (ops-log analog,
    ``NaraMergeUtil.scala:310-314``)."""
    spark = spark or table.spark
    rows = []
    for s in table.snapshots():
        rows.extend(s.lineage)
    schema = ("batch_id long, part int, inserts long, updates long, deletes long, "
              "invalid_deletes long, dedup_dropped long, errors long")
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame([[r[c] for c in LINEAGE_COLS] for r in rows], schema)
