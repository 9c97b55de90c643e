"""Key-partitioned MERGE INTO the LakeTable (copy-on-write, bucket-pruned).

Distributed replacement for the reference's collect-and-broadcast merge
(``utils/NaraMergeUtil.scala:54-320``): where the reference collects delta
ids to the driver and filters base with a closure UDF (correct only because
delta << base), this merge is pure joins —

  classify: delta LEFT JOIN base-keys      -> insert/update/delete/invalid_delete
  apply:    base ANTI JOIN delta ∪ upserts -> rewritten buckets

Only buckets containing delta keys are read and rewritten (manifest-level
file pruning), so merge cost scales with |delta| + |touched buckets|, not
|base|. Lineage counts per event-feed partition and the new checkpoint are
committed atomically with the data (MergeLogs analog,
``NaraMergeUtil.scala:12-39,242-307``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

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
    table: LakeTable,
    changes: DataFrame,
    batch_id: int,
    checkpoint: dict[int, int],
    extra_lineage: dict[tuple, dict] | None = None,
    clean_count: int | None = None,
    touched_buckets: set[int] | None = None,
) -> MergeResult:
    """Apply deduped per-key changes to the table in one transaction.

    ``changes``: one row per doc_id with columns
    ``(doc_id, op in {insert,update,delete}, tokens, n_tok, source, part)``
    — op as delivered; classification below recomputes insert-vs-update
    against actual base state (an 'insert' of an existing key is an update
    and vice versa, mirroring upsert semantics).
    """
    key = table.key_column
    data_cols = table.column_names()

    # bound work to touched buckets: distinct bucket ids of the delta keys
    # (<= num_buckets values; aggregate, never a key collect)
    import os as _os
    import time as _time
    debug = _os.environ.get("I3S_DEBUG_TIMING") == "1"
    _tm = _time.perf_counter()

    def _t(label):
        nonlocal _tm
        if debug:
            now = _time.perf_counter()
            print(f"[timing]   merge {label}: {now - _tm:.2f}s", flush=True)
            _tm = now

    # DISK_ONLY, deliberately: the delta is read twice (classify agg + COW
    # write). An in-memory columnar cache of wide token arrays is expensive
    # to build and churns the allocator; a sequential disk spill is written
    # once and served from page cache (the reference's temp-file strategy,
    # NaraMergeUtil.scala:127-136, kept for the same reason).
    delta = changes.withColumn("__bucket", table.bucket_expr()).persist(
        StorageLevel.DISK_ONLY
    )
    try:
        if touched_buckets is None:
            touched = {r["__bucket"] for r in delta.select("__bucket").distinct().collect()}
        else:
            touched = {b for b in touched_buckets if 0 <= b < table.num_buckets}
        _t("delta_persist_buckets")
        mor = table.merge_mode == "mor"
        if mor:
            # merge-on-read: classification joins the NARROW reconciled key
            # set (token arrays never decoded); no base data is read here
            base = None
            base_keys = table.live_keys(buckets=touched).select(
                F.col(key), F.lit(True).alias("_matched")
            )
        else:
            base = table.read(buckets=touched, with_bucket_col=True)
            base_keys = base.select(F.col(key), F.lit(True).alias("_matched"))
        classified = (
            delta.join(base_keys, key, "left")
            .withColumn(
                "action",
                F.when((F.col("op") == "delete") & F.col("_matched").isNotNull(), "delete")
                .when(F.col("op") == "delete", "invalid_delete")
                .when(F.col("_matched").isNotNull(), "update")
                .otherwise("insert"),
            )
        )
        agg = (
            classified.groupBy("part")
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
        if clean_count is not None:
            # dedup_dropped = clean deliveries minus surviving changes —
            # derived from the classify agg, no extra Spark job
            post = sum(
                r["inserts"] + r["updates"] + r["deletes"] + r["invalid_deletes"]
                for r in lineage_rows.values()
            )
            if clean_count - post:
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

        if mor:
            # apply: append the deduped changes (upserts + delete
            # tombstones) as delta files — O(delta) write, no base rewrite
            rows_before_total = -1
            touched_files = []
            new_files = (
                table.write_delta_files(delta.select(*data_cols, "op", "seq", "part"))
                if touched else []
            )
        else:
            # apply: base rows not touched by delta ∪ upsert payloads
            upserts = delta.filter(F.col("op") != "delete").select(*data_cols)
            new_data = (
                base.select(*data_cols)
                .join(delta.select(key), key, "left_anti")
                .unionByName(upserts)
            )
            rows_before_total = sum(e.rows for e in table.live_files())
            touched_files = [e for e in table.live_files() if e.bucket in touched]
            new_files = table.write_files(new_data) if touched else []
        _t("cow_write")

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
        if mor:
            # physical file rows include superseded versions + tombstones,
            # so the COW count invariant does not apply; the oracle-equality
            # tests and compaction (which re-establishes exact file counts)
            # are the MOR correctness gates
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
    finally:
        delta.unpersist()


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
