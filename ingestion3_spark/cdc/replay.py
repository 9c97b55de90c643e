"""Replay engine: checkpointed, batched, exactly-once CDC replay.

The pipeline per batch (SURVEY.md §7.1.3):

  read events (seq > checkpoint)          -- resumable tail
   -> validate/normalize (vectorized)     -- messages column, n_tok recompute
   -> route errors to error table         -- bad event never kills the batch
   -> last-(seq,part)-wins dedup per doc  -- exactly-once core
   -> MERGE INTO LakeTable                -- bucket-pruned copy-on-write
   -> commit {data + checkpoint + lineage} atomically

Crash/resume: a batch whose commit did not land is invisible; re-running it
reads the same checkpoint and produces the same state (idempotent). A batch
whose commit landed is skipped entirely by the seq > checkpoint filter.
This replaces the reference's ad-hoc resumability (directory-timestamp
snapshots + full-output overwrite, ``dataStorage/InputHelper.scala:29-69``,
``utils/NaraMergeUtil.scala:173-236``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestion3_spark.cdc import dedup as dd
from ingestion3_spark.cdc import validate as val
from ingestion3_spark.cdc.merge import MergeResult, merge_batch
from ingestion3_spark.lakehouse.table import Field, LakeTable

CORPUS_FIELDS = [
    Field(1, "doc_id", "string"),
    Field(2, "tokens", "array<int>"),
    Field(3, "n_tok", "int"),
    Field(4, "source", "string"),
]


@dataclass
class BatchStats:
    batch_id: int
    events_in: int
    errors: int
    changes: int
    merge: MergeResult | None

    def as_dict(self) -> dict:
        d = {
            "batch_id": self.batch_id,
            "events_in": self.events_in,
            "errors": self.errors,
            "changes": self.changes,
        }
        if self.merge:
            d.update(self.merge.counts)
        return d


@dataclass
class ReplayEngine:
    spark: SparkSession
    table: LakeTable
    error_dir: str | None = None
    salted_dedup: bool = False
    salt_buckets: int = 32
    persist_batches: bool = False
    history: list[BatchStats] = field(default_factory=list)

    @staticmethod
    def create_table(
        spark: SparkSession, path: str, num_buckets: int = 16, merge_mode: str = "cow"
    ) -> LakeTable:
        return LakeTable.create(
            spark, path, CORPUS_FIELDS, num_buckets=num_buckets, merge_mode=merge_mode
        )

    # ------------------------------------------------------------- one batch
    def apply_batch(self, events: DataFrame, batch_id: int) -> BatchStats:
        """Single-pass batch application.

        Action budget (the scale discipline — every Spark action is a full
        job): a column-pruned offsets aggregation (reads ONLY the seq/part
        parquet chunks, never the token arrays), one error-routing scan
        that writes the error table (per-part error counts read back from
        the tiny written output), then the merge's classify agg + data
        write. The feed's wide columns are scanned exactly twice per batch
        (error routing + merge); every other job touches narrow columns or
        already-written small outputs.
        """
        import time

        from pyspark.storagelevel import StorageLevel

        debug = os.environ.get("I3S_DEBUG_TIMING") == "1"
        tmark = time.perf_counter()

        def _t(label):
            nonlocal tmark
            if debug:
                now = time.perf_counter()
                print(f"[timing] batch={batch_id} {label}: {now - tmark:.2f}s", flush=True)
                tmark = now

        self.check_compat(events)
        ckpt = self.table.checkpoint()
        validated = val.validate_events(dd.drop_applied(events, ckpt))
        # zero-persistence by default (the reference's strategy for wide
        # payload rows, NaraMergeUtil.scala:99-117): validation is cheap
        # vectorized expressions, so re-scanning the columnar source beats
        # materializing a wide cache. persist_batches=True opts into
        # caching for expensive upstream sources.
        if self.persist_batches:
            validated = validated.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # offsets/count job: Catalyst prunes this scan to the (part,
            # seq) parquet column chunks — the wide token arrays are never
            # decoded for checkpoint bookkeeping
            offset_rows = (
                dd.drop_applied(events, ckpt)
                .groupBy("part")
                .agg(F.max("seq").alias("hi"), F.count("*").alias("n"))
                .collect()
            )
            _t("offsets_agg")
            if not offset_rows:
                stats = BatchStats(batch_id, 0, 0, 0, None)
                self.history.append(stats)
                return stats
            new_ckpt = dict(ckpt)
            events_in = n_err = 0
            err_by_part: dict[tuple, dict] = {}
            for r in offset_rows:
                p = int(r["part"])
                new_ckpt[p] = max(int(r["hi"]), new_ckpt.get(p, -1))
                events_in += int(r["n"])

            if self.error_dir is not None:
                # error table write (MessageCollector report analog);
                # at-least-once — errors_df() dedups by (part, seq).
                # Per-part error counts for lineage come from re-reading the
                # tiny written output, NOT from a third full feed scan;
                # deduped by (part, seq) so a crash-retry that re-appends
                # the same batch cannot inflate the lineage counts.
                err_path = os.path.join(self.error_dir, "errors")
                (
                    validated.filter(val.has_error())
                    .withColumn("batch_id", F.lit(batch_id))
                    .select("batch_id", "part", "seq", "doc_id", "op", "messages")
                    .write.mode("append")
                    .parquet(err_path)
                )
                _t("error_write")
                for r in (
                    self.spark.read.parquet(err_path)
                    .filter(F.col("batch_id") == batch_id)
                    .dropDuplicates(["part", "seq"])
                    .groupBy("part")
                    .agg(F.count("*").alias("n"))
                    .collect()
                ):
                    err_by_part[(batch_id, int(r["part"]))] = {"errors": int(r["n"])}
                    n_err += int(r["n"])
            else:
                n_err = validated.filter(val.has_error()).count()
                if n_err:
                    err_by_part[(batch_id, -1)] = {"errors": n_err}
            _t("error_count")

            clean = validated.filter(~val.has_error())
            deduper = dd.latest_by_key_salted if self.salted_dedup else dd.latest_by_key
            kwargs = {"salt_buckets": self.salt_buckets} if self.salted_dedup else {}
            # payload columns come from the TABLE's current schema (schema
            # evolution: added/renamed columns flow once the metadata
            # transaction has been applied)
            key = self.table.key_column
            payload = [c for c in self.table.column_names() if c != key]
            changes = deduper(
                clean.select(key, "op", *payload, "seq", "part"),
                key=key,
                **kwargs,
            )

            result = merge_batch(
                self.table,
                changes,
                batch_id=batch_id,
                checkpoint=new_ckpt,
                extra_lineage=err_by_part,
                clean_count=events_in - n_err,
                touched_buckets=None,  # merge derives them from its spilled delta
            )
            _t("merge")
            c = result.counts
            post = c["inserts"] + c["updates"] + c["deletes"] + c["invalid_deletes"]
            stats = BatchStats(batch_id, events_in, n_err, post, result)
            self.history.append(stats)
            return stats
        finally:
            if self.persist_batches:
                validated.unpersist()

    # ------------------------------------------------------------ full replay
    def replay(
        self,
        events: DataFrame,
        num_batches: int = 1,
        batch_id_start: int | None = None,
    ) -> list[BatchStats]:
        """Split the feed into seq-range micro-batches and apply in order.

        Deterministic boundaries: equal seq ranges over [min, max]. With
        ``num_batches=1`` this is one atomic replay; larger values exercise
        multi-batch checkpoint/resume.
        """
        lo_hi = events.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
        if lo_hi["lo"] is None:
            return []
        lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
        span = hi - lo + 1
        step = max(1, span // num_batches + (1 if span % num_batches else 0))
        out = []
        bid = batch_id_start if batch_id_start is not None else self._next_batch_id()
        for b in range(num_batches):
            b_lo, b_hi = lo + b * step, min(lo + (b + 1) * step - 1, hi)
            if b_lo > hi:
                break
            chunk = events.filter((F.col("seq") >= b_lo) & (F.col("seq") <= b_hi))
            out.append(self.apply_batch(chunk, batch_id=bid))
            bid += 1
        return out

    def check_compat(self, events: DataFrame) -> None:
        """Hard schema-compatibility gate before any merge.

        The reference only WARNS on structural mismatch
        (``harvesters/Harvester.scala`` validateSchema); replaying an
        incompatible feed into a lake table must fail fast instead. Every
        table payload column must be present in the feed (after any applied
        rename/add metadata transaction) with a compatible type.
        """
        have = dict(events.dtypes)
        missing = [c for c in self.table.column_names() if c not in have and c != self.table.key_column]
        if self.table.key_column not in have:
            raise ValueError(f"feed lacks key column {self.table.key_column!r}")
        if missing:
            raise ValueError(
                f"feed is missing table columns {missing} — apply the schema "
                f"evolution (add/rename) on the table before replaying, or fix the feed"
            )

    def _next_batch_id(self) -> int:
        ids = [s.batch_id for s in self.table.snapshots() if s.batch_id is not None]
        return (max(ids) + 1) if ids else 0

    def errors_df(self) -> DataFrame:
        """Error-table reader.

        The error sink is an append-only parquet written BEFORE the merge
        commit, so a crash between error-write and commit leaves duplicate
        rows on retry (at-least-once diagnostics — observed under SIGKILL).
        Reads therefore dedup on the unique delivery key (part, seq).
        """
        path = os.path.join(self.error_dir, "errors") if self.error_dir else None
        if not path or not os.path.exists(path):
            return self.spark.createDataFrame(
                [], "batch_id long, part int, seq long, doc_id string, op string, "
                    "messages " + val.MESSAGE_SCHEMA
            )
        return self.spark.read.parquet(path).dropDuplicates(["part", "seq"])
