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
from ingestion3_spark.lakehouse.adapter import TableAdapter
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
    # the adapter seam (lakehouse/adapter.py): everything the engine calls
    # on the table, with the real-Iceberg binding documented per call;
    # LakeTable is the sandbox implementation
    table: TableAdapter
    error_dir: str | None = None
    salted_dedup: bool = False
    salt_buckets: int = 32
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
        """Single-batch application, structured for scaling (round-2 design).

        Job budget and shape (the scale discipline — every Spark action is
        a full job, and every serial job is Amdahl time 4x cores cannot
        divide):

        * phase 1 (CONCURRENT jobs): winner selection — shuffle only
          ``(doc_id, seq, part, op)`` packed into one BIGINT, persist the
          ~|keys| winner set, return per-bucket counts — overlapped with
          error routing (wide scan -> tiny batch-partitioned write +
          pruned count-back; mode knob ``I3S_WINNER_MODE``, see inline)
          and the column-pruned per-part offsets aggregation. events_in /
          error totals ride along as ``observe()`` metrics.
        * phase 2 (two CONCURRENT jobs): the narrow classify agg and the
          data write. The write late-materializes the wide payload:
          source scan ⋈ broadcast(winner keys) — the wide token arrays
          flow map-side from parquet into the single bucketed write
          shuffle and are never spilled or shuffled for dedup.
        * phase 3: one atomic commit (data + checkpoint + lineage),
          folding in the error-routing counts via its future.

        Wide-payload bytes shuffled per batch: |winners| rows, not |events|
        (round-1's wide dedup shuffle + DISK_ONLY spill was the scaling
        bottleneck — memory-bandwidth-bound, flat past ~8 cores).
        """
        import time
        from concurrent import futures

        from pyspark.sql import Observation
        from pyspark.storagelevel import StorageLevel

        debug = os.environ.get("I3S_DEBUG_TIMING") == "1"
        t0 = time.perf_counter()

        def _t(label):
            if debug:
                print(
                    f"[timing] batch={batch_id} {label}: {time.perf_counter() - t0:.2f}s",
                    flush=True,
                )

        self.check_compat(events)
        ckpt = self.table.checkpoint()
        pending = dd.drop_applied(events, ckpt)
        key = self.table.key_column
        # payload columns come from the TABLE's current schema (schema
        # evolution: added/renamed columns flow once the metadata
        # transaction has been applied)
        payload = [c for c in self.table.column_names() if c != key]

        # one Observation per consuming JOB: two concurrent actions racing a
        # shared CollectMetrics node can hand Observation.get a malformed
        # row (observed as a toPyRow assertion failure on empty redelivery
        # batches), so the error-routing scan and the winner scan each get
        # their own instance.
        # Routing runs on the CHEAP error predicate (no per-row message
        # structs on the 10^7-row scans); full messages are built only for
        # the errored subset inside _route_errors — property-tested equal
        # to has_error(validate_events(df)).
        errp = val.error_predicate()
        metric_cols = (
            F.count(F.lit(1)).alias("events_in"),
            F.sum(errp.cast("long")).alias("n_err"),
        )
        obs_err = Observation()
        observed = pending.observe(obs_err, *metric_cols)
        obs_win = Observation()
        clean = pending.observe(obs_win, *metric_cols).filter(~errp)
        winners = winners_all = None
        try:
            with futures.ThreadPoolExecutor(max_workers=3) as pool:
                # offsets job: Catalyst prunes this scan to the (part, seq)
                # parquet column chunks — token arrays are never decoded
                # for checkpoint bookkeeping
                f_offsets = pool.submit(
                    lambda: pending.groupBy("part")
                    .agg(F.max("seq").alias("hi"))
                    .collect()
                )
                _t("plan built")
                # winner-selection modes, A/B-measured (BENCH.md):
                #  - concurrent (default): winner agg over the clean rows
                #    (wide scan re-evaluates has_error) runs CONCURRENTLY
                #    with error routing; error counts join the commit via a
                #    future. Best 4N wall AND best scaling ratio — the two
                #    wide scans overlap.
                #  - errfirst: route errors, then a tokens-free narrow
                #    winner scan anti-joins the error keys. Lowest TOTAL
                #    work (best at small core counts / congested hosts).
                #  - optimistic: winners over ALL pending concurrently +
                #    per-errored-doc fixup (for high-error feeds).
                mode = os.environ.get("I3S_WINNER_MODE", "concurrent")
                f_err = None
                if mode in ("errfirst", "optimistic") and self.error_dir is not None:
                    # these modes call _route_errors (and its obs.get) up
                    # front — check batch emptiness FIRST so a fully-
                    # redelivered/empty batch takes the same safe early
                    # return as the concurrent path (the offsets future is
                    # re-awaited below; resolved futures are idempotent)
                    if not f_offsets.result():
                        stats = BatchStats(batch_id, 0, 0, 0, None)
                        self.history.append(stats)
                        return stats
                if self.error_dir is not None and mode == "errfirst":
                    # serial errors-first variant (A/B knob): route errors,
                    # then winner-select over the error-excluded narrow scan
                    err_by_part, err_keys = self._route_errors(observed, batch_id, obs_err)
                    _t("error route")
                    n_err = sum(d["errors"] for d in err_by_part.values())
                    src = pending.select(key, "seq", "part", "op")
                    if n_err:
                        ek = err_keys.select("part", "seq")
                        if n_err <= 5_000_000:
                            ek = F.broadcast(ek)
                        src = src.join(ek, ["part", "seq"], "left_anti")
                    base_winners = dd.winner_keys_packed(
                        src, key=key,
                        salted=self.salted_dedup, salt_buckets=self.salt_buckets,
                    )
                elif self.error_dir is not None and mode == "optimistic":
                    # optimistic winner selection runs CONCURRENTLY with
                    # error routing: winners over ALL pending events from a
                    # tokens-free narrow scan (no has_error evaluation),
                    # while the batch's one wide validation scan routes
                    # errors (observe() metrics ride on it). A doc's
                    # optimistic winner is wrong only if that exact event
                    # errored — the fixup below recomputes just those docs
                    # against the (tiny) error-key set.
                    win_src = pending.select(key, "seq", "part", "op")
                    winners_all = dd.winner_keys_packed(
                        win_src, key=key,
                        salted=self.salted_dedup, salt_buckets=self.salt_buckets,
                    ).persist(StorageLevel.MEMORY_AND_DISK)
                    f_wall = pool.submit(winners_all.count)
                    err_by_part, err_keys = self._route_errors(observed, batch_id, obs_err)
                    _t("error route")
                    n_err = sum(d["errors"] for d in err_by_part.values())
                    f_wall.result()
                    _t("optimistic winners")
                    if n_err:
                        ek = err_keys.select("part", "seq")
                        if n_err <= 5_000_000:
                            ek = F.broadcast(ek)
                        good = winners_all.join(ek, ["part", "seq"], "left_anti")
                        bad_keys = (
                            winners_all.join(ek, ["part", "seq"], "left_semi")
                            .select(key)
                        )
                        redo = dd.winner_keys_packed(
                            win_src.join(F.broadcast(bad_keys), key, "left_semi")
                            .join(ek, ["part", "seq"], "left_anti"),
                            key=key,
                            salted=self.salted_dedup, salt_buckets=self.salt_buckets,
                        )
                        base_winners = good.unionByName(redo)
                    else:
                        base_winners = winners_all
                else:
                    # concurrent mode (and the no-error-sink fallback):
                    # winners over the clean rows; the error-routing job (if
                    # any) runs in a parallel thread and its per-part counts
                    # join the atomic commit via the future
                    err_by_part, n_err = {}, None  # from obs
                    if self.error_dir is not None:
                        f_err = pool.submit(
                            self._route_errors_counts, observed, batch_id, obs_err
                        )
                    base_winners = dd.winner_keys_packed(
                        clean.select(key, "seq", "part", "op"), key=key,
                        salted=self.salted_dedup, salt_buckets=self.salt_buckets,
                    )
                winners = (
                    base_winners
                    .withColumn("__bucket", self.table.bucket_expr())
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                bucket_rows = winners.groupBy("__bucket").count().collect()
                _t("winners agg")
                offset_rows = f_offsets.result()
                _t("phase1 errors+winners+offsets")
                if not offset_rows:
                    # fully-redelivered/empty batch: return BEFORE touching
                    # Observation.get — AQE's empty-relation propagation
                    # removes the CollectMetrics node from collect-style
                    # actions on an empty stage, leaving the observation
                    # holding a schemaless row that crashes toPyRow
                    stats = BatchStats(batch_id, 0, 0, 0, None)
                    self.history.append(stats)
                    return stats
                touched = {int(r["__bucket"]) for r in bucket_rows}
                n_winners = sum(int(r["count"]) for r in bucket_rows)
                # metrics from the observation whose single consuming job
                # has definitely completed in this mode
                if n_err is not None:
                    events_in = int(obs_err.get["events_in"] or 0)
                elif n_winners > 0:
                    metrics = obs_win.get
                    events_in = int(metrics["events_in"] or 0)
                    n_err = int(metrics["n_err"] or 0)
                    if n_err and f_err is None:
                        err_by_part[(batch_id, -1)] = {"errors": n_err}
                else:
                    # concurrent-mode poison batch: pending is non-empty but
                    # every event failed validation, so obs_win's single
                    # consuming job (the winner agg) ran on an empty-after-
                    # filter plan — the same AQE empty-relation/CollectMetrics
                    # condition as the empty-batch return above. Derive the
                    # totals from the error-routing write (writes never
                    # collapse) or a plain count instead of touching obs_win.
                    if f_err is not None:
                        err_by_part = f_err.result() or {}
                        f_err = None
                        metrics = obs_err.get
                        events_in = int(metrics["events_in"] or 0)
                        n_err = int(metrics["n_err"] or 0)
                    else:
                        events_in = pending.count()
                        n_err = events_in
                        if n_err:
                            err_by_part[(batch_id, -1)] = {"errors": n_err}
                new_ckpt = dict(ckpt)
                for r in offset_rows:
                    p = int(r["part"])
                    new_ckpt[p] = max(int(r["hi"]), new_ckpt.get(p, -1))

                # late materialization: recover the winners' wide payload by
                # broadcast-joining the winner (seq, part) keys back to the
                # scan — packed into one BIGINT (see pk2 below), the match
                # is EXACT under the feed's (part, seq)-uniqueness contract.
                # Surviving rows per key are byte-identical duplicate
                # re-deliveries of that key's winner (at-least-once feed),
                # so a plain dropDuplicates([key]) — a |winners|-row First
                # aggregation — finishes the dedup deterministically
                # (measured 2.3x cheaper than a wide max_by, which runs in
                # ObjectHashAggregate). Beyond the cap: shuffle join on the
                # narrow keys (at 10^10-event scale, pair with a bucketed
                # base layout).
                bcast = n_winners <= int(
                    os.environ.get("I3S_BROADCAST_WINNERS_MAX", "10000000")
                )
                # (seq, part) packed into one long IS the join key: the
                # feed's (part, seq)-uniqueness contract (exact byte-
                # identical redeliveries only) makes a single-long equi-join
                # exact — rows matching a winner's packed (seq, part) are
                # that winner's delivery or its redeliveries, nothing else.
                # One 8-byte column per broadcast map entry (the driver-side
                # build of a multi-million-entry map is SERIAL time, so
                # every byte in it costs scaling), and the probe side is a
                # LongHashedRelation — no per-row xxhash64, no post-filter.
                # same per-row domain guard as packed_order: the packing is
                # only injective while part < 2^16 and seq < 2^42
                pk2 = (
                    F.shiftleft(F.col("seq"), 16)
                    + F.col("part").cast("long")
                    + F.coalesce(
                        F.assert_true(
                            (F.col("part") >= 0) & (F.col("part") < F.lit(dd.PACK_PART_MAX))
                            & (F.col("seq") >= 0) & (F.col("seq") < F.lit(dd.PACK_SEQ_MAX)),
                            F.lit("seq/part outside pk2 packed domain "
                                  "(seq < 2^42, part < 2^16)"),
                        ).cast("long"),
                        F.lit(0),
                    )
                )
                # payload normalization (n_tok recompute, delete-nulling)
                # WITHOUT message construction: every row surviving the
                # exact winner join is clean by construction (winners are
                # selected from clean rows and (part, seq) is unique), so
                # the messages array would be dead weight on this scan
                clean_norm = val.normalize_payload(clean, tuple(payload))
                if bcast:
                    # the packed-long match is exact ONLY under the feed's
                    # (part, seq)-uniqueness contract; a violating feed
                    # would attach a foreign key's payload to the winner.
                    # I3S_DEBUG=1 re-verifies the key per joined row (one
                    # extra broadcast string column + an assert_true) —
                    # off on the hot path, on in the property tests.
                    debug = os.environ.get("I3S_DEBUG", "0") == "1"
                    wcols = [pk2.alias("_wpk")] + (
                        [F.col(key).alias("_wkey")] if debug else []
                    )
                    wk = F.broadcast(winners.select(*wcols))
                    delta = (
                        clean_norm.select(key, "op", *payload, "seq", "part")
                        .withColumn("_wpk", pk2)
                        .join(wk, "_wpk", "inner")
                        .drop("_wpk")
                    )
                    if debug:
                        # folded into a KEPT column (same trick as pk2's
                        # domain guard) — a dropped assert column would be
                        # pruned unevaluated by Catalyst
                        delta = delta.withColumn(
                            "seq",
                            F.col("seq") + F.coalesce(
                                F.assert_true(
                                    F.col(key) == F.col("_wkey"),
                                    F.lit("packed (seq,part) collision: "
                                          "joined payload key != winner key "
                                          "— feed violates (part, seq) "
                                          "uniqueness"),
                                ).cast("long"),
                                F.lit(0),
                            ),
                        ).drop("_wkey")
                else:
                    delta = clean_norm.select(key, "op", *payload, "seq", "part").join(
                        winners.select(key, "seq", "part"),
                        [key, "seq", "part"],
                        "inner",
                    )
                if os.environ.get("I3S_ONE_EXCHANGE", "1") == "1":
                    # one-exchange variant: repartition by the WRITE's own
                    # bucket column first, then dedup on (bucket, key) —
                    # hashpartitioning([__bucket]) is a subset of the
                    # dedup's clustering keys, so Catalyst inserts NO
                    # second exchange, and the bucketed write can take the
                    # fanout path (~2 bucket values per task) instead of
                    # its own full exchange of the wide payload. The
                    # (bucket, key) groups equal the key groups because
                    # bucket = f(key).
                    changes = (
                        delta.withColumn("__bucket", self.table.bucket_expr())
                        .repartition(F.col("__bucket"))
                        .dropDuplicates(["__bucket", key])
                        .drop("__bucket")
                    )
                else:
                    changes = delta.dropDuplicates([key])

                result = merge_batch(
                    self.table,
                    changes,
                    winners,
                    batch_id=batch_id,
                    checkpoint=new_ckpt,
                    touched=touched,
                    broadcast_winners=bcast,
                    extra_lineage=err_by_part,
                    extra_lineage_future=f_err,
                    clean_count=events_in - n_err,
                    n_winners=n_winners,
                )
                _t("merge")
            stats = BatchStats(batch_id, events_in, n_err, n_winners, result)
            self.history.append(stats)
            return stats
        finally:
            if winners is not None:
                winners.unpersist()
            if winners_all is not None:
                winners_all.unpersist()

    def _route_errors_counts(self, observed: DataFrame, batch_id: int, obs) -> dict:
        """Thread target for concurrent mode: error write + per-part counts
        only (the error-key DataFrame is not needed when winner selection
        filters on has_error itself)."""
        return self._route_errors(observed, batch_id, obs)[0]

    def _route_errors(self, observed: DataFrame, batch_id: int, obs) -> tuple[dict, DataFrame | None]:
        """Error-table write (MessageCollector report analog) + per-part
        counts for lineage. At-least-once — ``errors_df`` dedups by (part,
        seq). The write is partitioned by ``batch_id`` so the count-back
        read prunes to THIS batch's files (O(batch errors), not O(all
        errors ever written)). Returns (per-part counts keyed (batch_id,
        part), lazy DataFrame of this batch's deduped error (part, seq)
        keys — the winner-selection anti-join input)."""
        err_by_part: dict[tuple, dict] = {}
        err_path = self._err_path()
        (
            val.validate_events(observed.filter(val.error_predicate()))
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "part", "seq", "doc_id", "op", "messages",
            )
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(err_path)
        )
        if int(obs.get["n_err"] or 0) == 0:
            return err_by_part, None
        err_keys = (
            self.spark.read.parquet(err_path)
            .filter(F.col("batch_id") == batch_id)
            .dropDuplicates(["part", "seq"])
        )
        for r in err_keys.groupBy("part").agg(F.count("*").alias("n")).collect():
            err_by_part[(batch_id, int(r["part"]))] = {"errors": int(r["n"])}
        return err_by_part, err_keys

    # ------------------------------------------------------------ full replay
    def replay(
        self,
        events: DataFrame,
        num_batches: int = 1,
        batch_id_start: int | None = None,
        minor_every: int = 0,
        compact_every: int = 0,
        expire_every: int = 0,
        keep_last: int = 4,
    ) -> list[BatchStats]:
        """Split the feed into seq-range micro-batches and apply in order.

        Deterministic boundaries: equal seq ranges over [min, max]. With
        ``num_batches=1`` this is one atomic replay (and the boundary scan
        is skipped entirely); larger values exercise multi-batch
        checkpoint/resume.

        ``minor_every``/``compact_every`` run table maintenance on a
        batch cadence inside the replay loop — at 10^10 events a replay
        IS thousands of micro-batches, and without folds the MOR
        reconcile read degrades linearly in accumulated delta layers
        (measured: BENCH.md "Sustained multi-batch replay"; folding every
        4 batches inside a 16-batch major window was 1.66x end-to-end).
        A major compact wins any batch where both cadences land. Each
        maintenance commit carries the checkpoint forward, so a crash
        between a batch and its fold resumes exactly-once as usual.
        """
        if num_batches <= 1:
            bid = batch_id_start if batch_id_start is not None else self._next_batch_id()
            return [self.apply_batch(events, batch_id=bid)]
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
            if compact_every and (b + 1) % compact_every == 0:
                self.table.compact(min_files=2)
            elif minor_every and (b + 1) % minor_every == 0:
                self.table.compact_deltas()
            if expire_every and (b + 1) % expire_every == 0:
                # retention cadence: the driver-side metadata walk is
                # O(retained snapshots) per commit (every publish rewrites
                # the whole meta JSON, so unbounded retention is O(batches²)
                # total bytes over a 10^10-scale replay). Expiring on a
                # cadence bounds it at O(keep_last); exactly-once is
                # unaffected — the checkpoint lives in the CURRENT snapshot
                # (Iceberg binding: CALL system.expire_snapshots).
                self.table.expire_snapshots(keep_last=max(keep_last, 1))
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

    def _err_path(self) -> str:
        """Current (v2, batch_id-partitioned) error sink directory.

        Versioned because the round-1 layout wrote ``batch_id`` as a DATA
        column into ``errors/`` while v2 writes it as a PARTITION column —
        mixing the two in one parquet root makes partition inference clash
        with the embedded column. Legacy dirs stay readable via
        ``errors_df``; new writes never touch them.
        """
        return os.path.join(self.error_dir, "errors_v2")

    def errors_df(self) -> DataFrame:
        """Error-table reader (v2 partitioned layout ∪ legacy v1 layout).

        The error sink is an append-only parquet written BEFORE the merge
        commit, so a crash between error-write and commit leaves duplicate
        rows on retry (at-least-once diagnostics — observed under SIGKILL).
        Reads therefore dedup on the unique delivery key (part, seq).
        """
        cols = [
            F.col("batch_id").cast("long").alias("batch_id"),
            "part", "seq", "doc_id", "op", "messages",
        ]
        parts = []
        if self.error_dir:
            for sub in ("errors_v2", "errors"):
                p = os.path.join(self.error_dir, sub)
                if os.path.exists(p):
                    parts.append(self.spark.read.parquet(p).select(*cols))
        if not parts:
            return self.spark.createDataFrame(
                [], "batch_id long, part int, seq long, doc_id string, op string, "
                    "messages " + val.MESSAGE_SCHEMA
            )
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
        return df.dropDuplicates(["part", "seq"])
