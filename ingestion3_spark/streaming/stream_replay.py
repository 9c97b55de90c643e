"""Structured Streaming front-end for the replay engine.

The engine's correctness mechanism is batch-deterministic (seq-dedup +
idempotent MERGE + checkpoint-in-commit); Structured Streaming is delivery
sugar on top, exactly as SURVEY.md §2.9/§7.4 prescribes: a ``readStream``
over the event feed drives ``foreachBatch`` into ``ReplayEngine.apply_batch``.

Exactly-once composition: Spark's streaming checkpoint provides
at-least-once micro-batch delivery; the engine's own committed per-part
offsets make re-delivered events no-ops. So even if the streaming
checkpoint and the table commit diverge (crash between them), the replay
stays exactly-once — the table's checkpoint is the source of truth, the
streaming offset log is just a cursor hint. This mirrors the reference's
OAI resumption-token cursor (``harvesters/oai/OaiMultiPageResponseBuilder.
scala:32-120``) generalized to per-partition offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ingestion3_spark.cdc.replay import ReplayEngine


def stream_replay(
    engine: ReplayEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = True,
    processing_time: str | None = None,
):
    """Attach a streaming event feed to the replay engine.

    ``stream_df`` is any streaming DataFrame with the event envelope
    (seq/part/op/doc_id/payload...). Typical sources: ``spark.readStream
    .schema(...).parquet(dir)`` for a file-drop feed, or Kafka on a real
    cluster. Returns the started StreamingQuery.
    """
    state = {"n": 0}

    def apply_microbatch(batch_df: DataFrame, epoch_id: int) -> None:
        # batch ids are allocated from the table's committed history, NOT
        # from epoch_id: a streaming restart resets epochs, table history
        # does not.
        engine.apply_batch(batch_df, batch_id=engine._next_batch_id())
        state["n"] += 1

    writer = stream_df.writeStream.foreachBatch(apply_microbatch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def file_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    schema: str = (
        "seq long, part int, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, ts timestamp"
    ),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-drop change feed: parquet files appearing in a directory."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(feed_dir)
