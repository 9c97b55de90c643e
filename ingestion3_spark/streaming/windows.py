"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference has no streaming ops (SURVEY.md §2.9) — its late-data story
is the batch seq-number dedup. This module adds the streaming-native
counterpart for feed *monitoring* (event-rate / per-type counts over the
change feed): watermarked tumbling windows and session windows, both pure
built-in operators (full state lives in Spark's streaming state store,
partitioned by grouping key — scales with executors).

Late-data contract: an event older than ``watermark`` behind the max seen
event time is dropped by the state store. That is intentionally the weaker,
monitoring-grade guarantee; the replay path (cdc/replay.py) never relies on
it — exactly-once there comes from seq dedup + idempotent merge, so a
CDC event arriving arbitrarily late is still applied correctly by the
batch engine even though the monitoring window dropped it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-(tumbling window, key) event counts with a late-data watermark.

    Append-mode safe: a window row is emitted exactly once, when the
    watermark passes its end. Works on a streaming or batch DataFrame
    (batch: watermark is a no-op, same result as a plain groupBy).
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def session_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key session windows (gap-based), the streaming twin of the batch
    ``cdc_sessionize`` query (plans/queries.py)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
