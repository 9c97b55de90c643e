"""Vectorized validation / normalization pass with per-record error routing.

The new engine's analog of the reference's Mapper validation cascade +
MessageCollector (``mappers/Mapper.scala:193-630``, ``messages/
IngestMessage.scala:24-31``): every check appends a message struct to a
``messages`` array column instead of throwing; rows with any
``level=='error'`` message are excluded from the merge and routed to the
error table (``executors/MappingExecutor.scala:116-118``). 100% built-in
Spark expressions — no Python UDF in the hot path (input_hint: "no per-row
Python").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MESSAGE_SCHEMA = (
    "array<struct<message:string,level:string,id:string,"
    "field:string,value:string,enrichedValue:string>>"
)


def _msg(message, level, id_col, field, value, enriched):
    return F.struct(
        F.lit(message).alias("message"),
        F.lit(level).alias("level"),
        F.col(id_col).cast("string").alias("id"),
        F.lit(field).alias("field"),
        value.cast("string").alias("value"),
        enriched.cast("string").alias("enrichedValue"),
    )


def validate_events(df: DataFrame) -> DataFrame:
    """Append ``messages`` and normalized payload columns.

    Checks (FIXTURES.md §4):
    - ERROR ``null tokens on non-delete``  — insert/update without payload;
    - WARN  ``n_tok mismatch, recomputed`` — stored n_tok != size(tokens);
    - INFO  ``payload on delete ignored``  — delete carrying a payload.
    Normalizations: ``n_tok`` recomputed from ``size(tokens)``; delete rows
    get null payload columns.
    """
    is_delete = F.col("op") == "delete"
    null_payload = F.col("tokens").isNull()
    true_ntok = F.size("tokens")
    ntok_bad = (~is_delete) & (~null_payload) & (
        F.col("n_tok").isNull() | (F.col("n_tok") != true_ntok)
    )
    payload_on_delete = is_delete & (
        F.col("tokens").isNotNull() | F.col("n_tok").isNotNull() | F.col("source").isNotNull()
    )

    messages = F.filter(
        F.array(
            F.when(
                (~is_delete) & null_payload,
                _msg("null tokens on non-delete", "error", "doc_id", "tokens",
                     F.lit(""), F.lit("")),
            ),
            F.when(
                ntok_bad,
                _msg("n_tok mismatch, recomputed", "warn", "doc_id", "n_tok",
                     F.col("n_tok"), true_ntok),
            ),
            F.when(
                payload_on_delete,
                _msg("payload on delete ignored", "info", "doc_id", "op",
                     F.lit("delete"), F.lit("")),
            ),
        ),
        lambda m: m.isNotNull(),
    ).cast(MESSAGE_SCHEMA)

    return (
        df.withColumn("messages", messages)
        .withColumn(
            "n_tok",
            F.when(is_delete, F.lit(None).cast("int")).otherwise(true_ntok.cast("int")),
        )
        .withColumn("tokens", F.when(is_delete, F.lit(None).cast("array<int>")).otherwise(F.col("tokens")))
        .withColumn("source", F.when(is_delete, F.lit(None).cast("string")).otherwise(F.col("source")))
    )


def has_error(col: str = "messages"):
    """Router predicate: any error-level message (MappingExecutor.scala:116-118)."""
    return F.array_contains(F.col(f"{col}.level"), "error")


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, errored) — errored rows never reach the merge."""
    return df.filter(~has_error()), df.filter(has_error())


def explode_messages(df: DataFrame) -> DataFrame:
    """Flatten the messages array to one row per message.

    Single ``inline`` replaces the reference's 6-way aligned posexplode
    (``messages/MessageProcessor.scala:19-47``).
    """
    return df.select(F.inline("messages"))


def message_summary(df: DataFrame) -> DataFrame:
    """Counts by (message, field, level) — MessageProcessor.scala:71-77 analog."""
    return (
        explode_messages(df)
        .groupBy("message", "field", "level")
        .agg(F.count("id").alias("n"))
        .orderBy(F.desc("n"), "message")
    )
