"""Reporting operators (SURVEY.md §2.4 A2-A9, reference ``reports/`` +
``messages/MessageProcessor.scala``) — all expressed as single groupBy
aggregations with map-side partial aggregation (no driver loops)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def message_field_summary(messages: DataFrame) -> DataFrame:
    """Counts by (message, field), ordered desc — MessageProcessor.scala:71-77.

    ``messages`` = exploded message rows (one per message)."""
    return (
        messages.groupBy("message", "field")
        .agg(F.count("id").alias("n"))
        .orderBy(F.desc("n"), "message", "field")
    )


def distinct_id_count(messages: DataFrame) -> int:
    """MessageProcessor.scala:59-60 — countDistinct replaces the double
    groupBy."""
    return messages.agg(F.countDistinct("id").alias("n")).collect()[0]["n"]


def value_frequency_report(df: DataFrame, array_col: str) -> DataFrame:
    """PropertyDistinctValueReport.scala:274-278 — explode + count."""
    return (
        df.select(F.explode(F.col(array_col)).alias("value"))
        .groupBy("value")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "value")
    )


def completeness_report(df: DataFrame, required: list[str]) -> DataFrame:
    """MetadataCompletenessReport.scala:44-86 analog: per-column fill rates
    plus a mean completeness score, in ONE aggregation."""
    aggs = [
        F.avg(F.col(c).isNotNull().cast("double")).alias(f"fill_{c}") for c in required
    ]
    indicator = sum(
        (F.col(c).isNotNull().cast("double") for c in required), F.lit(0.0)
    ) / len(required)
    aggs.append(F.avg(indicator).alias("mean_completeness"))
    return df.agg(*aggs)


def ops_log(lineage: DataFrame) -> DataFrame:
    """Per-batch totals from lineage rows — the (id, operation) CSV ops log
    (NaraMergeUtil.scala:310-314) generalized to per-partition counts."""
    return (
        lineage.groupBy("batch_id")
        .agg(
            F.sum("inserts").alias("inserts"),
            F.sum("updates").alias("updates"),
            F.sum("deletes").alias("deletes"),
            F.sum("invalid_deletes").alias("invalid_deletes"),
            F.sum("dedup_dropped").alias("dedup_dropped"),
            F.sum("errors").alias("errors"),
        )
        .orderBy("batch_id")
    )


def merge_summary_text(lineage: DataFrame, rows_before: int, rows_after: int) -> str:
    """_SUMMARY.txt analog (NaraMergeUtil.scala:268-307,435-499) with the
    count-reconciliation invariant stated explicitly."""
    tot = ops_log(lineage).agg(
        F.sum("inserts").alias("i"), F.sum("updates").alias("u"),
        F.sum("deletes").alias("d"), F.sum("invalid_deletes").alias("x"),
        F.sum("dedup_dropped").alias("dd"), F.sum("errors").alias("e"),
    ).collect()[0]
    expected = rows_before + (tot["i"] or 0) - (tot["d"] or 0)
    ok = "OK" if expected == rows_after else "MISMATCH"
    return (
        f"rows before        {rows_before}\n"
        f"inserts            {tot['i'] or 0}\n"
        f"updates            {tot['u'] or 0}\n"
        f"deletes            {tot['d'] or 0}\n"
        f"invalid deletes    {tot['x'] or 0}\n"
        f"dedup dropped      {tot['dd'] or 0}\n"
        f"errors routed      {tot['e'] or 0}\n"
        f"rows after         {rows_after}\n"
        f"reconciliation     before + inserts - deletes = {expected} [{ok}]\n"
    )
