"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (CDC last-event-wins dedup) at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 + the
               training-data-pipeline ops (dedup/similarity/text).
oracle_sql() — DuckDB-equivalent SQL for EVERY query (round 2: the
               sketch/ANN queries gained oracles via the portable md5
               hash family + generated splitmix64/all-pairs SQL — see
               ingestion3_spark/plans/sketch_oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ingestion3_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic last-event-wins CDC dedup at sf0.001."""
    return QUERIES["cdc_last_event_wins"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
