"""Exactly-once / last-event-wins dedup kernels.

Deterministic upgrade of the reference's ``dropDuplicates("id")`` (arbitrary
winner, ``utils/NaraMergeUtil.scala:129-135``): the winner per doc_id is the
event with the greatest ``(seq, part)`` — a total order because ``(part,
seq)`` is unique and seq is strictly increasing per part.

Scale design: implemented as ``groupBy(key).agg(max_by(...))`` rather than a
row_number window. A window has NO map-side combine — all events of a hot
doc_id meet in one reducer (the skew the north_rule calls out). ``max_by``
is a partial aggregate: each map task pre-reduces its local events per key,
so a doc_id with 10^6 updates in a batch ships ~#map-tasks rows, not 10^6.
This makes pre-dedup salting unnecessary in the common path; an explicit
two-phase salted variant is provided for adversarial skew and for engines
where partial agg is disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDER_COLS = ("seq", "part")


def latest_by_key(
    df: DataFrame,
    key: str = "doc_id",
    order_cols: tuple[str, ...] = ORDER_COLS,
) -> DataFrame:
    """One row per key: the row with the max (seq, part). Columns preserved."""
    payload = [c for c in df.columns if c != key]
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    agg = df.groupBy(key).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_w")
    )
    return agg.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def latest_by_key_salted(
    df: DataFrame,
    key: str = "doc_id",
    order_cols: tuple[str, ...] = ORDER_COLS,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase dedup with explicit salt: groupBy(key, salt) then groupBy(key).

    For hot keys, phase 1 spreads a single key over ``salt_buckets``
    reducers; phase 2 reduces at most ``salt_buckets`` rows per key.
    """
    payload = [c for c in df.columns if c != key]
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(key, "_salt").agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_w")
    )
    phase1 = phase1.select(
        key, *[F.col(f"_w.{c}").alias(c) for c in payload]
    )
    phase2 = phase1.groupBy(key).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_w")
    )
    return phase2.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def drop_applied(df: DataFrame, checkpoint: dict[int, int]) -> DataFrame:
    """Idempotent re-delivery guard: drop events at-or-below the committed
    per-part offset (resume semantics; OAI resumption-token analog,
    ``harvesters/oai/OaiMultiPageResponseBuilder.scala:32-120``).

    Broadcast join against the tiny checkpoint map — never a driver-side
    ``collect`` of event ids (the reference's scalability ceiling,
    ``NaraMergeUtil.scala:140-146``).
    """
    if not checkpoint:
        return df
    spark = df.sparkSession
    ckpt = spark.createDataFrame(
        [(int(p), int(s)) for p, s in checkpoint.items()], "part int, _applied_seq long"
    )
    return (
        df.join(F.broadcast(ckpt), "part", "left")
        .filter(F.col("_applied_seq").isNull() | (F.col("seq") > F.col("_applied_seq")))
        .drop("_applied_seq")
    )
