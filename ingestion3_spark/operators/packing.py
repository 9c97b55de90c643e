"""Training-sequence packing: assign variable-length tokenized docs to
fixed-budget packs by global prefix sum.

The LLM-pipeline step downstream of tokenization: documents (each
``len_col`` tokens long, ordered deterministically by ``order_col``) are
laid head-to-tail and cut into packs of ``max_len`` tokens; a doc's pack
is ``floor(exclusive_prefix_sum / max_len)`` — offset packing, the
deterministic/parallelizable form of greedy concat-and-chunk packing.

Scale design: a naive ``sum().over(Window.orderBy(order_col))`` collapses
the whole table into ONE window partition (Spark warns, and at 100 TB it
is a single-task sort). This implementation is the classic two-level
distributed prefix sum instead:

  1. range-repartition by ``order_col`` (P range-sorted partitions),
  2. per-partition local exclusive prefix sums — P independent window
     partitions, fully parallel,
  3. per-partition totals (P rows) to the driver, prefix-summed there,
  4. broadcast the P offsets back and add.

Everything shuffled is narrow (order key + length); the token payload
itself never moves. Cost: one range exchange of the narrow projection +
one tiny collect — the same shape at 10^10 rows with P sized to the
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def with_global_prefix_sum(
    df: DataFrame,
    order_col: str,
    len_col: str,
    num_partitions: int | None = None,
    out_col: str = "prefix_excl",
) -> DataFrame:
    """Add the global EXCLUSIVE prefix sum of ``len_col`` in ``order_col``
    order, without a single-partition window."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # narrow frame persisted so the totals job and the prefix job see the
    # SAME range partitioning (repartitionByRange samples boundaries; two
    # independent executions could split differently)
    ranged = (
        df.repartitionByRange(p, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = (
        ranged.groupBy("_pid").agg(F.sum(len_col).alias("_t")).collect()
    )
    # range partition i holds keys strictly below partition i+1 — the
    # driver-side running sum over the P totals is the partition offset
    by_pid = {int(r["_pid"]): int(r["_t"]) for r in totals}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    offset_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in offsets]),
            F.array(*[F.lit(v) for v in offsets.values()]),
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    local = W.partitionBy("_pid").orderBy(order_col).rowsBetween(
        W.unboundedPreceding, -1
    )
    return (
        ranged.withColumn(
            out_col,
            (F.coalesce(F.sum(len_col).over(local), F.lit(0)) + offset_expr).cast(
                "long"
            ),
        )
        .drop("_pid")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    len_col: str,
    max_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a ``pack_id`` (offset packing, see module doc)."""
    out = with_global_prefix_sum(df, order_col, len_col, num_partitions)
    return out.withColumn(
        "pack_id", F.floor(F.col("prefix_excl") / F.lit(max_len)).cast("long")
    )
