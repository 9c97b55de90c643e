"""Connected components over a candidate-pair graph (dup-cluster builder).

The step after near-duplicate detection: MinHash/Jaccard/SimHash emit
candidate PAIRS, but the unit a pipeline deduplicates is the transitive
CLUSTER (A~B, B~C => {A,B,C} keep one). Components are computed by
iterative min-label propagation expressed as DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint — each iteration is one shuffle join + one
aggregation over the (narrow) edge list, and convergence takes
O(component diameter) rounds. Near-dup clusters are short chains
(diameter rarely above single digits), so the loop is cheap; for
adversarially long chains at extreme scale the alternating large-star /
small-star variant (Kiveris et al., "Connected Components in MapReduce
and Beyond") halves diameters per round with the same join-shape — the
hook point is the ``propagate`` step below.

Dominant cost at scale: the per-iteration edge-label join, a narrow
(long, long) shuffle; the doc payload never enters the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, cluster_id) for every node in ``pairs``; cluster_id is
    the component's minimum node id (deterministic canonical label)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).persist()
    try:
        for _ in range(max_iter):
            # min neighbor label per node, one narrow shuffle join + agg
            prop = (
                edges.join(labels, edges["a"] == labels["node"])
                .groupBy(F.col("b").alias("node"))
                .agg(F.min("label").alias("_nbr"))
            )
            # localCheckpoint (not just persist): each round nests another
            # join into the logical plan, and after ~10 rounds analysis
            # blows the planner stack — checkpointing truncates lineage so
            # every iteration plans O(1) operators (at cluster scale use
            # reliable checkpoint() to survive executor loss)
            new_labels = (
                labels.join(prop, "node", "left")
                .select(
                    "node",
                    F.least(F.col("label"), F.coalesce("_nbr", "label")).alias(
                        "label"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("label", "_old"), "node")
                .filter(F.col("label") != F.col("_old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("node", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()
