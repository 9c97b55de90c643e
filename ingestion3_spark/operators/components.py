"""Connected components over a candidate-pair graph (dup-cluster builder).

The step after near-duplicate detection: MinHash/Jaccard/SimHash emit
candidate PAIRS, but the unit a pipeline deduplicates is the transitive
CLUSTER (A~B, B~C => {A,B,C} keep one). Components are computed by
iterative min-label propagation expressed as DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint — each iteration is one shuffle join + one
aggregation over the (narrow) edge list, and convergence takes
O(component diameter) rounds. Near-dup clusters are short chains
(diameter rarely above single digits), so the loop is cheap.

For adversarially long chains at extreme scale,
``algorithm="star"`` selects the alternating large-star / small-star
variant (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14): each round rewires every node's larger neighbors (large-star)
then its smaller neighbors (small-star) to the neighborhood minimum,
contracting component diameter geometrically — O(log d) rounds instead
of O(d), with the same narrow groupBy/join shape per round
(property-tested: a 1k-node path graph converges in <= ~2·log2(n)
rounds, tests/test_pipeline_ops.py).

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
    algorithm: str = "propagate",
    stats: dict | None = None,
) -> DataFrame:
    """Return (node, cluster_id) for every node in ``pairs``; cluster_id is
    the component's minimum node id (deterministic canonical label).

    ``algorithm``: ``"propagate"`` (default; O(diameter) rounds — right for
    near-dup chains) or ``"star"`` (large-star/small-star; O(log diameter)
    rounds — right for adversarially long chains). ``stats``, if given,
    receives ``{"rounds": k}``.
    """
    if algorithm == "star":
        return _star_components(pairs, src, dst, max_iter, stats)
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
        if stats is not None:
            stats["rounds"] = _ + 1
        return labels.select("node", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


def _star_components(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star components (Kiveris et al., SoCC'14 Alg. 3/4).

    Per round, over the undirected edge set E (kept as directed pairs):

    * large-star — for every node u with neighborhood G(u):
      m = min(G(u) ∪ {u}); REPLACE each edge to a strictly larger
      neighbor v > u with (v, m). Larger neighbors hop to the local min.
    * small-star — orient every edge toward the smaller endpoint
      (u = max, v = min); for every u: m = min(smaller-neighbors ∪ {u});
      emit (v, m) for each smaller neighbor and (u, m). Smaller neighbors
      and u itself attach to the minimum.

    Both steps are one groupBy + one broadcast-free equi-join over the
    narrow (long, long) edge list — identical shuffle shape to the
    propagation loop — but diameter contracts geometrically, so a path
    graph needs O(log n) rounds, not O(n). Fixpoint: the edge set is a
    union of stars centered on component minima; labels read straight off
    the star edges. Self-loops are dropped between steps;
    ``localCheckpoint`` truncates lineage per round (use reliable
    ``checkpoint()`` on a real cluster to survive executor loss)."""
    all_nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    # canonical undirected edge set, one row per unordered pair (a < b)
    edges = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iter):
        # ---- large-star: both directions, group by u, rewire v > u to m
        both = edges.select("a", "b").unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = both.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        ls = (
            both.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(
                F.least(F.col("b"), F.col("m")).alias("a"),
                F.greatest(F.col("b"), F.col("m")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star: orient to smaller endpoint (rows already a<b:
        # group by the LARGER endpoint b), attach smaller nbrs + u to min
        smins = ls.groupBy("b").agg(
            F.least(F.min("a"), F.first("b")).alias("m")
        )
        ss = (
            ls.join(smins, "b")
            .select(F.col("a").alias("v"), F.col("b").alias("u"), "m")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.least("v", "m").alias("a"),
                                 F.greatest("v", "m").alias("b")),
                        F.struct(F.least("u", "m").alias("a"),
                                 F.greatest("u", "m").alias("b")),
                    )
                ).alias("e")
            )
            .select("e.a", "e.b")
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds += 1
        same = (
            ss.count() == edges.count()
            and ss.exceptAll(edges).limit(1).count() == 0
        )
        edges = ss
        if same:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edge set is a union of stars (center = component min):
    # every non-center node appears as `b` exactly once, pointing at `a`
    labels = edges.select(F.col("b").alias("node"), F.col("a").alias("cluster_id"))
    out = (
        all_nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce("cluster_id", "node").alias("cluster_id"),
        )
    )
    result = out.localCheckpoint(eager=True)
    all_nodes.unpersist()
    return result
