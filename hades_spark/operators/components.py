"""Connected components over a pair/edge DataFrame — iterative joins.

GraphFrames-style min-label propagation expressed with plain DataFrame ops
(the traversal-join pattern the reference runs through AQL,
``database.py:2646-2660``): each node starts labelled with itself, and every
round adopts the minimum label among itself and its neighbors, until no
label changes. Rounds are O(graph diameter) — for near-dup / alias graphs
the diameter is tiny; ``max_iter`` caps runaway chains (SURVEY §7.4.3).

Scale notes: each round is one shuffle on ``node``; frontiers are cached
and localCheckpoint()ed every few rounds to truncate lineage so the plan
doesn't grow exponentially across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 15,
) -> DataFrame:
    """(a, b) undirected pairs -> (node, component) with component = min
    node id reachable (ids compared with natural ordering of the column
    type)."""
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .dropDuplicates(["s", "d"])
        .cache()
    )

    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )

    for it in range(max_iter):
        # neighbor-min labels via one join + one aggregate
        neighbor_min = (
            edges.join(labels, edges.d == labels.node)
            .groupBy("s").agg(F.min("component").alias("n_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.s, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("n_min"), F.col("component")),
                ).alias("component"),
                (F.col("n_min") < F.col("component")).alias("changed"),
            )
        )
        # eager localCheckpoint truncates lineage AND fully materializes, so
        # unpersisting the previous round can't trigger recompute cascades
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels.unpersist()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break

    edges.unpersist()
    return labels
