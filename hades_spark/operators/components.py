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
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """(a, b) undirected pairs -> (node, component) with component = min
    node id reachable (ids compared with natural ordering of the column
    type).

    Adaptive execution: the verified alias/near-dup pair set is typically
    orders of magnitude smaller than the corpus, so when it fits under
    ``local_threshold`` pairs we collect once and run driver-side
    union-find (identical result, zero iteration overhead); above the
    threshold the distributed min-label loop runs. Pass
    ``local_threshold=0`` to force the distributed path (tests do)."""
    if local_threshold > 0:
        # count-then-collect (a global limit over shuffled input hits
        # CollectLimit's incremental-scan overhead, growing with partitions)
        slim = pairs.select(F.col(a_col), F.col(b_col)).cache()
        if slim.count() <= local_threshold:
            a_type = pairs.schema[a_col].dataType.simpleString()
            out = _local_components(pairs.sparkSession, slim.collect(), a_type)
            slim.unpersist()
            return out
        slim.unpersist()

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


def _local_components(spark, pair_rows, id_type: str = "string") -> DataFrame:
    """Driver-side union-find over collected pairs (path compression +
    union by min id so the representative matches the distributed path)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in pair_rows:
        a, b = r[0], r[1]
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        parent.setdefault(a, find(a))
        parent.setdefault(b, find(b))

    nodes = set(parent)
    out = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(
        out, f"node {id_type}, component {id_type}")
