"""Graph query operators over a (src, dst) edge DataFrame.

Iterative-join restatements of the reference's AQL traversals:
- ``bfs``: ``FOR v,e,p IN min..max OUTBOUND start GRAPH g``
  (``database.py:2646-2660``) — frontier expansion, one join per depth.
- ``shortest_path_length``: ``SHORTEST_PATH`` (``database.py:2733-2744``) —
  BFS with early exit on target hit.

Scale notes: the frontier is usually tiny relative to the edge table, so
each round broadcasts the frontier into a hash join against edges
(partitioned by ``src``); visited-set dedup is an aggregation on node id.
Depth is bounded (the reference's API takes min/max depth too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """-> (node, depth) with depth = first-reach distance from any seed
    (seeds at depth 0). Frontier-expansion loop, one shuffle-free broadcast
    join per level."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    visited = seeds.select(F.col(node).alias("node")).distinct() \
                   .withColumn("depth", F.lit(0))
    frontier = visited

    for d in range(1, max_depth + 1):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            e.join(f, e._s == f.node)
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt

    return visited


def shortest_path_length(
    edges: DataFrame,
    source_id,
    target_id,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> int | None:
    """Unweighted shortest-path length source -> target, or None."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(source_id,)], ["node"])
    reached = bfs(edges, seeds, max_depth, src=src, dst=dst)
    hit = reached.filter(F.col("node") == target_id) \
                 .agg(F.min("depth").alias("d")).collect()[0]["d"]
    return int(hit) if hit is not None else None
