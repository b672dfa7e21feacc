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


def _oriented(edges: DataFrame, src: str, dst: str,
              direction: str) -> DataFrame:
    """AQL-style direction (``database.py:2646-2660``): OUTBOUND follows
    src->dst, INBOUND follows dst->src, ANY both."""
    out = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if direction == "outbound":
        return out
    inb = edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
    if direction == "inbound":
        return inb
    if direction == "any":
        return out.unionByName(inb).dropDuplicates(["_s", "_d"])
    raise ValueError(f"direction must be outbound/inbound/any: {direction}")


def bfs(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    broadcast_frontier: bool = True,
    direction: str = "outbound",
    track_parent: bool = False,
) -> DataFrame:
    """-> (node, depth[, parent]) with depth = first-reach distance from any
    seed (seeds at depth 0). Frontier-expansion loop, one shuffle-free
    broadcast join per level. ``direction`` mirrors AQL OUTBOUND / INBOUND /
    ANY; ``track_parent=True`` records the (deterministic min) predecessor
    per node so paths can be reconstructed."""
    e = _oriented(edges, src, dst, direction)
    visited = seeds.select(F.col(node).alias("node")).distinct() \
                   .withColumn("depth", F.lit(0))
    if track_parent:
        visited = visited.withColumn(
            "parent", F.lit(None).cast(visited.schema["node"].dataType))
    frontier = visited

    for d in range(1, max_depth + 1):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        expanded = e.join(f, e._s == f.node)
        if track_parent:
            nxt = (
                expanded
                .groupBy(F.col("_d").alias("node"))
                .agg(F.min("_s").alias("parent"))  # deterministic tie-break
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("depth", F.lit(d))
                .select("node", "depth", "parent")
            )
        else:
            nxt = (
                expanded
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
    direction: str = "outbound",
) -> int | None:
    """Unweighted shortest-path length source -> target, or None."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(source_id,)], ["node"])
    reached = bfs(edges, seeds, max_depth, src=src, dst=dst,
                  direction=direction)
    hit = reached.filter(F.col("node") == target_id) \
                 .agg(F.min("depth").alias("d")).collect()[0]["d"]
    return int(hit) if hit is not None else None


def shortest_path(
    edges: DataFrame,
    source_id,
    target_id,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    direction: str = "outbound",
) -> list | None:
    """Vertex path source -> target (AQL ``SHORTEST_PATH`` vertex list,
    ``database.py:2733-2744``), or None when unreachable within
    ``max_depth``. BFS with parent tracking; the walk-back runs over the
    collected (node, parent) map of REACHED nodes only — bounded by the
    BFS result, not the graph."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(source_id,)], ["node"])
    reached = bfs(edges, seeds, max_depth, src=src, dst=dst,
                  direction=direction, track_parent=True)
    rows = reached.select("node", "parent").collect()
    parents = {r["node"]: r["parent"] for r in rows}
    if target_id not in parents:
        return None
    path = [target_id]
    while path[-1] != source_id:
        p = parents.get(path[-1])
        if p is None:
            return None
        path.append(p)
    return list(reversed(path))
