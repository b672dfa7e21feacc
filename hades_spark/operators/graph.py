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
    stop_at=None,
    broadcast_max_rows: int = 1_000_000,
    _mode_log: list | None = None,
) -> DataFrame:
    """-> (node, depth[, parent]) with depth = first-reach distance from any
    seed (seeds at depth 0). Frontier-expansion loop, one shuffle-free
    broadcast join per level. ``direction`` mirrors AQL OUTBOUND / INBOUND /
    ANY; ``track_parent=True`` records the (deterministic min) predecessor
    per node so paths can be reconstructed. ``stop_at`` is the early-exit
    target: the level loop breaks as soon as that node enters the visited
    set (one cheap probe per level over the just-checkpointed frontier) —
    on a power-law web graph the levels PAST the hit are the expensive
    ones.

    ``broadcast_frontier`` is ADAPTIVE, not absolute: a depth-2 frontier
    on a web graph can exceed what any executor can hold, so each level
    broadcasts only while the (already-materialized, so the count is a
    metadata read) frontier stays within ``broadcast_max_rows``; past
    that the level falls back to a shuffle hash join on the node key —
    the same size-gated policy the linking/canonicalize operators use."""
    e = _oriented(edges, src, dst, direction)
    visited = seeds.select(F.col(node).alias("node")).distinct() \
                   .withColumn("depth", F.lit(0))
    if track_parent:
        visited = visited.withColumn(
            "parent", F.lit(None).cast(visited.schema["node"].dataType))
    frontier = visited.localCheckpoint(eager=True)
    frontier_rows = frontier.count()
    visited = frontier
    if stop_at is not None and not \
            visited.filter(F.col("node") == F.lit(stop_at)).isEmpty():
        return visited  # target is a seed: depth 0, nothing to expand

    for d in range(1, max_depth + 1):
        use_broadcast = (broadcast_frontier
                         and frontier_rows <= broadcast_max_rows)
        if _mode_log is not None:  # test/diagnostic hook
            _mode_log.append("broadcast" if use_broadcast else "shuffle")
        f = F.broadcast(frontier) if use_broadcast else frontier
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
        frontier_rows = nxt.count()
        if frontier_rows == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        # probe the just-CHECKPOINTED visited set (probing nxt would
        # re-run this level's joins from the previous checkpoint; the
        # target is newly present iff it arrived via nxt)
        if stop_at is not None and not \
                visited.filter(F.col("node") == F.lit(stop_at)).isEmpty():
            break

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
    """Unweighted shortest-path length source -> target, or None. Early
    exit: the BFS stops at the level where the target is first reached
    (``stop_at``), never expanding past the hit."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(source_id,)], ["node"])
    reached = bfs(edges, seeds, max_depth, src=src, dst=dst,
                  direction=direction, stop_at=target_id)
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
    ``max_depth``. BFS with parent tracking + early exit; the walk-back is
    DISTRIBUTED: ≤ depth one-row lookups against the checkpointed reached
    set (each node appears once), never a collect of the full reached set —
    a depth-4 BFS from one seed on a web graph can reach 10^7+ nodes,
    which must not land on the driver."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(source_id,)], ["node"])
    reached = bfs(edges, seeds, max_depth, src=src, dst=dst,
                  direction=direction, track_parent=True,
                  stop_at=target_id)
    hit = reached.filter(F.col("node") == F.lit(target_id)) \
                 .select("parent").collect()
    if not hit:
        return None
    path = [target_id]
    parent = hit[0]["parent"]
    while parent is not None:
        path.append(parent)
        if parent == source_id:
            break
        nxt = reached.filter(F.col("node") == F.lit(parent)) \
                     .select("parent").collect()
        parent = nxt[0]["parent"] if nxt else None
    return list(reversed(path)) if path[-1] == source_id else None


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 10,
    damping: float = 0.85,
    dangling: str = "redistribute",
    checkpoint_every: int = 4,
) -> DataFrame:
    """-> (node, rank) after ``iterations`` synchronous power iterations
    of PageRank with damping ``damping`` over the distinct directed edge
    set. ``dangling='redistribute'`` (textbook: sinks' mass spreads
    uniformly, ranks sum to 1 every iteration) or ``'ignore'`` (sink mass
    leaks — the cheaper variant some engines ship).

    The reference stores its KG in ArangoDB, whose graph API exposes
    centrality over the edge collections; here the analytics consumer of
    the materialized (subj, pred, obj) edges is a pure DataFrame loop:

    - edges are deduped, degree-annotated, repartitioned by ``src`` and
      persisted ONCE — every iteration's contribution join reuses that
      partitioning, so only the (node, rank) frame (tiny relative to a
      web-scale edge table) moves per round;
    - per-iteration cost is one join on src + one map-side-combinable
      groupBy(dst) sum — the minimal two-shuffle shape;
    - the rank frame is ``localCheckpoint``-ed every ``checkpoint_every``
      rounds: without lineage truncation the plan doubles per iteration
      and the driver dies on plan compilation long before data does;
    - dangling mass is a one-row aggregate cross-joined back (broadcast
      of a scalar), not a driver collect, so the loop stays lazy apart
      from the checkpoints and the node count.
    """
    if dangling not in ("redistribute", "ignore"):
        raise ValueError(f"dangling must be redistribute/ignore: {dangling}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1 (lineage truncation is what "
            f"keeps the iterated plan compilable): {checkpoint_every}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")) \
             .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull()) \
             .dropDuplicates(["_s", "_d"])
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    # persist (NOT localCheckpoint): InMemoryTableScan advertises the
    # cached plan's outputPartitioning, so the per-iteration join reuses
    # the one-time repartition("_s") — a checkpointed RDD scan reports
    # UnknownPartitioning and Spark would re-exchange the (web-scale) edge
    # table EVERY round (measured)
    ed = e.join(deg, "_s").repartition("_s").persist()
    ed.count()
    sinks = nodes.join(deg.withColumnRenamed("_s", "node"),
                       "node", "left_anti").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "_s"), "_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit(base)
                     + F.lit(damping) * F.coalesce("_in", F.lit(0.0))
                     ).alias("rank"))
        )
        if dangling == "redistribute":
            sink_mass = (
                ranks.join(sinks, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_sm"))
            )
            nxt = nxt.crossJoin(F.broadcast(sink_mass)).select(
                "node",
                (F.col("rank")
                 + F.lit(damping) * F.col("_sm") / n).alias("rank"))
        ranks = nxt
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    ranks = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    return ranks


def weighted_shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node: str = "node",
) -> DataFrame:
    """-> (node, distance): minimum path weight from any seed within
    ``max_hops`` edges — synchronous Bellman-Ford rounds (the weighted
    companion to ``bfs``; AQL exposes the same shape as
    ``SHORTEST_PATH ... OPTIONS {weightAttribute}``).

    Parallel edges collapse to their minimum weight first (a cheaper path
    can never come from a heavier duplicate). Each round is one join on
    the current distance frontier (edges pre-partitioned by ``src`` and
    persisted once, so only the distance frame moves) + one min-combine
    groupBy — both map-side combinable, the pagerank shuffle shape.
    Distances are checkpoint-truncated per round: ``max_hops`` compounded
    joins otherwise double the plan each round.

    Negative weights are allowed BY the relaxation (it is Bellman-Ford),
    but with bounded hops the result is then "cheapest ≤ max_hops-hop
    path", not a shortest-path fixpoint; no negative-cycle detection.
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"),
                     F.col(weight).cast("double").alias("_w"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull()
                & F.col("_w").isNotNull())
        .groupBy("_s", "_d").agg(F.min("_w").alias("_w"))
        .repartition("_s")
        # persist keeps outputPartitioning visible to every round's join;
        # a localCheckpoint would force a re-exchange of the edge table
        # per round (see pagerank)
        .persist()
    )
    e.count()
    dist = seeds.select(F.col(node).alias("node"),
                        F.lit(0.0).alias("distance")) \
        .dropDuplicates(["node"]).localCheckpoint(eager=True)
    for _ in range(max_hops):
        relax = dist.join(e, dist["node"] == e["_s"]).select(
            F.col("_d").alias("node"),
            (F.col("distance") + F.col("_w")).alias("distance"))
        dist = (
            dist.unionByName(relax)
            .groupBy("node").agg(F.min("distance").alias("distance"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return dist


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
    include_self: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """-> (node, label) after ``iterations`` SYNCHRONOUS label-propagation
    rounds over the undirected (symmetrized, deduped) edge set — community
    detection over the materialized KG edges (the consumer the reference
    serves from ArangoDB's graph API; cf. GraphFrames' labelPropagation).

    Fully deterministic, unlike classic random-order LPA: every round each
    node adopts the most frequent label among its neighbors (plus one vote
    for its own current label when ``include_self`` — damps the 2-cycle
    oscillation synchronous LPA exhibits on bipartite structures), ties
    broken to the LEXICOGRAPHICALLY SMALLEST label. Determinism is what
    makes the unrolled-CTE DuckDB oracle possible.

    Scale shape mirrors ``pagerank``: the symmetrized edge table is
    repartitioned by source and ``persist``-ed once (InMemoryTableScan
    keeps the partitioning visible — a localCheckpoint would re-exchange
    the web-scale edge table every round), so each round moves only the
    (node, label) frame: one join + one map-side-combinable vote count +
    one argmax agg. The argmax is ``min(struct(-cnt, label))`` — no window,
    no extra shuffle beyond the vote groupBy.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0: {iterations}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1: {checkpoint_every}")
    d = edges.select(F.col(src).cast("string").alias("_s"),
                     F.col(dst).cast("string").alias("_d")) \
             .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
    sym = (
        d.unionByName(d.select(F.col("_d").alias("_s"),
                               F.col("_s").alias("_d")))
        .filter(F.col("_s") != F.col("_d"))    # self-loops add no signal
        .dropDuplicates(["_s", "_d"])
        .repartition("_s")
        .persist()
    )
    sym.count()
    labels = sym.select(F.col("_s").alias("node")).dropDuplicates(["node"]) \
                .withColumn("label", F.col("node")) \
                .localCheckpoint(eager=True)
    for i in range(iterations):
        votes = (
            sym.join(labels.withColumnRenamed("node", "_s"), "_s")
               .select(F.col("_d").alias("node"), "label")
        )
        if include_self:
            votes = votes.unionByName(labels)
        nxt = (
            votes.groupBy("node", "label").agg(F.count("*").alias("_cnt"))
            .groupBy("node")
            .agg(F.min(F.struct((-F.col("_cnt")).alias("nc"),
                                F.col("label").alias("l"))).alias("_m"))
            .select("node", F.col("_m.l").alias("label"))
        )
        labels = (nxt.localCheckpoint(eager=True)
                  if (i + 1) % checkpoint_every == 0 or i == iterations - 1
                  else nxt)
    sym.unpersist()
    return labels


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> one row ``(n_triangles)``: exact triangle count of the
    undirected simple graph (self-loops, NULLs, duplicate/reversed edges
    dropped). Degree-ordered orientation (Ortmann & Brandes / the
    classic compact-forward scheme): every edge points from the
    (degree, node)-smaller endpoint to the larger, so each triangle is
    generated exactly once as a wedge at its smallest vertex and the
    wedge join's fan-out is bounded by the ORIENTED out-degree —
    O(sqrt(m)) on any graph — instead of the raw degree. That turns the
    hub problem (a 10^6-degree node squaring into 10^12 wedge rows) into
    an O(m^1.5) bound: the shape that survives a web-scale host graph.
    Three shuffles total: degree groupBy, wedge self-join on the apex,
    closing-edge semi-join on the (v, w) pair.
    """
    und = undirected_edges(edges, src, dst).select(
        F.col("a").alias("_a"), F.col("b").alias("_b"))
    deg = (
        und.select(F.col("_a").alias("node"))
           .unionByName(und.select(F.col("_b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("_deg"))
    )
    da = deg.select(F.col("node").alias("_a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("node").alias("_b"), F.col("_deg").alias("_db"))
    ed = und.join(da, "_a").join(db, "_b")
    fwd = F.struct("_da", "_a") < F.struct("_db", "_b")
    o = ed.select(
        F.when(fwd, F.col("_a")).otherwise(F.col("_b")).alias("u"),
        F.when(fwd, F.col("_b")).otherwise(F.col("_a")).alias("v"),
        F.when(fwd, F.col("_db")).otherwise(F.col("_da")).alias("dv"),
    )
    w1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1"))
    w2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = w1.join(w2, "u").filter(
        F.struct("d1", "v1") < F.struct("d2", "v2"))
    closed = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"], "left_semi")
    return closed.agg(F.count("*").alias("n_triangles"))


def undirected_edges(edges: DataFrame, src_col: str = "src",
                     dst_col: str = "dst") -> DataFrame:
    """Canonical undirected simple-edge set: NULL endpoints and self
    loops dropped, (least, greatest) ordering, duplicates collapsed —
    THE single copy of the normalization triangle_count and kcore_peel
    both need (drift between hand-rolled copies was a review finding).
    """
    return (edges.select(F.col(src_col).alias("a"),
                         F.col(dst_col).alias("b"))
            .where(F.col("a").isNotNull() & F.col("b").isNotNull())
            .where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b")).distinct())


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling (the bounded-hop Bellman-Ford convention):
    ``rounds`` synchronous iterations of "drop every node whose degree
    in the SURVIVING subgraph is < k". After enough rounds this is the
    exact k-core; with bounded rounds it is a superset that shrinks
    monotonically (long degree-1 chains peel one link per round —
    callers size ``rounds`` to the diameter they care about, and the
    fixed bound is what makes the computation independently
    re-derivable round by round).

    Returns ``(node, degree)`` for surviving nodes with their final
    in-subgraph degree. Each round is one combinable degree count + one
    semi-join — no window; the edge table re-filters by the surviving
    node set per round (frontier semantics, lineage truncated every 4
    rounds).
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    cur = undirected_edges(edges, src_col, dst_col)
    for r in range(rounds):
        deg = (cur.select(F.col("a").alias("n"))
               .unionByName(cur.select(F.col("b").alias("n")))
               .groupBy("n").agg(F.count("*").alias("d")))
        keep = deg.where(F.col("d") >= k).select("n")
        cur = (cur.join(keep.select(F.col("n").alias("a")), "a", "semi")
                  .join(keep.select(F.col("n").alias("b")), "b", "semi"))
        if (r + 1) % 4 == 0:
            cur = cur.localCheckpoint()
    deg = (cur.select(F.col("a").alias("node"))
           .unionByName(cur.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("degree")))
    return deg.where(F.col("degree") >= k)
