"""Structural node features — Weisfeiler-Lehman label refinement.

The reference attaches learned RGCN ``structural_embedding`` vectors to
nodes and re-ranks by them (``structural_fusion.py:105-180``; training in
``core/graph/train.py`` — out of correctness scope per SURVEY §2.10 X10).
The offline stand-in here is the classic deterministic alternative: WL
refinement (Weisfeiler-Leman 1968; public algorithm), where a node's label
summarizes its k-hop neighborhood structure — nodes with equal WL labels
are structurally indistinguishable at that depth. Iterations are plain
DataFrame joins/aggregations, fully SQL-expressible, and the resulting
labels plug into the same seams the learned embeddings use (J11
feature-fetch join, anchor re-rank, structural fusion).

Scale shape: each iteration is one shuffle (groupBy dst) + one broadcast-
free join; labels are fixed-width md5 hex (never unbounded neighbor
lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wl_labels(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """-> (node, wl_label) after ``iterations`` rounds of refinement.

    label_0(v)   = md5(degree(v))
    label_i+1(v) = md5(label_i(v) || '|' || sort(labels of neighbors))

    Undirected by default (edges symmetrized); ``directed=True`` refines
    over OUT-neighbors only (the AQL OUTBOUND view).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))) \
             .dropDuplicates(["s", "d"])
    e = e.cache()

    nodes = e.select(F.col("s").alias("node")) \
             .union(e.select(F.col("d").alias("node"))).distinct()

    degrees = e.groupBy("s").agg(F.count("*").alias("deg")) \
               .withColumnRenamed("s", "node")
    labels = (
        nodes.join(degrees, "node", "left")
        .select("node",
                F.md5(F.coalesce(F.col("deg"), F.lit(0)).cast("string"))
                 .alias("wl_label"))
    )

    for _ in range(iterations):
        nbr = (
            e.join(labels.withColumnRenamed("node", "d"), "d")
            .groupBy("s")
            .agg(F.concat_ws(
                ",", F.array_sort(F.collect_list("wl_label"))).alias("nl"))
            .withColumnRenamed("s", "node")
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.md5(F.concat_ws(
                    "|", F.col("wl_label"), F.coalesce("nl", F.lit(""))))
                 .alias("wl_label"),
            )
        )
        labels = labels.localCheckpoint(eager=True)

    e.unpersist()
    return labels


def wl_label_py(adjacency: dict, iterations: int = 2) -> dict:
    """Pure-python twin of ``wl_labels`` over {node: set(neighbors)}
    (undirected adjacency) — for tests."""
    import hashlib

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    labels = {n: md5(str(len(adjacency.get(n, ())))) for n in adjacency}
    for _ in range(iterations):
        nxt = {}
        for n in adjacency:
            nl = ",".join(sorted(labels[m] for m in adjacency.get(n, ())))
            nxt[n] = md5(f"{labels[n]}|{nl}")
        labels = nxt
    return labels


def negative_samples(
    edges: DataFrame,
    src_col: str = "src",
    rel_col: str = "rel",
    dst_col: str = "dst",
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Corrupted-tail negative samples for link-prediction training —
    ``k`` candidates per positive edge, tails drawn uniformly from the
    observed entity set by a SEEDED hash (reproducible across reruns
    and partitionings, the operators/sampling.py contract), with true
    edges filtered out (type-corrected negative sampling: a "negative"
    that exists in the graph is a false negative label).

    Returns ``(src, rel, dst_neg, neg_idx)``. Plan: the entity index is
    one distinct + one zipWithIndex-free ranking (a window over the
    ENTITY table, bounded by entity count, not edge count); candidates
    fan out k rows per edge narrowly; the index join shuffles on the
    uniform hash-derived index; the truth filter is one anti-join on
    (src, rel, dst). Collisions with the true tail or duplicate draws
    are dropped (not resampled) — the standard contract; callers
    oversample k accordingly.
    """
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(rel_col).alias("rel"),
                     F.col(dst_col).alias("dst"))
    ents = (
        e.select(F.col("src").alias("ent"))
        .unionByName(e.select(F.col("dst").alias("ent")))
        .distinct()
    )
    # dense 0-based index ordered by ent, WITHOUT a global single-task
    # window (W.orderBy with no partitionBy sorts every entity in one
    # task — an OOM at web-scale entity counts): range-partition by ent,
    # rank within each (ordered) range, and add per-partition offsets.
    # Range partitions are themselves ordered by ent, so offset + local
    # rank reproduces the global row_number exactly, in parallel.
    d = (ents.repartitionByRange(F.col("ent"))
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    sizes = sorted((r["pid"], r["n"]) for r in
                   d.groupBy("pid").agg(F.count("*").alias("n")).collect())
    offsets, acc = [], 0
    for pid, cnt in sizes:
        offsets.append((pid, acc))
        acc += cnt
    n = acc
    from ..functions.localdf import arrow_local_df

    off_df = arrow_local_df(e.sparkSession, offsets, "pid int, _off long")
    idx = (
        d.withColumn("rk", F.row_number().over(
            W.partitionBy("pid").orderBy("ent")))
        .join(F.broadcast(off_df), "pid")
        .select("ent", (F.col("_off") + F.col("rk") - 1).alias("_i"))
    )

    cand = (
        e.select("src", "rel", "dst",
                 F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                  .alias("neg_idx"))
        .withColumn("_i", F.pmod(
            F.xxhash64("src", "rel", "dst", "neg_idx", F.lit(seed)),
            F.lit(n)))
    )
    # index join: broadcast only when the entity count is verifiably
    # small (the count is already paid above); web-scale entity sets take
    # a plain shuffle equi-join on the uniform index key instead of
    # forcing an over-cap broadcast
    idx_b = F.broadcast(idx) if n <= 1_000_000 else idx
    neg = (
        cand.join(idx_b, "_i")
        .select("src", "rel", F.col("ent").alias("dst_neg"), "neg_idx",
                "dst")
        .where(F.col("dst_neg") != F.col("dst"))
    )
    truth = e.select("src", "rel", F.col("dst").alias("dst_neg")).distinct()
    return (
        neg.join(truth, ["src", "rel", "dst_neg"], "anti")
        .select("src", "rel", "dst_neg", "neg_idx")
        .distinct()
    )


def random_walks(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    walks_per_node: int = 2,
    length: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Deterministic DeepWalk-style random walks — the training-corpus
    generator for skip-gram graph embeddings (Perozzi et al. 2014),
    with the seeded-hash determinism contract of operators/sampling.py:
    the same (graph, seed) yields the same walks on any cluster layout.

    Each node starts ``walks_per_node`` walks of up to ``length`` steps;
    at each step the next hop is the neighbor at rank ``pmod(
    xxhash64(cur, walk_id, step, seed), degree)`` in the (src-ordered)
    adjacency ranking. Walks truncate at sink nodes (no outgoing edge).
    Returns ``(start, walk_id, path)`` with ``path`` an array of node
    ids, ``path[0] == start``.

    Plan shape: adjacency ranking is ONE window over the edge table
    partitioned by src (per-node degree bounded); each step is one
    equi-join of the frontier against the ranked adjacency on
    (cur, rank) — ``length`` joins total, frontier keyed on the hash-
    uniform current node. No collects, no Python.
    """
    from pyspark.sql import Window as W

    if walks_per_node < 1 or length < 1:
        raise ValueError("walks_per_node and length must be >= 1")
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    ranked = e.withColumn(
        "_r", F.row_number().over(
            W.partitionBy("_s").orderBy("_d")) - 1)
    deg = ranked.groupBy("_s").agg(F.max("_r").alias("_maxr"))
    adj = ranked.join(deg, "_s").select(
        "_s", "_d", "_r", (F.col("_maxr") + 1).alias("_deg"))

    nodes = e.select(F.col("_s").alias("n")).unionByName(
        e.select(F.col("_d").alias("n"))).distinct()
    frontier = nodes.select(
        F.col("n").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1)))
         .alias("walk_id"),
        F.col("n").alias("_cur"),
        F.array(F.col("n")).alias("path"))

    for step in range(length):
        pick = F.pmod(
            F.xxhash64("_cur", "walk_id", F.lit(step), F.lit(seed)),
            F.col("_deg"))
        nxt = (
            frontier.join(adj, frontier["_cur"] == adj["_s"], "left")
            .where(F.col("_s").isNull() | (F.col("_r") == pick))
            .select(
                "start", "walk_id",
                F.coalesce("_d", F.lit(None)).alias("_cur2"),
                F.when(F.col("_d").isNotNull(),
                       F.concat("path", F.array("_d")))
                 .otherwise(F.col("path")).alias("path"))
        )
        frontier = nxt.select(
            "start", "walk_id",
            F.coalesce("_cur2", F.element_at("path", -1)).alias("_cur"),
            "path")
        # sink walks carry forward unchanged; rejoining them is a no-op
    return frontier.select("start", "walk_id", "path")
