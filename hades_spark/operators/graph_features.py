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
    idx = ents.select(
        "ent",
        (F.row_number().over(W.orderBy("ent")) - 1).alias("_i"))
    n = idx.count()

    cand = (
        e.select("src", "rel", "dst",
                 F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                  .alias("neg_idx"))
        .withColumn("_i", F.pmod(
            F.xxhash64("src", "rel", "dst", "neg_idx", F.lit(seed)),
            F.lit(n)))
    )
    neg = (
        cand.join(F.broadcast(idx), "_i")
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
