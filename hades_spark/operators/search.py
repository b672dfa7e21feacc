"""Semantic-search query surface: the reference's ``hades db query`` cascade
(SURVEY §3.2) as one composable DataFrame pipeline.

Stages (each optional, score composition mirrors
``structural_fusion.py:85-102`` / ``database.py:1884-2268``):

1. candidate retrieval — broadcast query vector + cosine + top-k
   (``backend.py:288-344`` brute force; Catalyst runs the top-k as
   TakeOrderedAndProject);
2. hybrid re-rank — fused = 0.7 * semantic + 0.3 * keyword-overlap
   (``database.py:1884-1936``, weights from ``hades.yaml:100-105``);
3. decompose-merge — run per sub-query, keep max score per chunk + boost
   multi-query hits (``database.py:1998-2099``);
4. context enrichment — ±N adjacent chunks per hit via a window
   (``database.py:2161-2268`` restated as W1, no per-row queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.embedding import HashEmbedder
from ..functions.vector import cosine_col


def semantic_topk(
    embeddings: DataFrame,
    query_text: str,
    k: int = 10,
    id_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """-> id_cols + score, exact cosine top-k for one text query."""
    qv = HashEmbedder(dim).encode([query_text])[0].tolist()
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        embeddings
        .select(*id_cols, cosine_col(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), *[F.asc(c) for c in id_cols])
        .limit(k)
    )


def keyword_overlap_col(text_col, query_text: str):
    """Fraction of query terms present in the text (lowercased token hit
    rate) — the reference's TF-keyword blend signal."""
    terms = [t for t in query_text.lower().split() if t]
    if not terms:
        return F.lit(0.0)
    hits = None
    for t in terms:
        h = F.when(F.lower(text_col).contains(t), 1).otherwise(0)
        hits = h if hits is None else hits + h
    return hits / F.lit(float(len(terms)))


def hybrid_rerank(
    hits: DataFrame,
    chunks: DataFrame,
    query_text: str,
    alpha: float = 0.7,
    join_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
) -> DataFrame:
    """fused = alpha * semantic + (1 - alpha) * keyword-overlap."""
    joined = hits.join(chunks, list(join_cols))
    return (
        joined.withColumn(
            "fused_score",
            alpha * F.col("score")
            + (1 - alpha) * keyword_overlap_col(F.col("text"), query_text),
        )
        .orderBy(F.desc("fused_score"), *[F.asc(c) for c in join_cols])
    )


def decompose_merge(
    embeddings: DataFrame,
    sub_queries: list[str],
    k: int = 10,
    boost: float = 0.1,
    id_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
    dim: int = 64,
) -> DataFrame:
    """Per sub-query top-k, merged: max score per chunk + multi-hit boost
    (capped fused score, the reference's multi-query bonus)."""
    per = [
        semantic_topk(embeddings, q, k=k, id_cols=id_cols, dim=dim)
        .withColumn("q_idx", F.lit(i))
        for i, q in enumerate(sub_queries)
    ]
    allhits = per[0]
    for p in per[1:]:
        allhits = allhits.unionByName(p)
    return (
        allhits.groupBy(*id_cols)
        .agg(F.max("score").alias("score"),
             F.countDistinct("q_idx").alias("n_queries"))
        .withColumn(
            "merged_score",
            F.least(F.col("score") + boost * (F.col("n_queries") - 1),
                    F.lit(1.0)),
        )
        .orderBy(F.desc("merged_score"), *[F.asc(c) for c in id_cols])
        .limit(k)
    )


def with_context(
    hits: DataFrame,
    chunks: DataFrame,
    n_context: int = 1,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_index",
) -> DataFrame:
    """Attach ±n_context adjacent chunk texts per hit. One window over the
    chunks table + a semi-filtered join — NOT per-hit range queries (the
    reference runs two AQL queries per result; here it's one shuffle)."""
    w = Window.partitionBy(doc_col).orderBy(idx_col) \
        .rowsBetween(-n_context, n_context)
    ctx = chunks.select(
        doc_col, idx_col,
        F.collect_list("text").over(w).alias("context_texts"),
    )
    return hits.join(ctx, [doc_col, idx_col], "left")


def structural_rerank(
    hits: DataFrame,
    node_features: DataFrame,
    alpha: float = 0.7,
    join_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
    feature_col: str = "centrality",
    score_col: str = "score",
) -> DataFrame:
    """Structural-fusion re-rank (``structural_fusion.py:260-326``): blend a
    per-node structural signal (e.g. pairwise-similarity centrality, A6)
    into the retrieval score — fused = alpha*score + (1-alpha)*signal,
    missing signals contribute 0 (the reference's fallback)."""
    feats = F.broadcast(node_features)
    return (
        hits.join(feats, list(join_cols), "left")
        .withColumn(
            "structural_score",
            alpha * F.col(score_col)
            + (1 - alpha) * F.coalesce(F.col(feature_col), F.lit(0.0)),
        )
        .orderBy(F.desc("structural_score"), *[F.asc(c) for c in join_cols])
    )


def centrality_features(
    embeddings: DataFrame,
    group_col: str,
    id_cols: tuple[str, ...],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group pairwise-cosine centrality (``structural_fusion.py:289-304``):
    normalize rows, sims = E @ E.T, zero diagonal, row mean."""
    import numpy as np
    import pandas as pd

    out_schema = ", ".join(
        [f"{c} string" for c in id_cols] + ["centrality double"])

    def _cent(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        unit = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = unit @ unit.T
        np.fill_diagonal(sims, 0.0)
        cent = sims.sum(axis=1) / max(len(pdf) - 1, 1)
        data = {c: pdf[c].astype(str) for c in id_cols}
        data["centrality"] = cent
        return pd.DataFrame(data)

    return embeddings.groupBy(group_col).applyInPandas(_cent, out_schema)
