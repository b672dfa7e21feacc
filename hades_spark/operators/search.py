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

import pandas as pd
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
    """-> id_cols + score, exact cosine top-k for one text query. The
    query vector joins in via a broadcast one-row frame (no per-dim plan
    literals)."""
    from .similarity import query_vec_frame

    qv = HashEmbedder(dim).encode([query_text])[0].tolist()
    q = query_vec_frame(embeddings, qv)
    return (
        embeddings.join(q)
        .select(*id_cols, cosine_col(F.col(vec_col), F.col("_qv")).alias("score"))
        .orderBy(F.desc("score"), *[F.asc(c) for c in id_cols])
        .limit(k)
    )


def keyword_overlap_col(text_col, query_text: str):
    """Fraction of query terms present in the text as WHOLE TOKENS
    (lowercased) — the reference's TF-keyword blend signal. Token
    membership, not substring contains: 'is' must not match 'this', or
    short function words make the keyword component pure noise."""
    terms = [t for t in query_text.lower().split() if t]
    if not terms:
        return F.lit(0.0)
    toks = F.split(F.lower(text_col), r"\s+")
    hits = None
    for t in terms:
        h = F.when(F.array_contains(toks, t), 1).otherwise(0)
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


_SPLIT_PATTERNS = (
    r"\s+and\s+", r"\s+or\s+", r"\s+with\s+", r"\s+vs\.?\s+",
    r"\s+versus\s+", r",\s*", r";\s*",
)


def decompose_query(query: str) -> list[str]:
    """Rule-based compound-query splitting (X9;
    ``database.py:1939-1995``): split on conjunctions/punctuation in
    pattern order, strip, drop short single words, dedupe
    case-insensitively, fall back to the original query."""
    import re

    query = " ".join(query.split())
    sub_queries = [query]
    for pattern in _SPLIT_PATTERNS:
        new_subs: list[str] = []
        for sq in sub_queries:
            new_subs.extend(re.split(pattern, sq, flags=re.IGNORECASE))
        sub_queries = new_subs

    cleaned: list[str] = []
    seen: set[str] = set()
    for sq in sub_queries:
        sq = sq.strip()
        if not sq or (len(sq.split()) == 1 and len(sq) < 4):
            continue
        low = sq.lower()
        if low not in seen:
            seen.add(low)
            cleaned.append(sq)
    return cleaned or [query]


def decompose_merge(
    embeddings: DataFrame,
    sub_queries: list[str],
    k: int = 10,
    boost: float = 0.1,
    id_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
    dim: int = 64,
) -> DataFrame:
    """Per sub-query top-k, merged: max score per chunk + multi-hit boost
    (capped fused score, the reference's multi-query bonus).

    ONE scan of the embeddings table regardless of sub-query count: all Q
    query vectors are scored in a single select (array of cosines +
    posexplode), then one window ranks per-query top-k — instead of Q
    separate scans + unions."""
    qvs = [HashEmbedder(dim).encode([q])[0].tolist() for q in sub_queries]
    score_arr = F.array(*[
        cosine_col(F.col("embedding"),
                   F.array(*[F.lit(float(x)) for x in qv]))
        for qv in qvs
    ])
    scored = embeddings.select(
        *id_cols, F.posexplode(score_arr).alias("q_idx", "score"))
    w = Window.partitionBy("q_idx").orderBy(
        F.desc("score"), *[F.asc(c) for c in id_cols])
    topk = scored.withColumn("rn", F.row_number().over(w)) \
                 .filter(F.col("rn") <= k).drop("rn")
    return (
        topk.groupBy(*id_cols)
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
    """Attach ±n_context adjacent chunk texts per hit. The chunks table is
    first SEMI-JOINED to the hit documents, then one window runs over that
    slice — NOT per-hit range queries (the reference runs two AQL queries
    per result) and NOT a window over the full corpus (collect_list of
    every chunk's text for 10 hits would shuffle the whole table)."""
    hit_docs = F.broadcast(hits.select(doc_col).dropDuplicates([doc_col]))
    sliced = chunks.join(hit_docs, doc_col, "left_semi")
    w = Window.partitionBy(doc_col).orderBy(idx_col) \
        .rowsBetween(-n_context, n_context)
    ctx = sliced.select(
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


def anchor_rerank(
    hits: DataFrame,
    embeddings: DataFrame,
    anchor_id,
    alpha: float = 0.6,
    join_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Re-rank by similarity to a user-named anchor node
    (``structural_fusion.py:334-400``): fused = alpha * score +
    (1-alpha) * max(0, cos(result, anchor)); results without an embedding
    contribute 0 (the reference's fallback). If the anchor has no
    embedding, hits pass through unchanged except for zero columns.

    The anchor lookup is a point query (one row collected); result vectors
    come from a broadcast-joined slice of the embeddings table — no
    per-result queries.
    """
    anchor_rows = (
        embeddings.filter(F.col(id_col) == F.lit(anchor_id))
        # deterministic pick when the anchor id matches several rows
        # (e.g. one row per chunk of the anchor doc): smallest join key
        .orderBy(*[F.asc(c) for c in join_cols])
        .select(vec_col).limit(1).collect()
    )
    if not anchor_rows or anchor_rows[0][0] is None:
        return (
            hits.withColumn("anchor_similarity", F.lit(0.0))
            .withColumn("anchor_fused_score", F.col(score_col))
        )
    from .similarity import query_vec_frame

    av = [float(x) for x in anchor_rows[0][0]]
    # the anchor vector rides a broadcast ONE-ROW frame, same as every
    # other query-vector path (at the reference's 2048 dims, per-dim
    # F.lit literals bloat codegen)
    avf = query_vec_frame(embeddings, av, col="_av")
    # score ONLY the hit rows' vectors (semi-join first): broadcasting a
    # projection of the full embeddings table would ship N rows to every
    # executor; this ships at most |hits|
    vecs = (
        embeddings.join(hits.select(*join_cols).dropDuplicates(
            list(join_cols)), list(join_cols), "left_semi")
        .join(avf)
        .select(*join_cols,
                cosine_col(F.col(vec_col), F.col("_av"))
                .alias("_anchor_sim"))
    )
    return (
        hits.join(F.broadcast(vecs), list(join_cols), "left")
        .withColumn(
            "anchor_similarity",
            F.round(F.coalesce(F.col("_anchor_sim"), F.lit(0.0)), 4))
        .drop("_anchor_sim")
        .withColumn(
            "anchor_fused_score",
            F.round(
                alpha * F.col(score_col)
                + (1 - alpha) * F.greatest(F.lit(0.0),
                                           F.col("anchor_similarity")), 4))
        .orderBy(F.desc("anchor_fused_score"),
                 *[F.asc(c) for c in join_cols])
    )


def _default_pair_scorer(pairs):
    """Deterministic stand-in for a cross-encoder's (query, passage) batch
    scorer: token-interaction score = weighted overlap of query terms with
    passage positions (earlier hits score higher) — NOT a trained model
    (sentence_transformers is unavailable in this environment; inject a
    real model's ``predict`` via ``scorer``). Same batch-in/scores-out
    contract as ``CrossEncoder.predict``."""
    out = []
    for q, passage in pairs:
        terms = [t for t in q.lower().split() if t]
        toks = passage.lower().split()
        pos = {t: i for i, t in enumerate(reversed(toks))}
        n = max(len(toks), 1)
        s = 0.0
        for t in terms:
            if t in pos:
                s += 0.5 + 0.5 * (pos[t] + 1) / n  # earlier => higher
        out.append(s / max(len(terms), 1))
    return out


def crossencoder_rerank(
    hits: DataFrame,
    query_text: str,
    limit: int | None = 10,
    text_col: str = "text",
    join_cols: tuple[str, ...] = ("doc_id", "chunk_index"),
    scorer=None,
) -> DataFrame:
    """Cross-encoder stage shape (``database.py:2102-2158``): score
    (query, passage) pairs TOGETHER in Arrow batches, sort by the pair
    score, cut to ``limit``. ``scorer`` is the model seam — a callable
    ``list[(q, passage)] -> list[float]``; the default is a deterministic
    lexical-interaction stand-in (documented stub). ``limit=None`` scores
    without the order/cut (NEVER pass a huge sentinel limit instead:
    TakeOrderedAndProject eagerly allocates a limit-sized top-k buffer
    per partition)."""
    score_fn = scorer or _default_pair_scorer

    @F.pandas_udf("double")
    def _pair_score(texts: pd.Series) -> pd.Series:
        return pd.Series(
            score_fn([(query_text, t or "") for t in texts]))

    scored = hits.withColumn(
        "cross_encoder_score",
        F.round(_pair_score(F.col(text_col)), 4))
    if limit is None:
        return scored
    return (
        scored
        .orderBy(F.desc("cross_encoder_score"),
                 *[F.asc(c) for c in join_cols])
        .limit(limit)
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

    # keep the ids' ORIGINAL dtypes so downstream equi-joins don't need
    # casts (a string '3' vs int 3 join key is a silent trap)
    in_types = dict(embeddings.dtypes)
    out_schema = ", ".join(
        [f"{c} {in_types[c]}" for c in id_cols] + ["centrality double"])

    def _cent(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        unit = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = unit @ unit.T
        np.fill_diagonal(sims, 0.0)
        cent = sims.sum(axis=1) / max(len(pdf) - 1, 1)
        data = {c: pdf[c] for c in id_cols}
        data["centrality"] = cent
        return pd.DataFrame(data)

    return embeddings.groupBy(group_col).applyInPandas(_cent, out_schema)


def rrf_fuse(rankings, id_col: str = "doc_id", k: int = 60,
             score_col: str = "score"):
    """Reciprocal-rank fusion (Cormack et al. 2009) — THE standard way
    to merge heterogeneous retrieval lists (BM25 + dense + priors)
    without score calibration: ``rrf = sum_lists 1 / (k + rank)`` with
    ranks from each list's own (score desc, id asc) order. Items missing
    from a list simply contribute nothing (no imputation).

    ``rankings`` is a list of DataFrames each carrying ``id_col`` and
    ``score_col``. Result: ``id_col, rrf_score, n_lists`` ordered-ready
    (callers sort/limit). The rank windows run over the top-k RESULT
    LISTS (tens of rows), never the corpus — fusion cost is O(sum of
    list lengths).
    """
    from pyspark.sql import Window as W

    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = []
    for df in rankings:
        w = W.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        parts.append(df.select(
            id_col,
            (F.lit(1.0) / (F.lit(k) + F.row_number().over(w)))
            .alias("_contrib")))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (allp.groupBy(id_col)
            .agg(F.sum("_contrib").alias("rrf_score"),
                 F.count("*").alias("n_lists")))
