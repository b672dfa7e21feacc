"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k for one query vector. JVM-side
  score expression + orderBy/limit, which Catalyst executes as
  TakeOrderedAndProject (no global sort, map-side partial top-k) — the
  Spark restatement of the reference's brute-force path
  (``backend.py:288-344``).
- ``topk_join``: exact top-k for MANY queries — grouped pandas matmul
  (one BLAS call per (query-block x candidate-partition)), then a window
  rank to keep k per query. The many-to-many linking primitive.
- ``lsh_topk_join``: the scale path — deterministic random-hyperplane
  signatures bucket candidates so each query only scores its bucket
  (IVF-style candidate pruning); exact cosine rescoring inside buckets.
- ``neardup_pairs``: embedding-cosine near-duplicate pairs above a
  threshold, blocked by LSH signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vector import cosine_col


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = None,
) -> DataFrame:
    """-> (id, score) exact cosine top-k for a single query vector.

    The query vector rides a broadcast ONE-ROW frame (not ``dim`` literal
    expressions in the plan — at the reference's 2048 dims that bloats
    codegen); the broadcast single-row join is map-side, and orderBy+limit
    still compiles to TakeOrderedAndProject."""
    q = query_vec_frame(embeddings, query_vec)
    score = cosine_col(F.col(vec_col), F.col("_qv"))
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    return (
        embeddings.join(q)
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def query_vec_frame(df: DataFrame, vec, col: str = "_qv"):
    """Broadcast one-row frame carrying a query vector as a single array
    value — join it (map-side) instead of inlining dim literals."""
    spark = df.sparkSession
    from ..functions.localdf import arrow_local_df

    return F.broadcast(arrow_local_df(
        spark, [([float(x) for x in vec],)], f"{col} array<double>"))


def _vstack_nullsafe(series, dim: int | None = None) -> np.ndarray:
    """Stack array cells into a matrix, mapping NULL cells to zero vectors
    (zero norm => cosine 0.0) instead of crashing the task — one bad row
    must never kill a web-scale join (O11)."""
    d = dim
    if d is None:
        d = next((len(v) for v in series if v is not None), 0)
    out = np.zeros((len(series), d), dtype=np.float32)
    for i, v in enumerate(series):
        if v is not None:
            out[i, : min(len(v), d)] = np.asarray(
                v, dtype=np.float32)[:d]
    return out


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.asarray(
        np.random.RandomState(seed).standard_normal((n_planes, dim)),
        dtype=np.float32,
    )


def signature_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Deterministic random-hyperplane (SimHash-for-vectors) signature."""

    @F.pandas_udf("int")
    def _sig(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes = _hyperplanes(dim, n_planes, seed)
        for s in batches:
            mat = _vstack_nullsafe(s, dim)
            bits = (mat @ planes.T) > 0
            vals = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.Series(vals.astype("int32"))

    return _sig


def topk_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k per query over all candidates: broadcast the (smaller)
    query side, score with a grouped pandas matmul, window-rank to k.

    -> (q_id, c_id, score, rank)
    """
    q = queries.select(F.col(q_id).alias("_qid"), F.col(q_vec).alias("_qv"))
    if broadcast_queries:
        q = F.broadcast(q)
    joined = candidates.select(
        F.col(c_id).alias("_cid"), F.col(c_vec).alias("_cv")
    ).join(q)  # cartesian with broadcast side: map-side only, no shuffle

    @F.pandas_udf("double")
    def _cos(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            d = next((len(v) for v in a if v is not None),
                     next((len(v) for v in b if v is not None), 0))
            ma = _vstack_nullsafe(a, d)
            mb = _vstack_nullsafe(b, d)
            num = np.einsum("ij,ij->i", ma, mb)
            den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            out = np.where(den > 0, num / np.maximum(den, 1e-30), 0.0)
            yield pd.Series(out)

    scored = joined.withColumn("score", _cos("_cv", "_qv"))
    w = Window.partitionBy("_qid").orderBy(F.desc("score"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(q_id), F.col("_cid").alias(c_id),
                "score", "rank")
    )


def lsh_matched_candidates(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    n_planes: int = 10,
    n_tables: int = 8,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """The multi-table LSH BLOCKING stage on its own: -> (_qid, _qv,
    _cid, _cv) pairs sharing a hyperplane bucket in >=1 table, deduped.
    Split out of ``lsh_topk_join`` so the ANN bench can measure the
    candidate-set size (cost) separately from recall.

    ``broadcast_queries=False`` falls back to a shuffle join on
    (table, bucket) for large query sides — the broadcast replicates the
    query rows ``n_tables`` times, so corpus-vs-corpus linking (queries
    as big as the corpus) must NOT broadcast (mirrors
    ``topk_join(broadcast_queries=...)``)."""
    def with_buckets(df, id_alias, vec_alias, idc, vecc):
        out = None
        for t in range(n_tables):
            sig = signature_udf(dim, n_planes, seed=7 + 1000 * t)
            part = df.select(F.col(idc).alias(id_alias),
                             F.col(vecc).alias(vec_alias)) \
                     .withColumn("table", F.lit(t)) \
                     .withColumn("bucket", sig(F.col(vec_alias)))
            out = part if out is None else out.unionByName(part)
        return out

    qs = with_buckets(queries, "_qid", "_qv", q_id, q_vec)
    cs = with_buckets(candidates, "_cid", "_cv", c_id, c_vec)
    # the query side is usually the small side (a query batch vs a
    # corpus) — hint it explicitly: without the hint Spark's estimator
    # has no stats for the mapInPandas/union candidate side and can pick
    # IT for broadcast, collecting the corpus' bucket rows to the driver
    # (observed at 1M vectors x 4 tables: a ~1 GiB broadcast build that
    # dies on spark.driver.maxResultSize)
    if broadcast_queries:
        qs = F.broadcast(qs)
    return cs.join(qs, ["table", "bucket"]) \
             .dropDuplicates(["_qid", "_cid"])


def lsh_topk_join(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 8,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    broadcast_queries: bool = True,
    exact_rescue: bool = False,
) -> DataFrame:
    """Approximate top-k: queries only score candidates sharing a
    hyperplane-signature bucket in at least one of ``n_tables`` independent
    hash tables (standard multi-table LSH: recall compounds as
    1-(1-p^planes)^tables while each table's bucket join stays cheap).
    Recall rises with fewer planes / more tables; cost falls the other way.
    At 100 TB this is the join that keeps ANN from being a full cross
    product — (table, bucket) is the shuffle key, both sides prune to
    matching buckets, and a candidate matched in several tables is scored
    once (dropDuplicates before scoring).

    Defaults (10 planes x 8 tables) come from the measured 1M-vector
    sweep (BENCH/BASELINE.md §ANN, round 4): recall@10 >= 0.9 against
    the exact baseline while scoring ~1-2% of the corpus per query; the
    old single-table 8-plane default measured ~0.3-0.6 recall.

    ``exact_rescue=True`` guarantees every query returns
    min(k, |corpus|) rows: queries whose bucket-matched candidate set
    ranked to fewer than k results (possible at narrow plane counts —
    all of a query's buckets can be empty) get a second, EXACT pass via
    ``topk_join``. Starved queries are few by construction (the default
    operating point leaves ~0-2% of queries short), so the rescue is a
    small broadcast-side cartesian, not a corpus-wide crossproduct; the
    extra cost is one count over the ranked frame plus the brute-force
    scoring of just those query rows.
    """
    matched = lsh_matched_candidates(
        queries, candidates, dim, n_planes=n_planes, n_tables=n_tables,
        q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec=c_vec,
        broadcast_queries=broadcast_queries)

    @F.pandas_udf("double")
    def _cos(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            d = next((len(v) for v in a if v is not None),
                     next((len(v) for v in b if v is not None), 0))
            ma = _vstack_nullsafe(a, d)
            mb = _vstack_nullsafe(b, d)
            num = np.einsum("ij,ij->i", ma, mb)
            den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            yield pd.Series(np.where(den > 0, num / np.maximum(den, 1e-30), 0.0))

    scored = matched.withColumn("score", _cos("_cv", "_qv"))
    w = Window.partitionBy("_qid").orderBy(F.desc("score"), F.asc("_cid"))
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(q_id), F.col("_cid").alias(c_id),
                "score", "rank")
    )
    if not exact_rescue:
        return ranked
    # materialize once: the ranked frame feeds both the fullness count
    # and the final union, and re-running the LSH+score lineage twice
    # would double the expensive part
    ranked = ranked.localCheckpoint(eager=False)
    full = ranked.groupBy(q_id).agg(F.count("*").alias("_n")) \
                 .filter(F.col("_n") >= k).select(q_id)
    starved = queries.join(full, on=q_id, how="left_anti")
    rescued = topk_join(starved, candidates, k=k, q_id=q_id, q_vec=q_vec,
                        c_id=c_id, c_vec=c_vec)
    return ranked.join(starved.select(q_id), on=q_id, how="left_anti") \
                 .unionByName(rescued)


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """(a, b, score) pairs with cosine >= threshold, a < b.

    Blocking: an explicit block column (e.g. label / LSH bucket) if given,
    else MULTI-TABLE hyperplane signatures (requires ``dim``): a pair is
    paired if it shares a bucket in ANY of ``n_tables`` independent tables,
    so recall compounds as 1-(1-p^planes)^tables — a single 8-plane table
    at threshold 0.99 misses ~31% of true near-dups (same-bucket
    probability (1-θ/π)^8 ≈ 0.69), which is unacceptable for a DEDUP
    primitive; 4 tables push expected recall past 0.99 (asserted vs brute
    force in tests, like the ANN path). A pair matched in several tables
    is scored once (dropDuplicates before scoring). Within-block pairing
    is a self-join on the (table, bucket) key — never a global cross
    product.
    """
    base = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
    )
    if block_col is None:
        if dim is None:
            raise ValueError("need dim for signature blocking")
        parts = None
        for t in range(n_tables):
            sig = signature_udf(dim, n_planes, seed=7 + 1000 * t)
            p = base.withColumn("_tbl", F.lit(t)) \
                    .withColumn("_blk", sig(F.col("_v")))
            parts = p if parts is None else parts.unionByName(p)
        # materialize ONCE: the a/b sides of the self-join would otherwise
        # each re-run all n_tables signature-UDF passes over the source
        base = parts.localCheckpoint(eager=False)
        keys = ["_tbl", "_blk"]
    else:
        keys = ["_blk"]

    a = base.select(F.col("_id").alias("a"), F.col("_v").alias("va"), *keys)
    b = base.select(F.col("_id").alias("b"), F.col("_v").alias("vb"), *keys)
    pairs = a.join(b, keys).filter(F.col("a") < F.col("b"))
    if block_col is None:
        pairs = pairs.dropDuplicates(["a", "b"])
    return (
        pairs
        .withColumn("score", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )
