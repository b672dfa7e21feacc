"""IVF (inverted-file / coarse-quantizer) ANN over embedding columns —
the k-means sibling of the hyperplane-LSH path in ``similarity.py``.

Reference parity: HADES serves vector search through its store's ANN
index (SURVEY §2.3 J8 / §4 O1; reference brute-force fallback at
``core/database/arango/memory_client.py`` cosine scoring). The LSH
variant (``similarity.lsh_topk_join``) is data-independent; IVF is the
data-DEPENDENT pruning family (FAISS-style): a small spherical-k-means
codebook partitions the corpus into ``n_centroids`` inverted lists and
each query scores only its ``nprobe`` nearest lists.

Spark-first split (the same honest shape as ``operators/rgcn.py``):

- **Training is driver-side numpy over a deterministic BOUNDED sample**
  (xxhash64-ordered limit). At 10^12 rows the codebook never sees the
  corpus — sample cost is O(sample_rows), independent of corpus size.
- **Assignment and search are fully distributed.** The codebook
  (n_centroids x dim floats, a few MB at production sizes) rides a
  broadcast one-column frame into an Arrow-batched pandas UDF — one
  BLAS matmul per batch, no per-row Python. The probe join shuffles on
  the centroid id (the inverted-list key): both sides prune to probed
  lists, so the scored set is ~nprobe/n_centroids of the corpus and
  never a cross product.

Exactness hook: with ``nprobe == n_centroids`` every query scores every
candidate (each candidate lives in exactly ONE list, and all lists are
probed), so the result provably equals brute-force top-k — which is how
the registered ``ann_ivf_topk`` query gets a DuckDB value-hash oracle.
Recall at ``nprobe < n_centroids`` is asserted against brute force in
``tests/test_operators.py::TestIvf`` (same methodology as the LSH
sweep).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(n, 1e-30)


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
    iters: int = 20,
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means codebook from a deterministic bounded sample.

    The sample is the first ``sample_rows`` rows in xxhash64(id) order —
    a seedless uniform-ish draw that is stable across runs and cluster
    sizes (same device as the RGCN edge sample), so retraining on the
    same corpus yields the same codebook. Lloyd iterations on
    L2-normalized vectors with centroid renormalization (cosine
    assignment == dot product on unit vectors); an emptied cluster is
    reseeded to the sample point farthest from its current centroid
    (deterministic — no RNG draw in the loop).

    Returns a float64 (n_centroids, dim) array of UNIT centroids.
    """
    rows = (
        embeddings.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .orderBy(F.xxhash64("_id"), F.col("_id"))
        .limit(int(sample_rows))
        .select("_v")
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError(
            f"need >= {n_centroids} sample vectors, got {len(rows)}")
    mat = _unit_rows(np.asarray([r["_v"] for r in rows], dtype=np.float64))
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cents.T                      # (n, k)
        assign = np.argmax(sims, axis=1)
        new = np.zeros_like(cents)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
            else:
                # farthest sample point from the stale centroid, by
                # cosine — deterministic reseed, keeps k lists non-empty
                new[c] = mat[int(np.argmin(sims[:, c]))]
        new = _unit_rows(new)
        if np.allclose(new, cents, atol=1e-9):
            cents = new
            break
        cents = new
    return cents


def _assign_udf(centroids: np.ndarray):
    cents = _unit_rows(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf("int")
    def _assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = np.zeros(len(s), dtype=np.int32)
            ok = s.notna().to_numpy()
            if ok.any():
                mat = _unit_rows(np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in s[ok]]))
                out[ok] = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            yield pd.Series(out)

    return _assign


def assign_centroids(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """Tag every row with its nearest-centroid id (the inverted-list
    key). The codebook travels in the UDF closure — n_centroids x dim
    float64 is a few MB at production sizes (e.g. 4096 x 2048 = 64 MB is
    the practical ceiling; past that, shard the codebook), shipped once
    per executor with the task binary, then one BLAS matmul per Arrow
    batch. NULL vectors deterministically land in list 0 (zero vector ->
    argmax of zeros); they score cosine 0.0 downstream and never rank."""
    return df.withColumn(out_col, _assign_udf(centroids)(F.col(vec_col)))


def probe_lists(
    queries: DataFrame,
    centroids: np.ndarray,
    q_vec: str = "q_vec",
    nprobe: int = 4,
    out_col: str = "centroid",
) -> DataFrame:
    """Explode each query into its ``nprobe`` nearest inverted lists:
    one output row per (query row, probed centroid id)."""
    cents = _unit_rows(np.asarray(centroids, dtype=np.float64))
    npb = int(min(nprobe, len(cents)))

    @F.pandas_udf("array<int>")
    def _probe(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            res: list = []
            for v in s:
                if v is None:
                    res.append([0])
                    continue
                u = np.asarray(v, dtype=np.float64)
                u = u / max(float(np.linalg.norm(u)), 1e-30)
                sims = cents @ u
                top = np.argpartition(-sims, npb - 1)[:npb]
                # stable order (sim desc, id asc) so plans are replayable
                top = top[np.lexsort((top, -sims[top]))]
                res.append([int(c) for c in top])
            yield pd.Series(res)

    return queries.withColumn("_probes", _probe(F.col(q_vec))) \
                  .withColumn(out_col, F.explode("_probes")) \
                  .drop("_probes")


def ivf_topk_join(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    broadcast_queries: bool = True,
    score_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k per query, IVF-pruned: each query scores only
    candidates whose inverted list it probes. -> (q_id, c_id, score,
    rank).

    No dedup stage is needed (unlike the LSH path): every candidate
    belongs to exactly one list and a query probes each list at most
    once, so a (query, candidate) pair appears at most once by
    construction. ``nprobe == n_centroids`` makes the search exact.

    The probed-query side is broadcast by default (a query batch
    exploded nprobe-fold is still small); pass
    ``broadcast_queries=False`` for corpus-vs-corpus shapes, which
    degrades to a shuffle join keyed on the centroid id — both sides
    hash-partition on the list key, so each reducer sees one inverted
    list's worth of rows, never the corpus.

    ``score_decimals`` rounds the cosine BEFORE ranking (ties broken by
    c_id), making the output value-hash-stable against an independent
    double-precision oracle.
    """
    cs = assign_centroids(
        candidates.select(F.col(c_id).alias("_cid"),
                          F.col(c_vec).alias("_cv")),
        centroids, vec_col="_cv")
    qs = probe_lists(
        queries.select(F.col(q_id).alias("_qid"), F.col(q_vec).alias("_qv")),
        centroids, q_vec="_qv", nprobe=nprobe)
    if broadcast_queries:
        qs = F.broadcast(qs)
    joined = cs.join(qs, "centroid")

    @F.pandas_udf("double")
    def _cos(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            out = np.zeros(len(a), dtype=np.float64)
            ok = (a.notna() & b.notna()).to_numpy()
            if ok.any():
                ma = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in a[ok]])
                mb = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in b[ok]])
                num = np.einsum("ij,ij->i", ma, mb)
                den = (np.linalg.norm(ma, axis=1)
                       * np.linalg.norm(mb, axis=1))
                out[ok] = np.where(den > 0, num / np.maximum(den, 1e-30), 0.0)
            yield pd.Series(out)

    score = _cos("_cv", "_qv")
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    scored = joined.withColumn("score", score)
    w = Window.partitionBy("_qid").orderBy(F.desc("score"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(q_id), F.col("_cid").alias(c_id),
                "score", "rank")
    )
