"""Product quantization (PQ) — memory-bounded ANN scoring, completing the
three-family index story (LSH: data-independent; IVF: data-dependent
pruning; PQ: data-dependent COMPRESSION — FAISS's IVF-PQ pairs the last
two).

At 10^12 vectors the corpus doesn't fit anywhere as floats: PQ stores
each vector as ``m`` one-byte codes (dim/m-dim subvectors, each snapped
to its subspace's 256-entry codebook) — a 512-float embedding becomes
m=8..64 bytes, a 32–256× compression — and scores queries against codes
via asymmetric distance computation (ADC): per query, one (m × 256)
lookup table of exact query-subvector · centroid dot products; a
candidate's approximate score is m table lookups summed, never touching
floats of the corpus again.

Spark-first split (the ivf.py / rgcn.py contract):

- **codebooks train driver-side on a deterministic bounded sample**
  (xxhash64-ordered limit; per-subspace L2 Lloyd with farthest-point
  reseed for emptied codes — no RNG in the loop, deterministic for a
  given (corpus, seed));
- **encoding is distributed**: codebooks (m × 256 × sub_dim floats, a
  few MB) broadcast into an Arrow-batched pandas UDF, one BLAS matmul
  per (batch, subspace);
- **ADC scoring is distributed**: the query block broadcasts, each
  executor builds the LUTs once per batch and scores codes with fancy
  indexing — no per-row Python, no corpus-side floats.

The ADC math is fully deterministic given (codebooks, codes, queries),
so the registered query carries a complete DuckDB value-hash oracle —
the unnested (subspace, code, component) codebook join re-derives every
score. Recall is a property of the compression, not the machinery:
asserted against exact brute force in tests (same methodology as the
LSH/IVF sweeps).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def train_pq_codebooks(
    embeddings: DataFrame,
    m_subspaces: int,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
    iters: int = 20,
    seed: int = 7,
) -> np.ndarray:
    """-> float64 (m, n_codes, sub_dim) codebooks. L2 Lloyd per subspace
    over the deterministic xxhash64-ordered sample; emptied codes reseed
    to the sample subvector farthest from the stale centroid."""
    if m_subspaces < 1:
        raise ValueError(f"m_subspaces must be >= 1: {m_subspaces}")
    if not 2 <= n_codes <= 65536:
        raise ValueError(f"n_codes must be in [2, 65536]: {n_codes}")
    rows = (
        embeddings.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .orderBy(F.xxhash64("_id"), F.col("_id"))
        .limit(int(sample_rows))
        .select("_v").collect()
    )
    mat = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    if mat.ndim != 2 or mat.shape[0] < n_codes:
        raise ValueError(
            f"need >= {n_codes} sample vectors, got {mat.shape}")
    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sub = dim // m_subspaces
    rng = np.random.RandomState(seed)
    books = np.zeros((m_subspaces, n_codes, sub))
    for mi in range(m_subspaces):
        x = mat[:, mi * sub:(mi + 1) * sub]
        cents = x[rng.choice(len(x), size=n_codes, replace=False)].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2) \
                if len(x) * n_codes * sub <= 2e8 else None
            if d is None:  # chunked distance for big samples
                d = np.empty((len(x), n_codes))
                for s0 in range(0, len(x), 4096):
                    xx = x[s0:s0 + 4096]
                    d[s0:s0 + 4096] = (
                        (xx ** 2).sum(1)[:, None]
                        - 2.0 * xx @ cents.T
                        + (cents ** 2).sum(1)[None, :])
            assign = np.argmin(d, axis=1)
            new = np.zeros_like(cents)
            for c in range(n_codes):
                members = x[assign == c]
                new[c] = members.mean(axis=0) if len(members) \
                    else x[int(np.argmax(d[:, c]))]
            if np.allclose(new, cents, atol=1e-12):
                cents = new
                break
            cents = new
        books[mi] = cents
    return books


def encode_pq(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes: array<int>): per-subspace nearest-centroid codes.
    One broadcast-codebook Arrow batch matmul per subspace."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = books.shape

    @F.pandas_udf("array<int>")
    def _enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        c_sq = (books ** 2).sum(axis=2)           # (m, n_codes)
        for s in batches:
            x = np.asarray(list(s), dtype=np.float64)  # (b, dim)
            out = np.empty((len(x), m), dtype=np.int32)
            for mi in range(m):
                xs = x[:, mi * sub:(mi + 1) * sub]
                d = (xs ** 2).sum(1)[:, None] \
                    - 2.0 * xs @ books[mi].T + c_sq[mi][None, :]
                out[:, mi] = np.argmin(d, axis=1)
            yield pd.Series(list(out))

    return embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _enc(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    score_decimals: int | None = None,
) -> DataFrame:
    """-> (q_id, c_id, score, rank): ADC top-k — approximate dot product
    = sum over subspaces of LUT[subspace, code]. The query block is
    collected once (queries are the SMALL side by contract, same as
    ``similarity.topk_join``) and broadcast inside the UDF closure; the
    corpus side streams as Arrow batches of codes only."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = books.shape
    qrows = queries.select(F.col(q_id_col).alias("_qid"),
                           F.col(q_vec_col).alias("_qv")).collect()
    if not qrows:
        raise ValueError("queries must be non-empty")
    q_ids = [r["_qid"] for r in qrows]
    qmat = np.asarray([r["_qv"] for r in qrows], dtype=np.float64)
    # LUTs: (n_q, m, n_codes) of exact query-subvector . centroid
    luts = np.einsum("qms,mcs->qmc", qmat.reshape(len(qmat), m, sub), books)

    @F.pandas_udf("array<double>")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng_m = np.arange(m)
        for s in batches:
            cc = np.asarray(list(s), dtype=np.int64)      # (b, m)
            per_q = [luts[qi][rng_m, cc].sum(axis=1) for qi in
                     range(len(q_ids))]                   # n_q x (b,)
            yield pd.Series(list(np.stack(per_q, axis=1)))

    qid_arr = F.array(*[F.lit(q) for q in q_ids])
    scored = (
        codes.select(F.col(id_col).alias("c_id"),
                     _score(F.col("codes")).alias("_ss"))
        .select("c_id", F.explode(F.arrays_zip(
            qid_arr.alias("q_id"), F.col("_ss").alias("score"))).alias("z"))
        .select(F.col("z.q_id").alias("q_id"), "c_id",
                (F.round(F.col("z.score"), score_decimals)
                 if score_decimals is not None
                 else F.col("z.score")).alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
