"""IVF ANN scale evidence — (n_centroids, nprobe) sweep for
``operators/ivf.ivf_topk_join`` at 1M vectors, with the SAME planted-
neighbor corpus, exact baseline, and metrics as the LSH sweep
(``ann_sweep.py``, whose generator it imports) so the data-dependent
(IVF) and data-independent (LSH) pruning families are directly
comparable at the same operating points.

Per config, one JSON line with:

- recall@10 vs the exact brute-force baseline,
- mean/max candidates per query (sum of probed inverted-list sizes —
  the cost driver),
- inverted-list size p50/p99 (skew evidence: k-means lists are NOT
  uniform like hash buckets),
- codebook train wall (driver numpy over the bounded sample — the
  index-build cost, amortized over every query at serve time),
- approximate-join wall.

Usage:
    python scripts/ivf_sweep.py [N] [Q] [configs...]
    # defaults: N=1_000_000 Q=100, configs = sweep grid, config
    # syntax "<n_centroids>x<nprobe>" e.g. 64x4
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from ann_sweep import DIM, K, candidates_df, gen_queries  # noqa: E402


def main() -> None:
    from pyspark.sql import Window, functions as F

    from hades_spark.functions.vector import cosine_col
    from hades_spark.operators.ivf import (assign_centroids, ivf_topk_join,
                                           probe_lists, train_centroids)
    from hades_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    configs = [(64, 1), (64, 2), (64, 4), (64, 8), (256, 4), (256, 16)]
    if len(sys.argv) > 3:
        configs = [tuple(map(int, c.split("x"))) for c in sys.argv[3:]]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ivf_sweep", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    queries = gen_queries(n_queries)
    qdf = spark.createDataFrame(queries, "q_id long, q_vec array<float>")
    cdf = candidates_df(spark, n, queries, K).localCheckpoint(eager=True)
    assert cdf.count() == n

    # exact baseline (same lossless 0.7 pre-filter as ann_sweep.py:
    # planted cosine ~0.92 >> max random cosine at dim 64 over 1M draws)
    t0 = time.perf_counter()
    scored = cdf.join(F.broadcast(qdf)) \
        .select("q_id", "c_id",
                cosine_col(F.col("c_vec"), F.col("q_vec")).alias("score")) \
        .filter(F.col("score") >= 0.7)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    exact_rows = scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= K).collect()
    exact_sec = time.perf_counter() - t0
    exact_sets: dict = {}
    for r in exact_rows:
        exact_sets.setdefault(r["q_id"], set()).add(r["c_id"])
    plant_base = n - n_queries * K
    planted_hits = sum(
        len([c for c in s if c >= plant_base]) for s in exact_sets.values())
    print(json.dumps({
        "phase": "exact", "n": n, "q": n_queries, "dim": DIM,
        "sec": round(exact_sec, 1),
        "planted_in_exact_top10": planted_hits,
        "planted_total": n_queries * K}), flush=True)

    cents_cache: dict = {}
    for n_centroids, nprobe in configs:
        if n_centroids not in cents_cache:
            t0 = time.perf_counter()
            cents = train_centroids(cdf, n_centroids, id_col="c_id",
                                    vec_col="c_vec", sample_rows=100_000)
            cents_cache[n_centroids] = (
                cents, round(time.perf_counter() - t0, 1))
        cents, train_sec = cents_cache[n_centroids]

        t0 = time.perf_counter()
        approx = ivf_topk_join(qdf, cdf, cents, k=K, nprobe=nprobe,
                               q_vec="q_vec", c_vec="c_vec").collect()
        sec = time.perf_counter() - t0
        hits = sum(1 for r in approx
                   if r["c_id"] in exact_sets.get(r["q_id"], set()))
        recall = hits / float(n_queries * K)

        # cost: per-query candidate count = sum of probed list sizes
        lists = assign_centroids(cdf, cents, vec_col="c_vec") \
            .groupBy("centroid").count()
        probed = probe_lists(
            qdf.select(F.col("q_id").alias("_qid"),
                       F.col("q_vec").alias("_qv")),
            cents, q_vec="_qv", nprobe=nprobe)
        per_q = probed.join(lists, "centroid") \
            .groupBy("_qid").agg(F.sum("count").alias("cands"))
        cand = per_q.agg(F.avg("cands").alias("avg"),
                         F.max("cands").alias("max")).collect()[0]
        lq = lists.select(F.col("count").cast("double").alias("nn")) \
            .approxQuantile("nn", [0.5, 0.99], 0.01)
        print(json.dumps({
            "phase": "sweep", "n_centroids": n_centroids, "nprobe": nprobe,
            "recall_at_10": round(recall, 4),
            "avg_candidates_per_query": round(float(cand["avg"]), 1),
            "max_candidates_per_query": int(cand["max"]),
            "pct_of_corpus": round(100.0 * cand["avg"] / n, 3),
            "list_p50": lq[0] if lq else 0,
            "list_p99": lq[1] if lq else 0,
            "train_sec": train_sec,
            "approx_sec": round(sec, 1),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
