"""ANN scale evidence (VERDICT r3 #5): 1M-vector (n_planes, n_tables)
sweep for ``lsh_topk_join``.

Generates a synthetic corpus of random unit vectors with PLANTED
neighbors (10 per query at cosine ~0.92 — far above the ~0.6 max random
cosine at dim 64 over 1M draws, so the planted set IS the exact top-10;
verified against a brute-force baseline before the sweep), then measures
per config:

- recall@10 vs the exact baseline,
- mean candidate-set size per query (the cost driver),
- candidate-side bucket-size distribution (skew evidence),
- wall seconds for the approximate join.

Usage:
    python scripts/ann_sweep.py [N] [Q] [configs...]
    # defaults: N=1_000_000 Q=100, configs = sweep grid

One JSON line per config to stdout; summarize into BENCH/BASELINE.md §ANN.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 64
K = 10
SEED = 42
PLANT_ALPHA = 0.92  # target cosine of planted neighbors


def gen_queries(n_queries: int) -> list[tuple[int, list[float]]]:
    rng = np.random.RandomState(SEED)
    q = rng.standard_normal((n_queries, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return [(i, q[i].tolist()) for i in range(n_queries)]


def candidates_df(spark, n: int, queries, n_plant: int):
    """Distributed corpus: ids [0, n) random unit vectors; the LAST
    n_queries*n_plant ids are planted neighbors (query idx = id order)."""
    n_queries = len(queries)
    plant_base = n - n_queries * n_plant
    qmat = np.array([v for _, v in queries], dtype=np.float32)
    sc_qmat = spark.sparkContext.broadcast(qmat.tolist())

    def gen(batches):
        import pandas as pd

        qm = np.array(sc_qmat.value, dtype=np.float32)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(SEED + 1 + int(ids[0]) % 999983)
            mat = rng.standard_normal((len(ids), DIM)).astype(np.float32)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            planted = ids >= plant_base
            if planted.any():
                qi = ((ids[planted] - plant_base) // n_plant) % len(qm)
                a = PLANT_ALPHA
                b = np.sqrt(1 - a * a)
                mix = a * qm[qi] + b * mat[planted]
                mix /= np.linalg.norm(mix, axis=1, keepdims=True)
                mat[planted] = mix
            yield pd.DataFrame({"c_id": ids,
                                "c_vec": [r.tolist() for r in mat]})

    return spark.range(n).repartition(64) \
        .mapInPandas(gen, "c_id long, c_vec array<float>")


def main() -> None:
    from pyspark.sql import Window, functions as F

    from hades_spark.functions.vector import cosine_col
    from hades_spark.operators.similarity import (lsh_matched_candidates,
                                                  lsh_topk_join)
    from hades_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    configs = [(8, 1), (6, 4), (8, 4), (8, 8), (10, 8), (12, 8), (12, 16)]
    if len(sys.argv) > 3:
        configs = [tuple(map(int, c.split("x"))) for c in sys.argv[3:]]
    n_plant = K

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ann_sweep", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    queries = gen_queries(n_queries)
    qdf = spark.createDataFrame(queries, "q_id long, q_vec array<float>")
    cdf = candidates_df(spark, n, queries, n_plant) \
        .localCheckpoint(eager=True)
    assert cdf.count() == n

    # exact baseline: all-pairs cosine JVM-side (broadcast query side,
    # projection drops the vectors BEFORE the rank window) with a 0.7
    # pre-filter — lossless because planted cosine ~0.92 >> max random
    # cosine at dim 64 over 1M draws (~0.6); the planted-in-top10
    # assertion below verifies that
    t0 = time.perf_counter()
    scored = cdf.join(F.broadcast(qdf)) \
        .select("q_id", "c_id",
                cosine_col(F.col("c_vec"), F.col("q_vec")).alias("score")) \
        .filter(F.col("score") >= 0.7)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    exact_rows = scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= K).collect()
    exact_sec = time.perf_counter() - t0
    exact_sets = {}
    for r in exact_rows:
        exact_sets.setdefault(r["q_id"], set()).add(r["c_id"])
    plant_base = n - n_queries * n_plant
    planted_hits = sum(
        len([c for c in s if c >= plant_base]) for s in exact_sets.values())
    print(json.dumps({
        "phase": "exact", "n": n, "q": n_queries, "dim": DIM,
        "sec": round(exact_sec, 1),
        "planted_in_exact_top10": planted_hits,
        "planted_total": n_queries * n_plant}), flush=True)

    for planes, tables in configs:
        t0 = time.perf_counter()
        approx = lsh_topk_join(qdf, cdf, dim=DIM, k=K,
                               n_planes=planes, n_tables=tables).collect()
        sec = time.perf_counter() - t0
        hits = sum(1 for r in approx
                   if r["c_id"] in exact_sets.get(r["q_id"], set()))
        recall = hits / float(n_queries * K)

        matched = lsh_matched_candidates(qdf, cdf, dim=DIM,
                                         n_planes=planes, n_tables=tables)
        cand_stats = matched.groupBy("_qid").count() \
            .agg(F.avg("count").alias("avg"), F.max("count").alias("max")) \
            .collect()[0]
        bsizes = matched.groupBy("table", "bucket").count() \
            .select(F.col("count").cast("double").alias("nn"))
        qs = bsizes.approxQuantile("nn", [0.5, 0.99], 0.01)
        print(json.dumps({
            "phase": "sweep", "n_planes": planes, "n_tables": tables,
            "recall_at_10": round(recall, 4),
            "avg_candidates_per_query": round(float(cand_stats["avg"]), 1),
            "max_candidates_per_query": int(cand_stats["max"]),
            "pct_of_corpus": round(100.0 * cand_stats["avg"] / n, 3),
            "bucket_p50": qs[0] if qs else 0,
            "bucket_p99": qs[1] if qs else 0,
            "approx_sec": round(sec, 1),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
