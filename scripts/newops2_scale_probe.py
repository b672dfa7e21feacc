"""Scale probe for the fourteenth-session second-wave operators at
synthetic 10^5–10^7 scale (spark.range-derived; operator cost isolated
from IO):

1. `excise_shared_windows` over 200k docs x 24 tokens with a planted
   8-token boilerplate passage in half the docs: wall, docs/s, and the
   removed-token accounting checked against the construction.
2. `jaccard_join_exact` at 50k docs: wall + the prefix filter's
   candidate-pair count vs the brute-force bound n*(n-1)/2 — the number
   that says why the optimization exists.
3. `random_walks` (2 walks x 4 steps) over a 1M-edge power-law-ish
   graph: wall, walks/s, hop-count total.
4. `association_rules` over 1M baskets x ~6 items from a 100-item
   catalog: wall, rules found at min_support 0.001.
5. `profile_table` (4 columns, approx distinct) over 10^7 rows: wall.

Usage: python scripts/newops2_scale_probe.py [cores]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hades_spark.operators.assoc import association_rules  # noqa: E402
from hades_spark.operators.dedup import jaccard_join_exact  # noqa: E402
from hades_spark.operators.graph_features import random_walks  # noqa: E402
from hades_spark.operators.profile import profile_table  # noqa: E402
from hades_spark.operators.quality import excise_shared_windows  # noqa: E402
from hades_spark.session import get_spark  # noqa: E402


def emit(d: dict) -> None:
    print(json.dumps(d), flush=True)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("newops2_probe", master=f"local[{cores}]",
                      shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. excise_shared_windows ---------------------------------------
    n_docs = 200_000
    body = F.array_join(F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.concat(F.lit("w"), F.pmod(
            F.xxhash64("id", i), F.lit(50_000)).cast("string"))), " ")
    passage = "shared passage tokens one two three four five"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit(passage + " "), body))
         .otherwise(body).alias("text")).localCheckpoint()
    t0 = time.monotonic()
    agg = excise_shared_windows(docs, n=5, min_docs=2).agg(
        F.count("*").alias("n"), F.sum("n_removed").alias("rm"),
        F.sum("n_tokens").alias("tot")).collect()[0]
    sec = time.monotonic() - t0
    assert agg.n == n_docs
    # every planted passage (8 tokens x n_docs/2) must go; organic
    # collisions in the 50k-vocab bodies may add a little
    assert agg.rm >= 8 * (n_docs // 2), agg
    emit({"probe": "excise_shared_windows", "docs": n_docs,
          "tokens": int(agg.tot), "removed": int(agg.rm),
          "sec": round(sec, 2), "docs_per_sec": round(n_docs / sec)})

    # ---- 2. jaccard_join_exact ------------------------------------------
    nj = 50_000
    jd = spark.range(nj).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda i: F.concat(F.lit("t"), F.pmod(
                F.xxhash64(F.pmod(F.col("id"), F.lit(5_000)), i),
                F.lit(20_000)).cast("string"))), " ").alias("text"))
    # 10 docs per template -> plenty of exact-dup groups to find
    jd = jd.localCheckpoint()
    t0 = time.monotonic()
    pairs = jaccard_join_exact(jd, threshold=0.9).count()
    sec = time.monotonic() - t0
    brute = nj * (nj - 1) // 2
    emit({"probe": "jaccard_join_exact", "docs": nj, "pairs": pairs,
          "sec": round(sec, 2), "brute_force_pairs": brute,
          "note": "prefix filter replaces the n^2 candidate space"})

    # ---- 3. random_walks --------------------------------------------------
    n_edges, n_nodes = 1_000_000, 100_000
    g = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)),
               F.lit(n_nodes)).alias("dst")).localCheckpoint()
    t0 = time.monotonic()
    w = random_walks(g, walks_per_node=2, length=4, seed=1)
    stats = w.agg(F.count("*").alias("n"),
                  F.sum(F.size("path") - 1).alias("hops")).collect()[0]
    sec = time.monotonic() - t0
    emit({"probe": "random_walks", "edges": n_edges, "walks": int(stats.n),
          "hops": int(stats.hops), "sec": round(sec, 2),
          "walks_per_sec": round(stats.n / sec)})

    # ---- 4. association_rules ---------------------------------------------
    n_b, catalog = 1_000_000, 100
    bk = spark.range(n_b).select(
        F.col("id").alias("basket_id"),
        F.explode(F.transform(
            F.sequence(F.lit(1), F.lit(6)),
            lambda i: F.concat(F.lit("i"), F.pmod(
                F.xxhash64("id", i), F.lit(catalog)).cast("string"))))
         .alias("item")).localCheckpoint()
    t0 = time.monotonic()
    rules = association_rules(bk, min_support=0.001).count()
    sec = time.monotonic() - t0
    emit({"probe": "association_rules", "baskets": n_b, "rules": rules,
          "sec": round(sec, 2), "baskets_per_sec": round(n_b / sec)})

    # ---- 5. profile_table ---------------------------------------------------
    n_p = 10_000_000
    pt = spark.range(n_p).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("key"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0)
        .alias("score"),
        F.when(F.col("id") % 17 == 0, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lit("s"), F.pmod(
             F.xxhash64("id", F.lit(3)), F.lit(50)).cast("string")))
         .alias("tag")).localCheckpoint()
    t0 = time.monotonic()
    prof = profile_table(pt, ["id", "key", "score", "tag"], top_k=5)
    rows = {r["column"]: r for r in prof.collect()}
    sec = time.monotonic() - t0
    assert rows["tag"]["n_nulls"] == (n_p + 16) // 17
    emit({"probe": "profile_table", "rows": n_p, "columns": 4,
          "sec": round(sec, 2),
          "tag_nulls": int(rows["tag"]["n_nulls"]),
          "id_distinct_approx": int(rows["id"]["n_distinct"])})

    spark.stop()


if __name__ == "__main__":
    main()
