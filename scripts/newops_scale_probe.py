"""Scale probe for the session's new operators, at synthetic 10^6–10^8 row
scale (spark.range-derived, no data files — operator cost isolated from IO):

1. `triangle_count` on a hub graph (one 10^5-degree node + uniform edges):
   the degree-ordered orientation must keep the wedge join's fan-out near
   the random-graph level — the probe reports generated wedge rows vs the
   naive sum(deg^2)/2 bound the orientation avoids, plus wall.
2. `hll_sketch`+`hll_estimate` at 10^8 values vs exact countDistinct and
   Spark's built-in approx_count_distinct: wall and relative error.
3. bigram LM train+score over 10^6 synthetic docs (~24 tokens each from a
   skewed 50k vocab): wall, docs/s, bigram instances.
4. `weighted_sample_topk` (k=1000) over 10^8 weighted rows: wall, rows/s
   through the heap scan.

Usage: python scripts/newops_scale_probe.py [cores]
Prints one JSON line per probe plus a summary line.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hades_spark.operators.graph import triangle_count  # noqa: E402
from hades_spark.operators.lm import (bigram_quality_scores,  # noqa: E402
                                      train_bigram_lm)
from hades_spark.operators.sampling import weighted_sample_topk  # noqa: E402
from hades_spark.operators.sketch import hll_estimate, hll_sketch  # noqa: E402
from hades_spark.session import get_spark  # noqa: E402


def emit(d: dict) -> None:
    print(json.dumps(d), flush=True)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("newops_probe", master=f"local[{cores}]",
                      shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. triangle_count hub graph -------------------------------------
    n_nodes, n_rand, hub_deg = 500_000, 2_000_000, 100_000
    rand = spark.range(n_rand).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("dst"))
    hub = spark.range(hub_deg).select(
        F.lit(-1).cast("long").alias("src"), F.col("id").alias("dst"))
    edges = rand.unionByName(hub).localCheckpoint()
    m = edges.count()
    t0 = time.monotonic()
    tri = triangle_count(edges).collect()[0].n_triangles
    tri_sec = time.monotonic() - t0
    # oriented wedge volume vs the naive bound (re-derive with the same
    # canonicalization the operator applies)
    und = edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).dropDuplicates(["a", "b"])
    deg = und.select(F.col("a").alias("n")).unionByName(
        und.select(F.col("b").alias("n"))).groupBy("n").count()
    naive_wedges = deg.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("w")
    ).collect()[0].w
    da = deg.select(F.col("n").alias("a"), F.col("count").alias("dega"))
    db = deg.select(F.col("n").alias("b"), F.col("count").alias("degb"))
    o = und.join(da, "a").join(db, "b").select(
        F.when(F.struct("dega", "a") < F.struct("degb", "b"), F.col("a"))
         .otherwise(F.col("b")).alias("u"))
    oriented_wedges = o.groupBy("u").count().agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("w")
    ).collect()[0].w
    emit({"probe": "triangle_count", "edges": m, "hub_degree": hub_deg,
          "triangles": int(tri), "sec": round(tri_sec, 2),
          "oriented_wedges": int(oriented_wedges),
          "naive_wedge_bound": int(naive_wedges),
          "wedge_reduction_x": round(naive_wedges / max(oriented_wedges, 1),
                                     1)})

    # ---- 2. HLL at 10^8 ---------------------------------------------------
    n = 100_000_000
    vals = spark.range(n).select(
        (F.col("id") % 16).cast("string").alias("g"),
        F.pmod(F.xxhash64("id"), (F.col("id") % 16 + 1) * 500_000)
         .cast("string").alias("v"))
    t0 = time.monotonic()
    est = {r.g: r.distinct_est
           for r in hll_estimate(hll_sketch(vals, ["g"], "v", p=12),
                                 ["g"], p=12).collect()}
    hll_sec = time.monotonic() - t0
    t0 = time.monotonic()
    exact = {r.g: r.d for r in vals.groupBy("g")
             .agg(F.countDistinct("v").alias("d")).collect()}
    exact_sec = time.monotonic() - t0
    t0 = time.monotonic()
    builtin = {r.g: r.d for r in vals.groupBy("g")
               .agg(F.approx_count_distinct("v", 0.016).alias("d")).collect()}
    builtin_sec = time.monotonic() - t0
    rel = [abs(est[g] - exact[g]) / exact[g] for g in exact]
    emit({"probe": "hll", "rows": n, "groups": 16, "p": 12,
          "hll_sec": round(hll_sec, 2), "exact_sec": round(exact_sec, 2),
          "builtin_approx_sec": round(builtin_sec, 2),
          "max_rel_err": round(max(rel), 4),
          "mean_rel_err": round(sum(rel) / len(rel), 4)})

    # ---- 3. bigram LM at 10^6 docs ----------------------------------------
    n_docs, toks = 1_000_000, 24
    # skewed vocab: token = w<hash % (rank-dependent modulus)> — frequent
    # words repeat heavily, tail words are rare (zipf-ish without UDFs)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform(
            F.sequence(F.lit(1), F.lit(toks)),
            lambda i: F.concat(F.lit("w"), F.pmod(
                F.xxhash64("id", i),
                F.pmod(F.xxhash64(i), F.lit(50_000)) + 1).cast("string"))
        ), " ").alias("text")).localCheckpoint()
    docs.count()
    t0 = time.monotonic()
    lm = train_bigram_lm(docs)
    scored = bigram_quality_scores(docs, lm)
    n_scored = scored.count()
    lm_sec = time.monotonic() - t0
    emit({"probe": "bigram_lm", "docs": n_docs, "tokens_per_doc": toks,
          "bigram_instances": n_docs * (toks - 1), "scored_docs": n_scored,
          "sec": round(lm_sec, 2),
          "docs_per_sec": round(n_docs / lm_sec)})

    # ---- 4. weighted top-k at 10^8 ----------------------------------------
    n = 100_000_000
    wdf = spark.range(n).select(
        F.col("id").alias("key"),
        (F.pmod(F.xxhash64("id", F.lit(7)), 1000) + 1).cast("double")
        .alias("w"))
    t0 = time.monotonic()
    got = weighted_sample_topk(wdf, "key", "w", k=1000, seed=5).count()
    ws_sec = time.monotonic() - t0
    emit({"probe": "weighted_topk", "rows": n, "k": 1000,
          "sampled": got, "sec": round(ws_sec, 2),
          "rows_per_sec": round(n / ws_sec)})

    spark.stop()


def pq_probe(cores: int = 8) -> None:
    """Standalone PQ probe: 1M x 64-dim corpus, m=8 x 256 codes —
    train/encode/ADC walls + the compression ratio that motivates PQ.
    Run: python scripts/newops_scale_probe.py <cores> pq"""
    from hades_spark.operators.pq import (encode_pq, pq_topk,
                                          train_pq_codebooks)
    spark = get_spark("pq_probe", master=f"local[{cores}]",
                      shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    n, dim = 1_000_000, 64
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(dim)),
                    lambda j: (F.pmod(F.xxhash64("id", j), 2000) - 1000.0)
                    / 1000.0).alias("embedding")).localCheckpoint()
    emb.count()
    t0 = time.monotonic()
    books = train_pq_codebooks(emb, m_subspaces=8, n_codes=256,
                               sample_rows=100_000, iters=10, seed=3)
    train_sec = time.monotonic() - t0
    t0 = time.monotonic()
    codes = encode_pq(emb, books).localCheckpoint()
    n_codes_rows = codes.count()
    enc_sec = time.monotonic() - t0
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    t0 = time.monotonic()
    got = pq_topk(codes, queries, books, k=10).count()
    adc_sec = time.monotonic() - t0
    emit({"probe": "pq", "rows": n, "dim": dim, "m": 8, "n_codes": 256,
          "train_sec": round(train_sec, 2), "encode_sec": round(enc_sec, 2),
          "encode_rows_per_sec": round(n_codes_rows / enc_sec),
          "adc_8q_sec": round(adc_sec, 2), "topk_rows": got,
          "compression_x": round(dim * 8 / 8, 1)})  # 64 f64 -> 8 bytes
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "pq":
        pq_probe(int(sys.argv[1]))
    else:
        main()
