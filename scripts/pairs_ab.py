"""Same-JVM A/B of the LSH pair-generation + verification shapes.

The VM's run-to-run variance (steal time) swamps cross-session
comparisons, so this measures OLD vs NEW inside one session,
alternating A/B/A/B over the real 200k-page vocabulary:

  pairgen  "join"  window-count cap + bucket-key self-join (production
           `cap_and_self_join`)
           "array" groupBy collect_list cap + combinatorial a<b pairs
           (REJECTED: measured ~2x slower at 200k pages — kept here so
           the decision stays reproducible)
  verify   "str"   joins on STRING shingle arrays, no broadcast (the
           round-3 shape)
           "hash"  xxhash64'd LONG arrays + small-vocabulary broadcast
           (production `pair_scores`)

Usage: SPARK_GRAFT_CPUS=8 python scripts/pairs_ab.py [rounds]
Prints one JSON line per timed run plus a summary; both shapes must
produce the identical verified-pair count (asserted).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def array_pairs_rejected(buckets, max_bucket_size):
    """collect_list + combinatorial transform pair generation — measured
    ~2x slower than the production window+self-join (big per-bucket
    struct arrays are GC-heavy; nested transform/slice leaves codegen)."""
    from pyspark.sql import functions as F

    ids = F.col("ids")
    pair_structs = F.flatten(F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + F.lit(2), F.greatest(F.size(ids), F.lit(1))),
            lambda y: F.struct(F.least(x, y).alias("a"),
                               F.greatest(x, y).alias("b")),
        ),
    ))
    return (
        buckets.groupBy("band", "bh")
        .agg(F.collect_list("_id").alias("ids"))
        .filter(F.size("ids") <= max_bucket_size)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def str_scores_r3(pairs, keyed, threshold):
    from pyspark.sql import functions as F

    a = keyed.select(F.col("_id").alias("a"), F.col("sh").alias("sh_a"))
    b = keyed.select(F.col("_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    score = inter / F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        pairs.join(a, "a").join(b, "b")
        .withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from hades_spark.operators.lsh import (cap_and_self_join, char_shingles,
                                           lsh_buckets, pair_scores)
    from hades_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))
    corpus_dir = (f"/tmp/hades_bench_corpus/pages_v3_n{n_pages}"
                  f"_r30_s42_vocab150000")
    spark = get_spark("pairs_ab", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from hades_spark.functions.triples import raw_triples
    from hades_spark.operators.canonicalize import normalize_surface_col

    pages = spark.read.parquet(corpus_dir)
    keyed = (
        raw_triples(pages)
        .select(F.explode(F.array(
            normalize_surface_col(F.col("subj")),
            normalize_surface_col(F.col("obj")))).alias("norm"))
        .dropDuplicates(["norm"])
        .select(F.regexp_replace("norm", " ", "").alias("_id"))
        .filter(F.length("_id") > 0)
        .dropDuplicates(["_id"])
        .select("_id", char_shingles(F.col("_id"), 3).alias("sh"))
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True)
    )
    n_keyed = keyed.count()
    print(json.dumps({"phase": "setup", "keyed": n_keyed}), flush=True)

    def buckets():
        return lsh_buckets(keyed, "_id", "sh", num_hashes=16, bands=16)

    variants = {
        "joinpair_strverify": lambda: str_scores_r3(
            cap_and_self_join(buckets(), 150), keyed, 0.8).count(),
        "joinpair_hashverify": lambda: pair_scores(
            cap_and_self_join(buckets(), 150), keyed, 0.8,
            "containment").count(),
        "arraypair_strverify": lambda: str_scores_r3(
            array_pairs_rejected(buckets(), 150), keyed, 0.8).count(),
        "arraypair_hashverify": lambda: pair_scores(
            array_pairs_rejected(buckets(), 150), keyed, 0.8,
            "containment").count(),
    }
    # mirror the order across rounds so slow VM drift cancels on average
    order = list(variants)
    counts = set()
    out: dict[str, list] = {k: [] for k in variants}
    for r in range(rounds):
        seq = order if r % 2 == 0 else list(reversed(order))
        for name in seq:
            t0 = time.perf_counter()
            n = variants[name]()
            sec = round(time.perf_counter() - t0, 2)
            counts.add(n)
            out[name].append(sec)
            print(json.dumps({"phase": "run", "shape": name, "round": r,
                              "sec": sec, "pairs": n}), flush=True)
    assert len(counts) == 1, f"shapes disagree: {counts}"
    print(json.dumps({"phase": "summary", "cpus": cpus,
                      **{k: v for k, v in out.items()},
                      "pairs": counts.pop()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
