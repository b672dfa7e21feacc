"""Runtime exchange-reuse probe: does the verify tail's twin vocabulary
broadcast (pair_scores) and apply_canonical_map's twin map broadcast
collapse to one build + ReusedExchange in the FINAL adaptive plan?

Usage: python scripts/reuse_probe.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def final_plan(df) -> str:
    # execute THIS DataFrame's own QueryExecution (a .write/.count would
    # plan a separate one and leave this one's AQE un-finalized), then
    # read back the finalized adaptive plan
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    return qe.executedPlan().toString()


def main():
    from pyspark.sql import functions as F

    from hades_spark.operators.canonicalize import (
        MAX_ALIAS_SQUASH_LEN, normalize_surface_col)
    from hades_spark.functions.triples import raw_triples
    from hades_spark.operators.lsh import char_shingles, verified_pairs
    from hades_spark.pipeline.kg import apply_canonical_map
    from hades_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("reuse_probe", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    vdir = "/tmp/hades_bench_corpus/pages_v3_n20000_r30_s42_vocab150000"
    pages = spark.read.parquet(vdir)

    raw = (raw_triples(pages)
           .select("url", "pred", "confidence",
                   normalize_surface_col(F.col("subj")).alias("subj_norm"),
                   normalize_surface_col(F.col("obj")).alias("obj_norm"))
           .cache())
    raw.count()

    keyed = (raw.select(F.explode(F.array("subj_norm", "obj_norm"))
                        .alias("norm"))
             .dropDuplicates(["norm"])
             .withColumn("squash", F.regexp_replace("norm", " ", ""))
             .filter(F.length("squash") > 0))
    squashes = keyed.select("squash").dropDuplicates(["squash"]) \
        .filter(F.length("squash") <= MAX_ALIAS_SQUASH_LEN)

    vp = verified_pairs(squashes, "squash", char_shingles(F.col("squash"), 3),
                        threshold=0.8, metric="containment",
                        num_hashes=16, bands=16, max_bucket_size=150)
    plan = final_plan(vp)
    n_build = plan.count("BroadcastExchange")
    n_reuse = plan.count("ReusedExchange")
    print(f"verify tail: BroadcastExchange={n_build} "
          f"ReusedExchange={n_reuse}")

    # apply_canonical_map over a distributed cmap (the vocab-shaped path)
    cmap = keyed.select("norm",
                        F.col("squash").alias("canonical_id")).cache()
    cmap.count()
    mapped = apply_canonical_map(raw, cmap)
    plan2 = final_plan(mapped)
    print(f"apply_canonical_map: BroadcastExchange="
          f"{plan2.count('BroadcastExchange')} "
          f"ReusedExchange={plan2.count('ReusedExchange')}")
    spark.stop()


if __name__ == "__main__":
    main()
