"""Per-stage canonicalization scaling breakdown (VERDICT r3 #2).

Runs the vocab-corpus KG pipeline ONE STAGE AT A TIME with
``localCheckpoint(eager=True)`` barriers between stages, so each timer
measures exactly its stage — at a given core count. Invoke once per
(cpus, pages) combo (fresh JVM per run, like the bench):

    BENCH_PAGES=200000 SPARK_GRAFT_CPUS=2 python scripts/canon_stage_scaling.py
    BENCH_PAGES=200000 SPARK_GRAFT_CPUS=8 python scripts/canon_stage_scaling.py

Prints one JSON line: per-stage wall seconds + row counts. Diff the 2-
vs 8-core lines to see WHICH stage carries the strong-scaling gap at
200k pages (BENCH/BASELINE.md §1 r4).

Stage boundaries (mirroring canonical_triples -> distinct_edges):
  extract   mapInArrow decode+extract+normalize (the corpus scan)
  vocab     distinct norms + squash filter
  shingle   squash dedup + char-3 shingles
  pairs     minhash + banded buckets + capped self-join + exact-
            containment verification, FUSED (production never
            materializes the multi-10M-row candidate set — a first
            version of this script checkpointed it between "buckets"
            and "verify" stages and the 38M-row localCheckpoint alone
            cost more than the whole production pipeline; the verified
            pairs, ~35k rows, are the real materialization point)
  cc        large-star/small-star connected components
  label     component -> min-norm canonical map
  apply     map join-back + edge aggregation (distinct_edges)

The per-stage sum therefore tracks the UNBARRIERED production wall
(within the checkpoint cost of the small frames), so the 2-vs-8-core
per-stage diff attributes the real pipeline's scaling gap.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from hades_spark.operators.components import alternating_components
    from hades_spark.operators.lsh import (cap_and_self_join, char_shingles,
                                           lsh_buckets, pair_scores)
    from hades_spark.pipeline.kg import apply_canonical_map, distinct_edges
    from hades_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))
    vocab = int(os.environ.get("BENCH_VOCAB", "150000"))
    richness = int(os.environ.get("BENCH_RICHNESS", "30"))
    threshold = 0.8
    lsh = dict(num_hashes=16, bands=16, max_bucket_size=150)

    corpus_root = os.environ.get("BENCH_CORPUS_DIR",
                                 "/tmp/hades_bench_corpus")
    corpus_dir = f"{corpus_root}/pages_v3_n{n_pages}_r{richness}_s42" \
                 f"_vocab{vocab}"

    spark = get_spark("canon_stage_scaling", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if not Path(corpus_dir, "_SUCCESS").exists():
        from hades_spark.pipeline.corpus import pages_df_distributed

        pages_df_distributed(spark, n_pages, seed=42, partitions=64,
                             richness=richness, vocab_size=vocab) \
            .write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    out: dict = {"cpus": cpus, "pages": n_pages, "vocab": vocab,
                 "stages": {}}
    caches = []

    def stage(name, frame):
        t0 = time.perf_counter()
        ck = frame.localCheckpoint(eager=True)
        n = ck.count()
        out["stages"][name] = {"sec": round(time.perf_counter() - t0, 2),
                               "rows": n}
        caches.append(ck)
        return ck

    from hades_spark.functions.triples import raw_triples
    from hades_spark.operators.canonicalize import normalize_surface_col

    raw = stage("extract", raw_triples(pages).select(
        "url", "pred", "confidence",
        normalize_surface_col(F.col("subj")).alias("subj_norm"),
        normalize_surface_col(F.col("obj")).alias("obj_norm")))

    norms = stage("vocab", raw
                  .select(F.explode(F.array("subj_norm", "obj_norm"))
                          .alias("norm"))
                  .dropDuplicates(["norm"])
                  .withColumn("squash", F.regexp_replace("norm", " ", ""))
                  .filter(F.length("squash") > 0))

    squashes = norms.select("squash").dropDuplicates(["squash"])
    keyed = squashes.select(
        F.col("squash").alias("_id"),
        char_shingles(F.col("squash"), 3).alias("sh")) \
        .filter(F.size("sh") > 0)
    keyed = stage("shingle", keyed)

    # production shape (round-5 deferred dedup): candidate pairs stay
    # non-distinct through the broadcast probe; dedup lands post-filter
    cand = cap_and_self_join(
        lsh_buckets(keyed, "_id", "sh", num_hashes=lsh["num_hashes"],
                    bands=lsh["bands"]),
        lsh["max_bucket_size"], distinct=False)

    pairs = stage("pairs", pair_scores(cand, keyed, threshold,
                                       "containment",
                                       pairs_distinct=False)
                  .select("a", "b"))

    comp = stage("cc", alternating_components(pairs, "a", "b", max_iter=50))

    lab = norms.join(comp, norms.squash == comp.node, "left") \
        .select("norm",
                F.coalesce("component", F.col("squash")).alias("_comp"))
    canon = lab.groupBy("_comp").agg(F.min("norm").alias("canonical_id"))
    cmap = stage("label", lab.join(canon, "_comp")
                 .select("norm", "canonical_id"))

    edges = stage("apply", distinct_edges(
        apply_canonical_map(raw, cmap, broadcast_map=True)))

    out["total_sec"] = round(sum(s["sec"] for s in out["stages"].values()),
                             2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
