"""Stage-level decomposition benches (guide §1.4 noop-sink isolation).

NOT the driver bench — bench.py stays frozen. This file exists to
attribute wall time inside the headline paths so optimizations target the
real cost. Usage:

    python bench_extra.py kg [repeats]      # legacy 20k-page kg pipeline
    python bench_extra.py vocab [repeats]   # 150k-vocab kg pipeline
    python bench_extra.py queries [repeats] # headline sf queries, noop sink

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_PAGES as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from hades_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    log_conf = Path(__file__).resolve().parent / "scripts" / \
        "bench_log4j2.properties"
    spark = get_spark(
        "hades_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions":
                f"-Dlog4j.configurationFile=file:{log_conf}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark, cpus


def ensure_corpus(spark, cpus, n_pages, vocab=0):
    from hades_spark.pipeline.corpus import pages_df_distributed

    corpus_root = os.environ.get("BENCH_CORPUS_DIR", "/tmp/hades_bench_corpus")
    richness = 30
    corpus_dir = (f"{corpus_root}/pages_v3_n{n_pages}_r{richness}"
                  f"_s42_vocab{vocab}" if vocab else
                  f"{corpus_root}/pages_v2_n{n_pages}_r{richness}_s42")
    if not Path(corpus_dir, "_SUCCESS").exists():
        pages_df_distributed(spark, n_pages, seed=42, partitions=cpus * 2,
                             richness=richness, vocab_size=vocab) \
            .write.mode("overwrite").parquet(corpus_dir)
    return spark.read.parquet(corpus_dir)


def kg_stages(vocab=0, repeats=3):
    from pyspark.sql import functions as F

    from hades_spark.functions.triples import raw_triples
    from hades_spark.operators.canonicalize import (
        canonical_norm_map, normalize_surface_col)
    from hades_spark.pipeline.kg import apply_canonical_map, distinct_edges

    spark, cpus = get_session()
    sc = spark.sparkContext
    n_pages = int(os.environ.get("BENCH_PAGES", "20000"))
    pages = ensure_corpus(spark, cpus, n_pages, vocab=vocab)
    pages.count()  # warm footers

    for rep in range(repeats):
        t_all0 = time.perf_counter()
        stages = {}

        # stage 1: extraction mapInArrow + normalize, materialized to cache
        sc.setJobDescription(f"rep{rep}: extract+normalize -> cache")
        t0 = time.perf_counter()
        raw = (
            raw_triples(pages)
            .select(
                "url", "pred", "confidence",
                normalize_surface_col(F.col("subj")).alias("subj_norm"),
                normalize_surface_col(F.col("obj")).alias("obj_norm"),
            )
            .cache()
        )
        n_raw = raw.count()
        stages["extract_cache"] = time.perf_counter() - t0

        # stage 2: distinct norms (from cache)
        sc.setJobDescription(f"rep{rep}: distinct norms")
        t0 = time.perf_counter()
        norms = raw.select(
            F.explode(F.array("subj_norm", "obj_norm")).alias("norm"))
        cmap = canonical_norm_map(norms, threshold=0.8,
                                  local_threshold=20000).cache()
        n_map = cmap.count()
        stages["canonical_map"] = time.perf_counter() - t0

        # stage 3: apply map + distinct edges
        sc.setJobDescription(f"rep{rep}: apply map + distinct edges")
        t0 = time.perf_counter()
        triples = apply_canonical_map(raw, cmap)
        edges = distinct_edges(triples)
        n_edges = edges.count()
        stages["apply_plus_edges"] = time.perf_counter() - t0

        sc.setJobDescription(f"rep{rep}: triples recount")
        t0 = time.perf_counter()
        n_triples = triples.count()
        stages["triples_recount"] = time.perf_counter() - t0

        stages["total"] = time.perf_counter() - t_all0
        raw.unpersist(True)
        cmap.unpersist(True)
        print(json.dumps({
            "rep": rep, "vocab": vocab,
            "n_raw": n_raw, "n_map": n_map, "n_edges": n_edges,
            "n_triples": n_triples,
            **{k: round(v, 3) for k, v in stages.items()},
        }), flush=True)
    spark.stop()


def headline_queries(repeats=3):
    from hades_spark.queries import SPARK_QUERIES

    spark, cpus = get_session()
    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    names = ["a1_pricing_summary", "q3_shipping_priority",
             "q5_local_supplier_volume", "j1_three_way_lookup_join",
             "j2_decorrelated_count_join", "w1_adjacent_context_sum",
             "a2_explode_group_count", "t1_recency_topk"]
    for t in ["lineitem", "orders", "customer", "events", "documents"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    for rep in range(repeats):
        out = {}
        for name in names:
            sc.setJobDescription(f"rep{rep}: {name}")
            t0 = time.perf_counter()
            df = SPARK_QUERIES[name](spark, sf_dir)
            df.count()
            out[name] = round(time.perf_counter() - t0, 4)
        print(json.dumps({"rep": rep, **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kg"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if mode == "kg":
        kg_stages(vocab=0, repeats=reps)
    elif mode == "vocab":
        os.environ.setdefault("BENCH_VOCAB_SIZE", "150000")
        kg_stages(vocab=int(os.environ["BENCH_VOCAB_SIZE"]), repeats=reps)
    elif mode == "queries":
        headline_queries(repeats=reps)
    else:
        raise SystemExit(f"unknown mode {mode}")
