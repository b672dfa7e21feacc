"""Reproduce the bench.py flow (8 sf queries -> cold kg pipeline) and
attribute kg_pipeline wall to GC vs compute. Usage:
    SPARK_DRIVER_MEM=8g python scripts/kg_gc_probe.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gc_stats(spark):
    mf = spark._jvm.java.lang.management.ManagementFactory
    total_ms = 0
    counts = 0
    for b in mf.getGarbageCollectorMXBeans():
        total_ms += b.getCollectionTime()
        counts += b.getCollectionCount()
    return total_ms, counts


def main():
    from hades_spark.queries import SPARK_QUERIES
    from hades_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    log_conf = Path(__file__).resolve().parent / "bench_log4j2.properties"
    spark = get_spark(
        "kg_gc_probe", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions":
                f"-Dlog4j.configurationFile=file:{log_conf}",
        })
    spark.sparkContext.setLogLevel("ERROR")

    for t in ["lineitem", "orders", "customer", "events", "documents"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    names = ["a1_pricing_summary", "q3_shipping_priority",
             "q5_local_supplier_volume", "j1_three_way_lookup_join",
             "j2_decorrelated_count_join", "w1_adjacent_context_sum",
             "a2_explode_group_count", "t1_recency_topk"]
    tq0 = time.perf_counter()
    for name in names:
        SPARK_QUERIES[name](spark, sf_dir).count()
    tq = time.perf_counter() - tq0

    from pyspark.sql import functions as F  # noqa: F401

    from hades_spark.pipeline.kg import canonical_triples, distinct_edges

    corpus_dir = "/tmp/hades_bench_corpus/pages_v2_n20000_r30_s42"
    pages = spark.read.parquet(corpus_dir)

    g0, c0 = gc_stats(spark)
    t0 = time.perf_counter()
    caches = []
    triples = canonical_triples(pages, caches=caches)
    edges = distinct_edges(triples)
    n_edges = edges.count()
    kg_sec = time.perf_counter() - t0
    n_triples = triples.count()
    g1, c1 = gc_stats(spark)
    print({"queries_sec": round(tq, 2), "kg_sec": round(kg_sec, 2),
           "gc_delta_ms": g1 - g0, "gc_count_delta": c1 - c0,
           "edges": n_edges, "triples": n_triples,
           "heap": os.environ.get("SPARK_DRIVER_MEM", "8g")}, flush=True)
    for c in caches:
        c.unpersist(True)
    spark.stop()


if __name__ == "__main__":
    main()
