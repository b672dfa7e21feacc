#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

The north rule's deployment shape::

    scripts/package.sh                       # builds dist/hades_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/hades_spark.zip \\
        scripts/submit_kg.py \\
        --input  s3://bucket/pages/          # or omit for a synthetic corpus
        --output /path/to/edges \\
        --metrics /path/to/metrics

Reads an (url, warc_ts, html, text, lang) pages table (BASELINE.json
input_hint — parquet here, Iceberg on a real deployment), runs
extract -> triples -> canonicalize -> edge dedup with per-stage metrics,
writes the edge table partitioned by pred, and prints ONE JSON line of
stage metrics to stdout. No ``local[...]`` is hard-coded: the master
comes from spark-submit, so the same script runs at N and 4N executors.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="pages parquet dir; omit to synthesize --pages")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc"],
                    help="'warc' reads raw .warc/.warc.gz crawl files via "
                         "sources/warc.py (one file per task) and extracts "
                         "text in-pipeline")
    ap.add_argument("--pages", type=int, default=1000,
                    help="synthetic corpus size when --input is omitted")
    ap.add_argument("--vocab", type=int, default=0,
                    help="synthetic entity vocabulary size (0 = legacy)")
    ap.add_argument("--output", required=True, help="edge table dir")
    ap.add_argument("--metrics", default=None, help="metrics table dir")
    ap.add_argument("--run-id", default="submit0")
    args = ap.parse_args()
    if args.input_format == "warc" and not args.input:
        ap.error("--input-format warc requires --input (a WARC dir/glob)")

    # spark-submit provides master/deploy config; plain builder here
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("hades_kg_submit")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    from hades_spark.pipeline.metrics import run_kg_pipeline_metered

    if args.input and args.input_format == "warc":
        from hades_spark.sources.warc import warc_pages_df

        pages = warc_pages_df(spark, args.input)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        from hades_spark.pipeline.corpus import pages_df_distributed

        pages = pages_df_distributed(
            spark, args.pages, seed=42, vocab_size=args.vocab)

    edges, metrics = run_kg_pipeline_metered(
        spark, pages, metrics_path=args.metrics, run_id=args.run_id)
    edges.write.mode("overwrite").partitionBy("pred").parquet(args.output)
    print(json.dumps({"run_id": args.run_id, "stages": metrics,
                      "edges": metrics["materialize_edges"]["rows"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
