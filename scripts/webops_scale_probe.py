"""Scale probe for the fourteenth-session web-pipeline operators, at
synthetic 10^5–10^7 row scale (spark.range-derived text; the WARC probe
writes real .warc.gz files since the container parse IS the operator):

1. `repetition_signals` over 500k docs x 30 words (15M words -> ~29M
   exploded grams): wall, docs/s — the Gopher filter-pass price.
2. `line_dedup` over 1M docs x 6 lines (2 drawn from a 500-line
   boilerplate pool, 4 unique): wall, docs/s, and the removed-line count
   checked against the closed-form expectation (exactly the 2 pool lines
   per doc are removed; unique lines all survive).
3. WARC container parse: 64 member-gzipped files x 2,000 records (~1 KiB
   HTTP bodies) through `warc_records_df`: records/s at per-file task
   granularity (the Common-Crawl shape: file count = task count).
4. `robots_gate` over 2M urls against 1,000 hosts x 6 rules (5 literal
   prefixes + 1 wildcard): urls/s; literal rules ride codegen startswith,
   only the wildcard pays the per-row regex.

Usage: python scripts/webops_scale_probe.py [cores]
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hades_spark.operators.quality import (line_dedup,  # noqa: E402
                                           repetition_signals)
from hades_spark.operators.robots import (robots_gate,  # noqa: E402
                                          robots_rules_df)
from hades_spark.session import get_spark  # noqa: E402
from hades_spark.sources.warc import (make_http_response,  # noqa: E402
                                      make_warc_bytes, warc_records_df)


def emit(d: dict) -> None:
    print(json.dumps(d), flush=True)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("webops_probe", master=f"local[{cores}]",
                      shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. repetition_signals ------------------------------------------
    n_docs, n_words, vocab = 500_000, 30, 10_000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform(
            F.sequence(F.lit(1), F.lit(n_words)),
            lambda i: F.concat(F.lit("w"), F.pmod(
                F.xxhash64("id", i), F.lit(vocab)).cast("string"))),
            " ").alias("text")).localCheckpoint()
    t0 = time.monotonic()
    agg = repetition_signals(docs).agg(
        F.count("*").alias("n"),
        F.avg("dup_gram_frac").alias("avg_dup"),
        F.avg("top_gram_char_frac").alias("avg_top")).collect()[0]
    sec = time.monotonic() - t0
    emit({"probe": "repetition_signals", "docs": n_docs,
          "words_per_doc": n_words, "sec": round(sec, 2),
          "docs_per_sec": round(n_docs / sec),
          "avg_dup_gram_frac": round(agg.avg_dup, 5),
          "avg_top_gram_char_frac": round(agg.avg_top, 5)})

    # ---- 2. line_dedup ----------------------------------------------------
    n_docs2, pool = 1_000_000, 500
    pages = spark.range(n_docs2).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("boiler-"), F.pmod(F.xxhash64("id", F.lit(1)),
                                     F.lit(pool)).cast("string"),
            F.lit("\nunique line a "), F.col("id").cast("string"),
            F.lit("\nunique line b "), F.col("id").cast("string"),
            F.lit("\nboiler-"), F.pmod(F.xxhash64("id", F.lit(2)),
                                       F.lit(pool)).cast("string"),
            F.lit("\nunique line c "), F.col("id").cast("string"),
            F.lit("\nunique line d "), F.col("id").cast("string"),
        ).alias("text")).localCheckpoint()
    t0 = time.monotonic()
    out = line_dedup(pages, min_docs=10).agg(
        F.count("*").alias("n"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_lines").alias("total")).collect()[0]
    sec = time.monotonic() - t0
    # every pool line is shared by ~2M/500 >> 10 docs: exactly 2 removed/doc
    assert out.n == n_docs2 and out.removed == 2 * n_docs2, out
    emit({"probe": "line_dedup", "docs": n_docs2, "lines": int(out.total),
          "removed": int(out.removed), "sec": round(sec, 2),
          "docs_per_sec": round(n_docs2 / sec)})

    # ---- 3. WARC parse ----------------------------------------------------
    n_files, recs_per = 64, 2_000
    body = (b"<html><body>" + b"crawled content block " * 40 + b"</body>")
    recs = [{"warc_type": "response",
             "url": f"https://probe.example/{i}",
             "date": "2024-01-01T00:00:00Z",
             "payload": make_http_response(body),
             "headers": {"Content-Type": "application/http"}}
            for i in range(recs_per)]
    blob = make_warc_bytes(recs, compress="member")
    tmp = tempfile.mkdtemp(prefix="warc_probe_")
    try:
        for k in range(n_files):
            with open(f"{tmp}/part-{k:03d}.warc.gz", "wb") as f:
                f.write(blob)
        t0 = time.monotonic()
        n = warc_records_df(spark, tmp).where(
            F.col("http_status") == 200).count()
        sec = time.monotonic() - t0
        assert n == n_files * recs_per, n
        emit({"probe": "warc_parse", "files": n_files, "records": n,
              "gz_bytes_per_file": len(blob), "sec": round(sec, 2),
              "records_per_sec": round(n / sec)})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- 4. robots_gate ----------------------------------------------------
    n_hosts, n_urls = 1_000, 2_000_000
    robots = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".com")).alias("host"),
        F.lit("User-agent: *\n"
              "Disallow: /private/\n"
              "Allow: /private/pub/\n"
              "Disallow: /admin/\n"
              "Disallow: /tmp/\n"
              "Allow: /tmp/ok/\n"
              "Disallow: /*.pdf$\n").alias("robots_txt"))
    rules = robots_rules_df(robots).localCheckpoint()
    urls = spark.range(n_urls).select(
        F.col("id"),
        F.concat(F.lit("h"), F.pmod(F.xxhash64("id"),
                                    F.lit(n_hosts)).cast("string"),
                 F.lit(".com")).alias("host"),
        F.element_at(
            F.array(F.lit("/page/"), F.lit("/private/"),
                    F.lit("/private/pub/"), F.lit("/admin/"),
                    F.lit("/tmp/ok/")),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(5)) + 1).cast("int"))
         .alias("prefix"))
    # ~1/11 of ROWS get the .pdf suffix (hash the row id, not the
    # 5-valued prefix) so the wildcard rule is actually exercised
    urls = urls.select(
        "host",
        F.concat("prefix", F.col("host"),
                 F.when(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(11)) == 0,
                        F.lit("x.pdf")).otherwise(F.lit("x.html")))
         .alias("path")).localCheckpoint()
    t0 = time.monotonic()
    verdicts = robots_gate(urls, rules).groupBy("allowed").count().collect()
    sec = time.monotonic() - t0
    emit({"probe": "robots_gate", "urls": n_urls, "hosts": n_hosts,
          "rules_per_host": 6, "sec": round(sec, 2),
          "urls_per_sec": round(n_urls / sec),
          "verdicts": {str(r.allowed): r["count"] for r in verdicts}})

    spark.stop()


if __name__ == "__main__":
    main()
