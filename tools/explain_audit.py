"""Plan-shape audit: assert the physical plans we designed for.

Checks (printed + exit code):
- s1: parquet scan has PushedFilters + pruned ReadSchema (2 columns);
- j1/j5: broadcast joins chosen (BroadcastHashJoin);
- t1: orderBy+limit compiled to TakeOrderedAndProject;
- a1: partial aggregation (two HashAggregate levels);
- w1: single shuffle (one Exchange) for the window;
- kg stage-1: no Exchange before the mapInArrow (narrow extraction).

Run: python tools/explain_audit.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    from pyspark.sql import functions as F

    from hades_spark.queries import SPARK_QUERIES
    from hades_spark.session import get_spark

    sf = "/root/testdata/sf0.01"
    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    failures = []

    def check(name, df, preds):
        plan = plan_of(df)
        for desc, fn in preds:
            ok = fn(plan)
            print(f"{'ok  ' if ok else 'FAIL'} {name}: {desc}")
            if not ok:
                failures.append((name, desc))

    q = SPARK_QUERIES
    check("s1", q["s1_scan_project_filter"](spark, sf), [
        ("filter pushed to scan", lambda p: "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in p),
        ("column-pruned ReadSchema", lambda p: "l_comment" not in p and "l_shipdate" not in p),
    ])
    check("j1", q["j1_three_way_lookup_join"](spark, sf), [
        ("broadcast join used", lambda p: "BroadcastHashJoin" in p),
    ])
    check("j5", q["j5_broadcast_dim_join"](spark, sf), [
        ("both dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 2),
    ])
    check("t1", q["t1_recency_topk"](spark, sf), [
        ("TakeOrderedAndProject (no global sort)", lambda p: "TakeOrderedAndProject" in p),
    ])
    check("a1", q["a1_pricing_summary"](spark, sf), [
        ("map-side partial aggregation", lambda p: p.count("HashAggregate") >= 2),
    ])
    check("w1", q["w1_adjacent_context_sum"](spark, sf), [
        # count tree nodes ("Exchange (n)"), not the detail section echoes
        ("exactly one shuffle", lambda p: p.count("Exchange (") == 1),
    ])

    from hades_spark.functions.triples import raw_triples
    from hades_spark.pipeline.corpus import pages_df

    pages = pages_df(spark, 10, with_text=False)
    check("kg_stage1", raw_triples(pages), [
        ("narrow (no Exchange before extraction)", lambda p: "Exchange" not in p),
    ])

    # decompose_merge: ALL sub-queries scored in ONE embeddings scan
    from hades_spark.functions.embedding import embed_text_column
    from hades_spark.operators.chunking import chunks_table
    from hades_spark.operators.search import decompose_merge

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = embed_text_column(
        chunks_table(docs, chunk_size=40, overlap=10),
        "text", "embedding", dim=32)
    dm = decompose_merge(emb, ["window sort", "hash join", "skew salt"], k=5,
                         dim=32)
    import re as _re

    check("decompose_merge", dm, [
        # count distinct scan NODES ("(n) Scan parquet" detail headers),
        # not tree echoes
        ("one embeddings scan for 3 sub-queries",
         lambda p: len(_re.findall(r"\(\d+\) Scan parquet", p)) == 1),
    ])

    # entity linking: catalog joins are all broadcast (map-side ladder)
    from hades_spark.operators.linking import link_mentions

    mentions = spark.createDataFrame(
        [("m1", "Apache Spark", "u1"), ("m2", "spark", "u2")],
        "mention_id string, surface string, url string")
    catalog = spark.createDataFrame(
        [("e1", "Apache Spark", "kb")],
        "entity_id string, name string, source string")
    check("linking", link_mentions(mentions, catalog), [
        ("3-strategy ladder all broadcast",
         lambda p: p.count("BroadcastHashJoin") >= 3
         and "SortMergeJoin" not in p),
    ])

    # partition-scoped upsert reads only affected partitions
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        from hades_spark.sources.io import write_table

        write_table(spark.createDataFrame(
            [("k1", 1, "a"), ("k2", 2, "b")],
            "k string, v int, part string"), f"{td}/t",
            partition_by=["part"])
        new = spark.createDataFrame([("k9", 9, "a")],
                                    "k string, v int, part string")
        affected = new.select("part").dropDuplicates(["part"])
        pruned = spark.read.parquet(f"{td}/t").join(
            F.broadcast(affected), ["part"], "left_semi")
        check("upsert_prune", pruned, [
            # require a NON-EMPTY partition filter (or dynamic pruning) —
            # "PartitionFilters: []" means the scan reads every partition
            ("partition filters reach the scan",
             lambda p: ("dynamicpruning" in p.lower())
             or ("PartitionFilters: [" in p
                 and "PartitionFilters: []" not in p)),
        ])

    # LSH verification tail: small vocab broadcasts BOTH shingle sides
    # (the multi-M-row candidate frame never shuffles); past the row
    # threshold it degrades to a shuffle join
    from hades_spark.operators.lsh import (char_shingles,
                                           lsh_candidate_pairs, pair_scores)

    vocab = spark.createDataFrame(
        [("apachespark",), ("apache spark",), ("commoncrawl",),
         ("common crawl",), ("spark",)], "s string")
    keyed = vocab.select(F.col("s").alias("_id"),
                         char_shingles(F.col("s"), 3).alias("sh")) \
        .filter(F.size("sh") > 0).localCheckpoint()
    cand = lsh_candidate_pairs(keyed, "_id", "sh", num_hashes=16, bands=16,
                               max_bucket_size=150)
    check("verify_tail_broadcast", pair_scores(cand, keyed, 0.8,
                                               "containment"), [
        ("both shingle sides broadcast",
         lambda p: p.count("BroadcastHashJoin") >= 2),
    ])
    check("verify_tail_shuffle", pair_scores(cand, keyed, 0.8, "containment",
                                             broadcast_threshold_rows=0), [
        ("web-scale vocab degrades to shuffle join",
         lambda p: "ShuffledHashJoin" in p or "SortMergeJoin" in p),
    ])

    # as-of join compiles to a JOIN-FREE union+window plan: one Exchange
    # on the key, zero join nodes (the naive theta-join would be a
    # BroadcastNestedLoopJoin)
    check("asof_join", q["tj_asof_join"](spark, sf), [
        ("join-free (union + running window)",
         lambda p: "Join" not in p),
        ("single shuffle on the key",
         lambda p: p.count("Exchange (") == 1),
    ])

    # range join: interval containment through the bucketed equi-join —
    # a real hash/merge join on the bucket id, never a nested loop
    check("range_join", q["tj_range_join"](spark, sf), [
        ("equi-join on bucket id, no nested loop",
         lambda p: "BroadcastNestedLoop" not in p
         and "CartesianProduct" not in p
         and ("SortMergeJoin" in p or "ShuffledHashJoin" in p
              or "BroadcastHashJoin" in p)),
    ])

    # interval-overlap join: same bucketed shape, and the exactly-once
    # pair emission comes from the start-bucket filter — the raw operator
    # plan contains NO aggregate/dedup node at all
    from hades_spark.operators.temporal import interval_join

    iva = spark.createDataFrame([(0, 10, "a1")], "s int, e int, aid string")
    ivb = spark.createDataFrame([(5, 8, "b1")], "ws int, we int, bid string")
    check("interval_join",
          interval_join(iva, ivb, "s", "e", "ws", "we", bucket_width=4), [
              ("no nested loop",
               lambda p: "BroadcastNestedLoop" not in p
               and "CartesianProduct" not in p),
              ("exactly-once without a dedup node",
               lambda p: "HashAggregate" not in p
               and "SortAggregate" not in p),
          ])

    # CMS estimation: the sketch side is <= depth*width rows by
    # construction, so the estimate join MUST be a broadcast (a shuffled
    # join here would re-exchange the corpus-sized candidate frame); the
    # heavy-hitter readout MUST compile to TakeOrderedAndProject, never a
    # global sort
    from hades_spark.operators.sketch import cms_heavy_hitters

    ev = spark.read.parquet(f"{sf}/events.parquet")
    check("cms_heavy_hitters",
          cms_heavy_hitters(ev, "user_id", k=10, depth=4, width=2048), [
              ("sketch broadcast into estimation",
               lambda p: "BroadcastHashJoin" in p),
              ("top-k readout is TakeOrderedAndProject",
               lambda p: "TakeOrderedAndProject" in p),
          ])

    # deterministic sampling: the hash gate is a plain predicate — whole
    # plan is scan+filter+project, no Exchange, no Python eval node
    from hades_spark.operators.sampling import stratified_mix

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    check("stratified_mix",
          stratified_mix(docs, "doc_id", "lang", {"en": 0.5}, 0.1), [
              ("zero shuffles", lambda p: "Exchange" not in p),
              ("no Python eval in the gate",
               lambda p: "BatchEvalPython" not in p and "ArrowEval" not in p),
          ])

    # bloom runtime-filter semi-join: the getbit probe must reach the big
    # side BEFORE any exchange on its key — candidate plan has the probe
    # and no hashpartitioning on the pruned key (only the bitmap build's
    # own word/SinglePartition exchanges)
    from hades_spark.operators.bloom import bloom_semi_join

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet") \
        .filter(F.col("o_orderpriority") == "1-URGENT")
    cand = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey",
                           confirm=False)
    check("bloom_prune", cand, [
        ("bit probe in plan", lambda p: "getbit" in p),
        ("no exchange on the pruned key",
         lambda p: not any("l_orderkey" in seg.split(")")[0]
                           for seg in p.split("Exchange hashpartitioning(")[1:])),
    ])
    confirmed = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    check("bloom_semi_join", confirmed, [
        ("confirm join present",
         lambda p: "LeftSemi" in p),
        ("probe below the confirm join",
         lambda p: "getbit" in p),
    ])

    # weighted sampling: global top-k by the exponential race key must be
    # TakeOrderedAndProject (per-partition heaps), never a range-partition
    # sort of the corpus
    from hades_spark.operators.sampling import weighted_sample_topk

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    check("weighted_sample", weighted_sample_topk(docs, "doc_id", "n_chars",
                                                  k=100, seed=1), [
        ("TakeOrderedAndProject", lambda p: "TakeOrderedAndProject" in p),
        ("no range-partition sort",
         lambda p: "Exchange rangepartitioning" not in p),
        ("no python eval", lambda p: "EvalPython" not in p),
    ])

    # url canonicalization rollup: whole query is one shuffle (the final
    # groupBy) and zero Python UDFs — every rule is JVM column algebra
    check("web_url_host_stats", q["web_url_host_stats"](spark, sf), [
        # count(DISTINCT norm_url) correctly plans as the two-level
        # shuffle (partial on (domain, norm_url), final on domain) —
        # exactly two exchanges, nothing else
        ("two exchanges (the distinct agg), none extra",
         lambda p: p.count("Exchange (") == 2),
        ("no python eval", lambda p: "EvalPython" not in p),
    ])

    # triangle count: degree-ordered wedge join must stay an equi-join —
    # a nested-loop/cartesian here would square the hub degree
    from hades_spark.operators.graph import triangle_count

    tri_edges = docs.select(
        (F.col("doc_id") % 40).alias("src"), (F.col("doc_id") % 97).alias("dst"))
    check("triangle_count", triangle_count(tri_edges), [
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("no nested-loop join", lambda p: "BroadcastNestedLoopJoin" not in p),
    ])

    # bigram LM: instance-vs-counts joins are equi-joins; the only
    # nested-loop is the intended 1-row broadcast vocab attach
    from hades_spark.operators.lm import bigram_quality_scores, train_bigram_lm

    lm = train_bigram_lm(docs)
    check("lm_bigram_quality", bigram_quality_scores(docs, lm), [
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("only the 1-row vocab broadcast is nested-loop",
         lambda p: p.count("BroadcastNestedLoopJoin (") <= 1),
        ("partial aggregation engaged", lambda p: "partial_" in p),
    ])

    # BM25: readout is TakeOrderedAndProject; query-term filter reaches
    # the explode side (no post-agg filter), no python eval
    from hades_spark.operators.tfidf import bm25_topk

    check("bm25", bm25_topk(docs, ["spark", "hash"], k=5), [
        ("TakeOrderedAndProject readout",
         lambda p: "TakeOrderedAndProject" in p),
        ("no python eval", lambda p: "EvalPython" not in p),
    ])

    # sequence packing: the corpus-wide window is PARTITIONED (by the
    # range segment) — the only single-partition window is the <=P-row
    # offsets frame
    from hades_spark.operators.packing import pack_sequences

    packed = pack_sequences(
        docs.select("doc_id", F.col("n_chars").alias("n_tokens")),
        capacity=512, num_segments=4)
    check("pack_sequences", packed, [
        ("range partitioning on the order key",
         lambda p: "rangepartitioning(_k" in p),
        ("segment-partitioned corpus window",
         lambda p: "windowspecdefinition(_seg" in p),
    ])

    # repetition signals: pure column-algebra n-grams — no window over the
    # corpus, no Python eval anywhere in the plan
    from hades_spark.operators.quality import line_dedup, repetition_signals

    check("repetition_signals", repetition_signals(docs), [
        ("no window function", lambda p: "Window" not in p),
        ("no python eval", lambda p: "EvalPython" not in p),
    ])

    # line dedup: the bounded boilerplate set rides a broadcast into the
    # anti-join (the corpus-sized line frame never re-shuffles for it)
    check("line_dedup", line_dedup(docs, min_docs=3), [
        ("boilerplate set broadcast into anti-join",
         lambda p: "BroadcastHashJoin" in p and "LeftAnti" in p),
        ("no python eval", lambda p: "EvalPython" not in p),
    ])

    # robots gate: rules ride a broadcast; the precedence argmax is a
    # combinable aggregate, never a window over the url table
    from hades_spark.operators.robots import robots_gate, robots_rules_df

    rb = spark.createDataFrame(
        [(f"h{k}.com",
          "User-agent: *\nDisallow: /private/\nAllow: /private/pub/"
          "\nDisallow: /*.pdf$") for k in range(8)],
        ["host", "robots_txt"])
    rurls = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string"),
                 F.lit(".com")).alias("host"),
        F.concat(F.lit("/private/"), F.col("doc_id").cast("string"))
         .alias("path"))
    check("robots_gate", robots_gate(rurls, robots_rules_df(rb)), [
        ("rules broadcast into url join",
         lambda p: "BroadcastHashJoin" in p),
        ("no window over urls", lambda p: "Window" not in p),
    ])

    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
