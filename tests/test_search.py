"""Semantic-search cascade tests (operators/search.py)."""

from pyspark.sql import functions as F

from hades_spark.functions.embedding import embed_text_column
from hades_spark.operators.search import (
    decompose_merge, hybrid_rerank, semantic_topk, with_context,
)


def _chunks(spark):
    rows = [
        ("d1", 0, "apache spark runs distributed queries"),
        ("d1", 1, "the cat sat on the mat"),
        ("d1", 2, "window functions partition rows"),
        ("d2", 0, "postgres stores relational tables"),
        ("d2", 1, "spark sql optimizes logical plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, chunk_index int, text string")
    return embed_text_column(df, "text", "embedding", dim=64)


class TestSearch:
    def test_semantic_topk_finds_similar(self, spark):
        emb = _chunks(spark)
        hits = semantic_topk(emb, "apache spark distributed", k=2).collect()
        assert (hits[0]["doc_id"], hits[0]["chunk_index"]) == ("d1", 0)

    def test_hybrid_rerank_boosts_keyword_hits(self, spark):
        emb = _chunks(spark)
        hits = semantic_topk(emb, "spark", k=5)
        fused = hybrid_rerank(hits, emb.drop("embedding"), "spark").collect()
        # fused = 0.7*cosine + 0.3*kw: cosine may be negative, so the bound
        # is [-1, 1]; the top hit must actually contain the keyword
        top = fused[0]
        assert "spark" in top["text"]
        assert all(-1.0 <= r["fused_score"] <= 1.0 for r in fused)

    def test_decompose_merge_multi_query_boost(self, spark):
        emb = _chunks(spark)
        out = decompose_merge(emb, ["apache spark", "spark sql"], k=5)
        rows = {(r["doc_id"], r["chunk_index"]): r for r in out.collect()}
        assert rows  # non-empty
        multi = [r for r in rows.values() if r["n_queries"] == 2]
        for r in multi:
            assert r["merged_score"] >= r["score"]

    def test_with_context_window(self, spark):
        emb = _chunks(spark)
        hits = semantic_topk(emb, "window functions", k=1)
        ctx = with_context(hits, emb.drop("embedding"), n_context=1).collect()[0]
        assert len(ctx["context_texts"]) == 2  # chunk 2 has left neighbor only


class TestStructuralRerank:
    def test_centrality_blend(self, spark):
        from hades_spark.operators.search import (
            centrality_features, structural_rerank)

        emb = _chunks(spark)
        feats = centrality_features(
            emb.withColumn("grp", F.lit("g")), "grp",
            ("doc_id",), vec_col="embedding") \
            .groupBy("doc_id").agg(F.avg("centrality").alias("centrality"))
        hits = semantic_topk(emb, "spark", k=5).withColumn(
            "doc_id", F.col("doc_id").cast("string"))
        out = structural_rerank(
            hits, feats, join_cols=("doc_id",)).collect()
        assert len(out) == 5
        scores = [r["structural_score"] for r in out]
        assert scores == sorted(scores, reverse=True)


class TestDecomposeQuery:
    def test_splits_conjunctions_and_punctuation(self):
        from hades_spark.operators.search import decompose_query

        assert decompose_query("window joins and shuffle skew") == \
            ["window joins", "shuffle skew"]
        assert decompose_query("hash agg, sort merge; broadcast join") == \
            ["hash agg", "sort merge", "broadcast join"]
        assert decompose_query("spark vs. flink throughput") == \
            ["spark", "flink throughput"]

    def test_short_single_words_dropped_and_dedup(self):
        from hades_spark.operators.search import decompose_query

        # 'ml' is a <4-char single word -> dropped; dedupe case-insensitive
        assert decompose_query("ml and Window Sort and window sort") == \
            ["Window Sort"]

    def test_fallback_to_original(self):
        from hades_spark.operators.search import decompose_query

        # every fragment is a short single word -> falls back to original
        assert decompose_query("ml, ai; db") == ["ml, ai; db"]


class TestCascadeTail:
    def _emb(self, spark):
        from hades_spark.functions.embedding import embed_text_column

        chunks = spark.createDataFrame(
            [("d1", 0, "window sort merge join strategies"),
             ("d1", 1, "partition skew salting tricks"),
             ("d2", 0, "unrelated cooking recipe text here"),
             ("d3", 0, "window functions and sort order")],
            "doc_id string, chunk_index int, text string")
        return chunks, embed_text_column(chunks, "text", "embedding", dim=32)

    def test_anchor_rerank_blends_and_sorts(self, spark):
        from hades_spark.operators.search import anchor_rerank, semantic_topk

        chunks, emb = self._emb(spark)
        hits = semantic_topk(emb, "window sort", k=4, dim=32)
        out = anchor_rerank(hits, emb, anchor_id="d1", alpha=0.6).collect()
        assert [c in out[0].asDict() for c in
                ("anchor_similarity", "anchor_fused_score")] == [True, True]
        # fused = 0.6*score + 0.4*max(0, sim), verified on one row
        r = out[0]
        assert abs(r["anchor_fused_score"]
                   - round(0.6 * r["score"]
                           + 0.4 * max(0.0, r["anchor_similarity"]), 4)) < 2e-4
        scores = [r["anchor_fused_score"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_anchor_vector_rides_one_row_broadcast(self, spark):
        """At the reference's 2048 dims the anchor vector must ride a
        broadcast ONE-ROW frame (query_vec_frame), never 2048 per-dim
        literals baked into the plan: the plan carries a
        BroadcastNestedLoopJoin for the one-row frame and the codegen'd
        plan text stays small."""
        from hades_spark.functions.embedding import embed_text_column
        from hades_spark.operators.search import anchor_rerank, semantic_topk

        dim = 2048
        chunks = spark.createDataFrame(
            [("d1", 0, "window sort merge join"),
             ("d2", 0, "partition skew salting")],
            "doc_id string, chunk_index int, text string")
        emb = embed_text_column(chunks, "text", "embedding", dim=dim)
        hits = semantic_topk(emb, "window sort", k=2, dim=dim)
        out = anchor_rerank(hits, emb, anchor_id="d1")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one-row-frame join present; no literal-array blowup: a 2048-
        # literal array would make the plan text megabytes long
        assert "BroadcastNestedLoopJoin" in plan
        assert len(plan) < 200_000
        rows = out.collect()
        assert rows and rows[0]["anchor_similarity"] is not None

    def test_anchor_missing_passthrough(self, spark):
        from hades_spark.operators.search import anchor_rerank, semantic_topk

        chunks, emb = self._emb(spark)
        hits = semantic_topk(emb, "window sort", k=2, dim=32)
        out = anchor_rerank(hits, emb, anchor_id="nope").collect()
        assert all(r["anchor_similarity"] == 0.0 for r in out)
        assert all(abs(r["anchor_fused_score"] - r["score"]) < 1e-9
                   for r in out)

    def test_crossencoder_standin_orders_by_pair_score(self, spark):
        from hades_spark.operators.search import (
            crossencoder_rerank, semantic_topk)

        chunks, emb = self._emb(spark)
        hits = semantic_topk(emb, "window sort", k=4, dim=32) \
            .join(chunks, ["doc_id", "chunk_index"])
        out = crossencoder_rerank(hits, "window sort", limit=3).collect()
        assert len(out) == 3
        scores = [r["cross_encoder_score"] for r in out]
        assert scores == sorted(scores, reverse=True)
        # the chunk containing both query terms must beat the recipe chunk
        assert out[0]["doc_id"] in ("d1", "d3")

    def test_crossencoder_scorer_seam(self, spark):
        from hades_spark.operators.search import (
            crossencoder_rerank, semantic_topk)

        chunks, emb = self._emb(spark)
        hits = semantic_topk(emb, "window", k=4, dim=32) \
            .join(chunks, ["doc_id", "chunk_index"])
        # injected scorer: reverse-alphabetical by doc_id, proving the seam
        def scorer(pairs):
            return [float(ord(p[1][0])) for p in pairs]
        out = crossencoder_rerank(hits, "q", limit=4, scorer=scorer).collect()
        assert [r["cross_encoder_score"] for r in out] == \
            sorted([r["cross_encoder_score"] for r in out], reverse=True)

    def test_six_stage_cascade_composes(self, spark, sf_dir):
        from hades_spark.queries import SPARK_QUERIES

        out = SPARK_QUERIES["t3_cascade_full"](spark, sf_dir)
        rows = out.collect()
        assert 0 < len(rows) <= 10
        cols = set(rows[0].asDict())
        assert {"fused_score", "structural_score", "anchor_fused_score",
                "cross_encoder_score", "n_context"} <= cols
        # final order is the cross-encoder stage's (documented score order)
        ce = [r["cross_encoder_score"] for r in rows]
        assert ce == sorted(ce, reverse=True)

    def test_decompose_merge_one_pass_matches_per_query(self, spark):
        from hades_spark.functions.embedding import HashEmbedder
        from hades_spark.operators.search import (
            decompose_merge, semantic_topk)

        chunks, emb = self._emb(spark)
        subs = ["window sort", "partition skew"]
        got = {(r["doc_id"], r["chunk_index"]):
               (round(r["score"], 6), r["n_queries"])
               for r in decompose_merge(emb, subs, k=3, dim=32).collect()}
        # reference computation: per-query top-3 then merge
        per = {}
        for i, q in enumerate(subs):
            for r in semantic_topk(emb, q, k=3, dim=32).collect():
                key = (r["doc_id"], r["chunk_index"])
                s, qs = per.get(key, (0.0, set()))
                per[key] = (max(s, r["score"]), qs | {i})
        want = {k: (round(s, 6), len(qs)) for k, (s, qs) in per.items()}
        assert got == want


class TestRrfFuse:
    def test_closed_form(self, spark):
        from pyspark.sql import functions as F

        from hades_spark.operators.search import rrf_fuse

        a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)],
                                  "doc_id long, score double")
        b = spark.createDataFrame([(3, 0.9), (4, 0.5)],
                                  "doc_id long, score double")
        out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
        assert abs(out[1]["rrf_score"] - 1 / 61) < 1e-12
        assert abs(out[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-12
        assert out[3]["n_lists"] == 2 and out[1]["n_lists"] == 1
        assert out[4]["rrf_score"] == 1 / 62     # rank from ITS list
        # tie broken by id asc: equal scores rank deterministically
        t = spark.createDataFrame([(7, 1.0), (5, 1.0)],
                                  "doc_id long, score double")
        r = {x["doc_id"]: x["rrf_score"]
             for x in rrf_fuse([t], k=60).collect()}
        assert r[5] == 1 / 61 and r[7] == 1 / 62
        import pytest as _pt
        with _pt.raises(ValueError, match="non-empty"):
            rrf_fuse([])
