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
