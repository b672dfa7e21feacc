"""Unit tests: chunking, embedding, similarity, dedup, linking, graph,
multimodal — tiny synthetic frames, reference-semantics assertions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hades_spark.functions.embedding import HashEmbedder, embed_chunks
from hades_spark.operators.chunking import chunk_text, chunks_table


class TestChunking:
    def test_chunk_text_basic(self):
        text = " ".join(f"t{i}" for i in range(10))
        chunks = chunk_text(text, chunk_size=4, overlap=2)
        # step=2: windows at 0,2,4,6 and the tail window at 6 covers to end
        assert [c["text"].split()[0] for c in chunks] == ["t0", "t2", "t4", "t6"]
        assert chunks[-1]["text"].split()[-1] == "t9"

    def test_spans_slice_original(self):
        text = "alpha   beta\tgamma delta"
        for c in chunk_text(text, chunk_size=2, overlap=1):
            assert text[c["start_char"]:c["end_char"]] == c["text"]

    def test_empty_and_whitespace(self):
        assert chunk_text("", 5, 2) == []
        assert chunk_text("   ", 5, 2) == []

    def test_single_window_when_short(self):
        assert len(chunk_text("a b c", 10, 2)) == 1

    def test_chunks_table_keys(self, spark):
        docs = spark.createDataFrame(
            [("d1", " ".join(f"w{i}" for i in range(12)))], "doc_id string, text string")
        out = chunks_table(docs, chunk_size=5, overlap=2).collect()
        assert [r["chunk_id"] for r in out] == \
            [f"d1_chunk_{i}" for i in range(len(out))]
        assert all(r["total_chunks"] == len(out) for r in out)


class TestHashEmbedder:
    def test_deterministic_and_normalized(self):
        e = HashEmbedder(32)
        v1 = e.encode(["hello world"])
        v2 = e.encode(["hello world"])
        assert np.allclose(v1, v2)
        assert abs(np.linalg.norm(v1[0]) - 1.0) < 1e-5

    def test_similar_strings_high_cosine(self):
        e = HashEmbedder(64)
        m = e.encode(["apache spark", "apache  spark!", "postgresql"])
        sim_close = float(m[0] @ m[1])
        sim_far = float(m[0] @ m[2])
        assert sim_close > sim_far

    def test_embed_chunks_contract(self, spark):
        docs = spark.createDataFrame(
            [("d1", " ".join(f"w{i}" for i in range(20)))],
            "doc_id string, text string")
        ch = chunks_table(docs, chunk_size=8, overlap=2)
        emb = embed_chunks(ch, dim=16).collect()
        assert all(r["embedding_id"].endswith("_emb") for r in emb)
        assert all(len(r["embedding"]) == 16 for r in emb)
        for r in emb:
            assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-4


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        rng = np.random.RandomState(0)
        rows = [(i, rng.standard_normal(8).astype(np.float32).tolist())
                for i in range(50)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_brute_force_topk_matches_numpy(self, emb_df):
        from hades_spark.operators.similarity import brute_force_topk

        rows = {r["vec_id"]: np.array(r["embedding"]) for r in emb_df.collect()}
        q = rows[0]
        scores = {
            i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            for i, v in rows.items()
        }
        want = sorted(scores, key=lambda i: (-scores[i], i))[:5]
        got = [r["vec_id"] for r in
               brute_force_topk(emb_df, q.tolist(), k=5).collect()]
        assert got == want

    def test_topk_join_many_queries(self, emb_df):
        from hades_spark.operators.similarity import topk_join

        qs = emb_df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        cs = emb_df.select(F.col("vec_id").alias("c_id"),
                           F.col("embedding").alias("c_vec"))
        out = topk_join(qs, cs, k=3).collect()
        assert len(out) == 9
        by_q = {}
        for r in out:
            by_q.setdefault(r["q_id"], []).append(r)
        for q_id, rs in by_q.items():
            # rank 1 must be the query itself (cosine 1.0)
            best = min(rs, key=lambda r: r["rank"])
            assert best["c_id"] == q_id

    def test_lsh_topk_self_hit(self, emb_df):
        from hades_spark.operators.similarity import lsh_topk_join

        qs = emb_df.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        cs = emb_df.select(F.col("vec_id").alias("c_id"),
                           F.col("embedding").alias("c_vec"))
        out = lsh_topk_join(qs, cs, dim=8, k=1, n_planes=4).collect()
        # every query shares its own bucket, so rank-1 is itself
        assert {r["q_id"] for r in out} == {0, 1, 2, 3, 4}
        for r in out:
            assert r["c_id"] == r["q_id"]


class TestDedup:
    def test_exact_dedup(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "unrelated")],
            "doc_id long, text string")
        from hades_spark.operators.dedup import exact_dedup

        out = {r["doc_id"]: r["dup_count"] for r in
               exact_dedup(df, "doc_id", "text").collect()}
        assert out == {1: 2, 3: 1}

    def test_minhash_dedup_survivors(self, spark):
        base = " ".join(f"tok{i}" for i in range(60))
        near = base.replace("tok30", "tokX")  # ~1 shingle family changed
        far = " ".join(f"other{i}" for i in range(60))
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id long, text string")
        from hades_spark.operators.dedup import minhash_dedup

        kept = sorted(r["doc_id"] for r in
                      minhash_dedup(df, "doc_id", "text", threshold=0.7).collect())
        assert kept == [1, 3]

    def test_simhash_pairs_near_texts(self, spark):
        base = " ".join(f"tok{i}" for i in range(100))
        near = base + " extra"
        far = " ".join(f"zzz{i}" for i in range(100))
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id long, text string")
        from hades_spark.operators.dedup import simhash_pairs

        pairs = {(r["a"], r["b"]) for r in
                 simhash_pairs(df, "doc_id", "text", max_hamming=8).collect()}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs


class TestLinking:
    def test_strategy_ladder_and_tiebreak(self, spark):
        mentions = spark.createDataFrame(
            [("m1", "Spark", "u1"),
             ("m2", "apache spark", "u2"),
             ("m3", "spark", "u3"),
             ("m4", "nomatch_xyz_qq", "u1")],
            "mention_id string, surface string, url string")
        catalog = spark.createDataFrame(
            [("e1", "Spark", "u9"),
             ("e2", "Apache Spark", "u2"),
             ("e3", "spark streaming", "u3")],
            "entity_id string, name string, source string")
        from hades_spark.operators.linking import link_mentions

        out = {r["mention_id"]: r for r in
               link_mentions(mentions, catalog).collect()}
        # m1: exact-surface match wins (strategy 1)
        assert out["m1"]["entity_id"] == "e1" and out["m1"]["strategy"] == 1
        # m2: normalized match on e2 (strategy 2)
        assert out["m2"]["entity_id"] == "e2" and out["m2"]["strategy"] == 2
        # m3: normalized 'spark' == e1's normalized name (strategy 2)
        assert out["m3"]["entity_id"] == "e1"
        # m4: no candidates
        assert "m4" not in out


class TestGraph:
    def test_bfs_depths(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (9, 9)], "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "node long")
        from hades_spark.operators.graph import bfs

        out = {r["node"]: r["depth"] for r in bfs(edges, seeds, 2).collect()}
        assert out == {1: 0, 2: 1, 3: 2}

    def test_shortest_path(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 5)], "src long, dst long")
        from hades_spark.operators.graph import shortest_path_length

        assert shortest_path_length(edges, 1, 5) == 2
        assert shortest_path_length(edges, 5, 1, max_depth=3) is None


class TestMultimodal:
    def test_metadata_plumbing(self, spark):
        df = spark.createDataFrame(
            [("m1", "image", bytearray(b"imagebytes")),
             ("m2", "audio", bytearray(b"audiobyteslonger")),
             ("m3", "weird", bytearray(b"x"))],
            "media_id string, media_type string, payload binary")
        from hades_spark.functions.multimodal import extract_media_metadata

        out = {r["media_id"]: r for r in extract_media_metadata(df).collect()}
        assert out["m1"]["width"] == 160 + 10 % 1920
        assert out["m2"]["duration_ms"] == 500 + (16 * 131) % 600000
        assert out["m3"]["error"].startswith("unknown media_type")

    def test_real_decoder_is_explicit_stub(self):
        from hades_spark.functions.multimodal import real_decode

        with pytest.raises(NotImplementedError):
            real_decode(b"x", "image")
