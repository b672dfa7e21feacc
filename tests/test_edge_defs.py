"""Schema-driven edge materializer tests (reference semantics:
tests/core/database/test_nl_graph_materialize.py cases restated)."""

from pyspark.sql import functions as F

from hades_spark.plans.edge_defs import (
    EdgeDef, build_chain_edges, build_standard_edges, materialize_edges,
    named_graph_view,
)


def _nodes(spark):
    rows = [
        # (node_id, node_type, props)
        ("papers/p1", "papers", {"cites": "papers/p2, papers/p3",
                                 "year": "2020"}),
        ("papers/p2", "papers", {"cites": "papers/p3"}),
        ("papers/p3", "papers", {}),
        ("papers/p4", "papers", {"cites": "papers/MISSING"}),  # bad target
        ("lineages/l1", "lineages", {"chain": "papers/p1, papers/p2, papers/p3"}),
        ("authors/a1", "authors", {"cites": "papers/p1"}),  # wrong type
    ]
    return spark.createDataFrame(
        rows, "node_id string, node_type string, props map<string,string>")


CITES = EdgeDef("cites", "cites", ("papers",), edge_attributes=("year",))
CHAIN = EdgeDef("lineage_step", "chain", ("lineages",), kind="chain")


class TestStandardEdges:
    def test_explode_resolve_validate(self, spark):
        edges = build_standard_edges(_nodes(spark), CITES).collect()
        got = {(r["src"], r["dst"]) for r in edges}
        # p1->p2, p1->p3, p2->p3; p4->MISSING skipped; authors/a1 not scanned
        assert got == {("papers/p1", "papers/p2"), ("papers/p1", "papers/p3"),
                       ("papers/p2", "papers/p3")}

    def test_edge_attributes_copied(self, spark):
        edges = {(r["src"], r["dst"]): r for r in
                 build_standard_edges(_nodes(spark), CITES).collect()}
        assert edges[("papers/p1", "papers/p2")]["year"] == "2020"
        assert edges[("papers/p2", "papers/p3")]["year"] is None

    def test_composite_dedup_key(self, spark):
        edges = build_standard_edges(_nodes(spark), CITES).collect()
        keys = {r["edge_key"] for r in edges}
        assert "papers_p1__papers_p2" in keys
        assert len(keys) == len(edges)  # idempotent re-materialization


class TestChainEdges:
    def test_sequential_and_membership(self, spark):
        edges = build_chain_edges(_nodes(spark), CHAIN).collect()
        seq = {(r["src"], r["dst"], r["chain_position"])
               for r in edges if "step" in r["edge_key"]}
        mem = {(r["src"], r["dst"], r["chain_position"])
               for r in edges if "member" in r["edge_key"]}
        assert seq == {("papers/p1", "papers/p2", 0),
                       ("papers/p2", "papers/p3", 1)}
        assert mem == {("lineages/l1", "papers/p1", 0),
                       ("lineages/l1", "papers/p2", 1),
                       ("lineages/l1", "papers/p3", 2)}


class TestMaterializeAll:
    def test_union_and_stats_and_views(self, spark):
        edges, stats = materialize_edges(_nodes(spark), [CITES, CHAIN])
        assert stats["cites"].edges_created == 3
        assert stats["lineage_step"].edges_created == 5
        view = named_graph_view(edges, ["cites"])
        assert view.count() == 3
        assert {r["rel"] for r in edges.select("rel").distinct().collect()} \
            == {"cites", "lineage_step"}


class TestVectorTail:
    def test_link_score_sigmoid(self, spark):
        import math

        from pyspark.sql import functions as F

        from hades_spark.functions.vector import link_score_col

        df = spark.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [-1.0, 0.0])],
            "a array<float>, b array<float>")
        got = [r["s"] for r in
               df.select(link_score_col(F.col("a"), F.col("b")).alias("s"))
                 .collect()]
        assert abs(got[0] - 1 / (1 + math.exp(-1))) < 1e-9
        assert abs(got[1] - 1 / (1 + math.exp(1))) < 1e-9

    def test_late_fusion_normalized(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from hades_spark.functions.vector import late_fusion_col

        df = spark.createDataFrame(
            [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
            "a array<float>, b array<float>")
        v = df.select(late_fusion_col(F.col("a"), F.col("b"), 0.7)
                      .alias("v")).collect()[0]["v"]
        arr = np.array(v)
        assert abs(np.linalg.norm(arr) - 1.0) < 1e-6
        want = np.array([0.7, 0.3, 0.0])
        want = want / np.linalg.norm(want)
        assert np.allclose(arr, want, atol=1e-6)


class TestArxivYearMonth:
    def test_parse(self):
        from hades_spark.functions.keys import arxiv_year_month

        assert arxiv_year_month("2301.12345") == (2023, 1)
        assert arxiv_year_month("0912.0042v2") == (2009, 12)
        assert arxiv_year_month("2313.00001") is None  # month 13
        assert arxiv_year_month("math/0211159") is None  # old-style id
        assert arxiv_year_month("") is None


class TestChainReferenceParity:
    def _nodes(self, spark, chain):
        from pyspark.sql import functions as F

        rows = [("L/1", "lineage", {"chain": chain}),
                ("A", "doc", {}), ("C", "doc", {})]
        return spark.createDataFrame(
            rows, "node_id string, node_type string, props map<string,string>")

    def test_missing_member_breaks_chain_no_bridge(self, spark):
        from hades_spark.plans.edge_defs import EdgeDef, build_chain_edges

        nodes = self._nodes(spark, "A,MISSING,C")
        edges = build_chain_edges(
            nodes, EdgeDef("seq", "chain", ("lineage",), kind="chain"))
        seq = {(r["src"], r["dst"]) for r in edges.collect()
               if "step_" in r["edge_key"]}
        # NO A->C bridge, and no edge touching MISSING
        assert seq == set()
        members = {r["dst"] for r in edges.collect()
                   if "member_" in r["edge_key"]}
        assert members == {"A", "C"}  # valid members still linked

    def test_single_member_chain_skipped_entirely(self, spark):
        from hades_spark.plans.edge_defs import EdgeDef, build_chain_edges

        nodes = self._nodes(spark, "A")
        edges = build_chain_edges(
            nodes, EdgeDef("seq", "chain", ("lineage",), kind="chain"))
        assert edges.count() == 0  # reference: len(chain) < 2 -> skip doc

    def test_valid_chain_still_sequential(self, spark):
        from hades_spark.plans.edge_defs import EdgeDef, build_chain_edges

        nodes = self._nodes(spark, "A,C")
        edges = build_chain_edges(
            nodes, EdgeDef("seq", "chain", ("lineage",), kind="chain"))
        seq = {(r["src"], r["dst"]) for r in edges.collect()
               if "step_" in r["edge_key"]}
        assert seq == {("A", "C")}


class TestIncrementalBoundary:
    def test_inclusive_boundary_rereads_edge_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from hades_spark.streaming.incremental import (
            WatermarkStore, incremental_batch)

        df = spark.createDataFrame(
            [(1, "2025-01-01 00:00:00"), (2, "2025-01-01 00:00:05")],
            "id int, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        store = WatermarkStore(str(tmp_path / "wm.json"))
        delta, commit = incremental_batch(df, store)
        assert commit() == 2

        # a LATE row sharing the boundary timestamp
        late = spark.createDataFrame(
            [(3, "2025-01-01 00:00:05")], "id int, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        df2 = df.union(late)

        strict, _ = incremental_batch(df2, store)
        assert strict.count() == 0  # '>' loses the boundary late row...
        inclusive, _ = incremental_batch(df2, store,
                                         inclusive_boundary=True)
        ids = {r["id"] for r in inclusive.collect()}
        assert 3 in ids  # ...'>=' recovers it (dedupe via idempotent sink)


class TestChainRawLengthGate:
    """ADVICE r3: the reference gates on RAW chain length (len(chain) < 2),
    then emits membership edges per resolvable member independently —
    chain 'A,MISSING' must emit the A membership edge."""

    def test_two_member_chain_one_unresolvable_emits_membership(self, spark):
        rows = [("L/1", "lineage", {"chain": "A,MISSING"}),
                ("A", "doc", {})]
        nodes = spark.createDataFrame(
            rows, "node_id string, node_type string, props map<string,string>")
        edges = build_chain_edges(
            nodes, EdgeDef("seq", "chain", ("lineage",), kind="chain"))
        rows = edges.collect()
        seq = {(r["src"], r["dst"]) for r in rows if "step_" in r["edge_key"]}
        mem = {(r["src"], r["dst"], r["chain_position"])
               for r in rows if "member_" in r["edge_key"]}
        assert seq == set()                      # no A->MISSING edge
        assert mem == {("L/1", "A", 0)}          # A membership still emitted
