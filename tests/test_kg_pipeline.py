"""End-to-end KG pipeline tests: extraction, canonicalization, P/R."""

from pyspark.sql import functions as F

from hades_spark.functions.triples import extract_triples
from hades_spark.operators.canonicalize import normalize_surface
from hades_spark.pipeline.corpus import (
    expected_canonical_triples,
    gen_pages,
    pages_df,
)
from hades_spark.pipeline.kg import canonical_triples, distinct_edges, ensure_text


class TestTripleExtraction:
    def test_simple_svo(self):
        ts = extract_triples("HADES uses Spark.")
        assert [(t["subj"], t["pred"], t["obj"]) for t in ts] == \
            [("HADES", "uses", "Spark")]

    def test_multiple_sentences(self):
        ts = extract_triples("A1 uses B2. C3 extends D4.")
        assert [(t["subj"], t["pred"], t["obj"]) for t in ts] == \
            [("A1", "uses", "B2"), ("C3", "extends", "D4")]

    def test_dotted_entity_as_object(self):
        ts = extract_triples("Spark uses H.A.D.E.S..")
        assert [(t["subj"], t["obj"]) for t in ts] == [("Spark", "H.A.D.E.S.")]

    def test_dotted_entity_as_subject(self):
        ts = extract_triples("First one. H.A.D.E.S. uses Spark.")
        # the entity's terminal '.' is consumed as sentence punctuation;
        # canonicalization normalizes both forms identically
        assert [(t["subj"], t["obj"]) for t in ts] == [("H.A.D.E.S", "Spark")]

    def test_multiword_spans(self):
        ts = extract_triples("the HADES system embeds Apache Spark.")
        assert [(t["subj"], t["obj"]) for t in ts] == \
            [("the HADES system", "Apache Spark")]

    def test_no_predicate_no_triple(self):
        assert extract_triples("Nothing interesting here.") == []

    def test_line_bounded(self):
        ts = extract_triples("header line\nAA uses BB.\nfooter")
        assert [(t["subj"], t["obj"]) for t in ts] == [("AA", "BB")]


class TestNormalization:
    def test_normalize_surface(self):
        assert normalize_surface("H.A.D.E.S.") == "h a d e s"
        assert normalize_surface("Apache  Spark!") == "apache spark"
        assert normalize_surface("hades") == "hades"


class TestPipeline:
    def test_ensure_text_fills_and_matches(self, spark):
        pages = pages_df(spark, 40, seed=3, with_text=False)
        filled = ensure_text(pages)
        truth = {p.url: p.text for p in gen_pages(40, seed=3)}
        for r in filled.select("url", "text").collect():
            assert r["text"] == truth[r["url"]]

    def test_pipeline_precision_recall(self, spark):
        n = 120
        pages = pages_df(spark, n, seed=42, with_text=False)
        edges = distinct_edges(canonical_triples(pages))
        got = {(r["subj"], r["pred"], r["obj"])
               for r in edges.select("subj", "pred", "obj").collect()}
        want = expected_canonical_triples(n, seed=42)
        assert want, "generator produced no ground truth?"
        tp = len(got & want)
        precision = tp / max(len(got), 1)
        recall = tp / len(want)
        assert precision >= 0.95, (precision, sorted(got - want)[:10])
        assert recall >= 0.95, (recall, sorted(want - got)[:10])

    def test_edges_are_deduped_and_keyed(self, spark):
        pages = pages_df(spark, 60, seed=1, with_text=False)
        edges = distinct_edges(canonical_triples(pages))
        assert edges.count() == edges.select("edge_key").distinct().count()
        assert edges.filter(F.length("edge_key") != 64).count() == 0


class TestAdaptiveExecution:
    """The local (driver-side) fast paths must agree with the distributed
    paths exactly."""

    def test_cc_local_vs_distributed(self, spark):
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "a")],
            "a string, b string")
        from hades_spark.operators.components import connected_components

        local = {(r["node"], r["component"])
                 for r in connected_components(pairs).collect()}
        dist = {(r["node"], r["component"])
                for r in connected_components(pairs, local_threshold=0).collect()}
        assert local == dist

    def test_canonical_local_vs_distributed(self, spark):
        from hades_spark.operators.canonicalize import canonical_map

        surfaces = spark.createDataFrame(
            [("HADES",), ("hades",), ("H.A.D.E.S.",), ("the HADES system",),
             ("Apache Spark",), ("Spark",), ("apache spark",),
             ("PostgreSQL",), ("Postgres",), ("unrelated thing",)],
            "surface string")
        local = {(r["surface"], r["canonical_id"])
                 for r in canonical_map(surfaces).collect()}
        dist = {(r["surface"], r["canonical_id"])
                for r in canonical_map(surfaces, local_threshold=0).collect()}
        assert local == dist
        by_surface = dict(local)
        assert by_surface["HADES"] == by_surface["the HADES system"]
        assert by_surface["Apache Spark"] == by_surface["Spark"]
        assert by_surface["PostgreSQL"] == by_surface["Postgres"]
        assert by_surface["unrelated thing"] not in (
            by_surface["HADES"], by_surface["Apache Spark"])


class TestRealisticPages:
    def test_pr_holds_on_rich_pages(self, spark):
        """Precision/recall on Common-Crawl-sized pages (filler prose,
        tables, citations) — guards against spurious triples from page
        bulk."""
        from hades_spark.pipeline.corpus import gen_pages
        from hades_spark.pipeline.kg import canonical_triples, distinct_edges
        from hades_spark.operators.canonicalize import normalize_surface
        from hades_spark.pipeline.corpus import ENTITIES
        from hades_spark.schemas import PAGES

        n = 80
        pages = gen_pages(n, seed=21, compute_text=False, richness=25)
        df = spark.createDataFrame(
            [(p.url, p.warc_ts, p.html, None, p.lang) for p in pages], PAGES)
        got = {(r["subj"], r["pred"], r["obj"]) for r in
               distinct_edges(canonical_triples(df))
               .select("subj", "pred", "obj").collect()}
        canon_id = {c: min(normalize_surface(v) for v in vs)
                    for c, vs in ENTITIES}
        want = {(canon_id[s], p, canon_id[o])
                for pg in pages for (s, p, o) in pg.truth}
        tp = len(got & want)
        assert tp / max(len(got), 1) >= 0.95, sorted(got - want)[:8]
        assert tp / len(want) >= 0.95, sorted(want - got)[:8]


class TestCanonicalizeCutover:
    def test_cutover_above_local_threshold(self, spark):
        # the adaptive local/distributed switch itself: a vocabulary larger
        # than local_threshold must take the distributed LSH+CC path and
        # produce the same clusters the local path produces
        from hades_spark.operators.canonicalize import canonical_norm_map

        # 300 unique norms + 3 alias groups
        base = [(f"uniq token {i:04d}",) for i in range(300)]
        aliases = [("apache spark",), ("apachespark",),
                   ("postgre sql",), ("postgresql",),
                   ("common crawl",), ("commoncrawl",)]
        norms = spark.createDataFrame(base + aliases, "norm string")

        local = {(r["norm"], r["canonical_id"]) for r in
                 canonical_norm_map(norms, local_threshold=100_000).collect()}
        dist = {(r["norm"], r["canonical_id"]) for r in
                canonical_norm_map(norms, local_threshold=100).collect()}
        assert dist == local
        # the alias pairs actually merged
        d = dict(dist)
        assert d["apachespark"] == d["apache spark"]
        assert d["postgresql"] == d["postgre sql"]
