"""End-to-end knowledge-graph construction pipeline.

pages(url, warc_ts, html, text, lang)
  -> extract_text        (byte-identical pandas UDF, narrow)
  -> mentions            (UDF + explode, narrow)
  -> raw surface triples (UDF + explode, narrow)
  -> canonical_map       (LSH + connected components over distinct surfaces)
  -> triples             (canonical subj/obj, sha256 edge key, dedup,
                          partitioned-by-pred write)

This is the Spark restatement of the reference's
``hades db graph materialize`` lifecycle (SURVEY §3.3): the declarative
edge-def loop becomes explode + semi-join + key-hash + idempotent write.

Scale shape: the only shuffles are (1) the distinct-surface aggregation
(tiny relative to pages — surfaces dedup hard), (2) the LSH/CC stages over
those distinct surfaces, (3) the broadcast-join of the canonical map back
onto triples (map-side, no shuffle of the big side), and (4) the final
per-pred dedup. Everything page-sized stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.html_text import with_extracted_text
from ..functions.keys import edge_content_key_col
from .corpus import pages_df


def ensure_text(pages: DataFrame) -> DataFrame:
    """Fill the text column where missing (idempotent re-extraction)."""
    extracted = with_extracted_text(pages, "html", "_extracted")
    return extracted.withColumn(
        "text", F.coalesce(F.col("text"), F.col("_extracted"))
    ).drop("_extracted")


def canonical_triples(
    pages: DataFrame,
    threshold: float = 0.8,
    broadcast_map: bool = True,
) -> DataFrame:
    """pages -> canonical (subj, pred, obj) triples with provenance."""
    from ..functions.triples import raw_triples
    from ..operators.canonicalize import canonical_norm_map, normalize_surface_col

    # one narrow mapInArrow pass (decode + extract + emit exploded triple
    # rows), then JVM-side surface normalization; cached once
    raw = (
        raw_triples(pages)
        .select(
            "url", "pred", "confidence",
            normalize_surface_col(F.col("subj")).alias("subj_norm"),
            normalize_surface_col(F.col("obj")).alias("obj_norm"),
        )
        .cache()
    )

    # single explode pass for the vocabulary, NOT union(select, select): a
    # union scans the raw cache twice, and on the first (cold) pass that
    # would re-run the extraction UDF once per branch
    norms = raw.select(
        F.explode(F.array("subj_norm", "obj_norm")).alias("norm"))
    cmap = canonical_norm_map(norms, threshold=threshold).cache()
    if broadcast_map:
        cmap = F.broadcast(cmap)

    subj_map = cmap.select(F.col("norm").alias("subj_norm"),
                           F.col("canonical_id").alias("subj_id"))
    obj_map = cmap.select(F.col("norm").alias("obj_norm"),
                          F.col("canonical_id").alias("obj_id"))

    triples = (
        raw.join(subj_map, "subj_norm", "left")
        .join(obj_map, "obj_norm", "left")
        .select(
            F.coalesce("subj_id", "subj_norm").alias("subj"),
            "pred",
            F.coalesce("obj_id", "obj_norm").alias("obj"),
            "url",
            F.col("confidence"),
        )
        .withColumn("edge_key", edge_content_key_col(
            F.col("subj"), F.col("obj"), F.col("pred")))
        .withColumn("chain_position", F.lit(None).cast("int"))
        .select("subj", "pred", "obj", "url", "edge_key",
                "confidence", "chain_position")
    )
    return triples


def distinct_edges(triples: DataFrame) -> DataFrame:
    """Idempotent edge set: one row per edge_key, max confidence, min url
    as provenance representative (deterministic)."""
    return (
        triples.groupBy("subj", "pred", "obj", "edge_key")
        .agg(
            F.max("confidence").alias("confidence"),
            F.min("url").alias("url"),
            F.count("*").alias("support"),
        )
    )


def run_kg_pipeline(spark, n_pages: int = 200, seed: int = 42,
                    partitions: int | None = None) -> DataFrame:
    """Synthesize a corpus and run the full pipeline; returns canonical
    distinct edges."""
    pages = pages_df(spark, n_pages, seed=seed, partitions=partitions,
                     with_text=False)
    return distinct_edges(canonical_triples(pages))
