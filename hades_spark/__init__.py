"""hades_spark — a PySpark-native document-to-knowledge-graph analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference system (toddwbucy/HADES, surveyed in SURVEY.md) expressed as
idiomatic Spark DataFrame pipelines:

- deterministic HTML -> text extraction (byte-identical per url to the
  reference extractor semantics, `core/extractors/extractors_markdown.py`)
  via Arrow-batched pandas UDFs,
- mention detection (links / code blocks / tables / citations),
- OpenIE-style SVO triple extraction,
- embedding-based entity linking (broadcast candidate join + vectorized
  cosine scoring),
- MinHash-LSH + connected-components canonicalization,
- (subj, pred, obj) edge materialization into partitioned tables,
- checkpoint manifests for exact resume, per-stage metrics,
- plus the training-data operations a 100 TB corpus pipeline needs
  (dedup family, ANN similarity, text quality analysis, multimodal plumbing).

Everything is public-API PySpark: DataFrame/SQL + pandas UDFs. No RDD code,
no custom Catalyst rules.
"""

__version__ = "0.1.0"
