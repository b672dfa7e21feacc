"""Benchmark decontamination + boilerplate passage mining — token n-gram
overlap machinery, pure column algebra.

Two standard corpus hygiene stages (GPT-3 appendix C / PaLM / Llama all
decontaminate pretraining data against eval benchmarks with token n-gram
overlap; boilerplate passage mining is the corpus-side dual — the same
windows, aggregated by frequency instead of joined against a benchmark):

- ``contamination_report``: flag corpus docs sharing >= ``min_hits``
  distinct token n-grams with any benchmark text. The benchmark side is
  distinct n-grams ONLY (tiny next to the corpus — benchmarks are
  thousands of items, corpora are billions), so the probe is a semi-join
  keyed on an int64 n-gram hash: broadcastable when the benchmark is
  small, a plain shuffle equi-join when not (`broadcast_benchmark`).
- ``repeated_passages``: the corpus' most duplicated n-gram windows
  (navigation chrome, cookie banners, license blurbs) — one
  map-side-combinable groupBy over the exploded windows plus a
  TakeOrderedAndProject readout under a total (count desc, passage asc)
  order. The output is the kill-list a boilerplate filter consumes.

Tokenization shares ``operators/lm.tokens_col`` (lowercase, alnum runs)
so LM scores, contamination flags, and passage mining all agree on what a
token is. N-gram windows are built with slice/transform inside the row —
narrow until the single aggregation/join each operator needs.

Hashing note: windows join/group on ``xxhash64`` of the space-joined
n-gram, not the string — at 10^12 docs the exploded frame's shuffle width
matters and 8 bytes beats arbitrary-length text. Collisions (~2^-64 per
pair, deterministic) are measurement noise far below the thresholds these
operators feed. The DuckDB oracles re-derive overlap on the n-gram
STRINGS, so a collision would surface as a hash mismatch — none has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lm import tokens_col


def ngram_windows(text_col, n: int) -> F.Column:
    """array<string> of space-joined token ``n``-grams (empty when the doc
    has fewer than ``n`` tokens)."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    t = tokens_col(text_col)
    cnt = F.size(t) - F.lit(n - 1)
    wins = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(t, i, n), " "))
    return F.when(cnt >= 1, wins).otherwise(
        F.array().cast("array<string>"))


def _ngram_hashes(df: DataFrame, id_cols: list[str], text_col: str,
                  n: int) -> DataFrame:
    """(id..., h): DISTINCT n-gram hashes per id (set semantics — overlap
    counts distinct shared n-grams, not occurrences)."""
    return (
        df.select(*id_cols,
                  F.explode(ngram_windows(F.col(text_col), n)).alias("_w"))
          .select(*id_cols, F.xxhash64("_w").alias("h"))
          .dropDuplicates([*id_cols, "h"])
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str = "text",
    n: int = 8,
    min_hits: int = 2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """-> (id, n_overlap, contaminated) for every corpus doc with >= 1
    shared n-gram; ``contaminated = n_overlap >= min_hits``. Docs with no
    overlap are absent (at corpus scale the report is the EXCEPTION list;
    callers anti-join it to keep the clean remainder)."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1: {min_hits}")
    doc_grams = _ngram_hashes(corpus, [id_col], text_col, n)
    bench_grams = _ngram_hashes(
        benchmark.select(F.col(benchmark_text_col).alias("_bt")),
        [], "_bt", n)
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    hits = doc_grams.join(bench_grams, "h", "left_semi")
    return (
        hits.groupBy(id_col)
            .agg(F.count("*").alias("n_overlap"))
            .withColumn("contaminated", F.col("n_overlap") >= min_hits)
    )


def repeated_passages(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """-> (passage, n_docs) for the ``top_k`` n-gram windows appearing in
    the most DISTINCT docs (>= ``min_docs``), ordered (n_docs desc,
    passage asc) — deterministic, and the readout compiles to
    TakeOrderedAndProject. Per-doc dedup first, so a window repeated
    inside one page counts once."""
    wins = (
        corpus.select(F.col(id_col).alias("_id"),
                      F.explode(ngram_windows(F.col(text_col), n))
                      .alias("passage"))
              .dropDuplicates(["_id", "passage"])
    )
    return (
        wins.groupBy("passage").agg(F.countDistinct("_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .orderBy(F.desc("n_docs"), F.asc("passage"))
            .limit(top_k)
    )
