"""TF-IDF term weighting and per-doc top terms — corpus statistics for
lexical retrieval and keyword extraction, pure DataFrame algebra.

The lexical complement to the dense-embedding search stack (the hybrid
stage in ``operators/search.py`` fuses both families): document frequency
weighting is what BM25/sparse retrieval builds on, and "top-k
characteristic terms per doc" is the keyword-extraction primitive KG
pipelines use for topic tagging.

Conventions (documented because they're load-bearing for the oracle):
tokenization shared with ``operators/lm.tokens_col``; tf = raw count of
the term in the doc; idf = ln((1 + N) / (1 + df)) + 1 (the smoothed
sklearn form — never zero, defined for unseen terms); score = tf * idf.

Scale shape: explode -> two map-side-combinable groupBys (tf keyed by
(doc, term) — skew-free: boilerplate terms spread across docs; df keyed
by term); the tf-vs-df join is a plain shuffle equi-join against the
distinct-keyed df table (a web-scale vocabulary is not broadcastable);
N rides a broadcast 1-row frame; the per-doc top-k window shuffles on the
doc id (uniform). No driver collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .lm import tokens_col


def term_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """-> {'tf': (id, term, tf), 'df': (term, df), 'n': 1-row (n)}."""
    terms = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.col(id_col)).agg(F.count("*").alias("n"))
    return {"tf": tf, "df": dfreq, "n": n}


def tfidf_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, term, tf, df, score) for every (doc, term) pair."""
    st = term_stats(docs, id_col, text_col)
    idf = F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))) + F.lit(1.0)
    return (
        st["tf"].join(st["df"], "term")
                .crossJoin(F.broadcast(st["n"]))
                .select(id_col, "term", "tf", "df",
                        (F.col("tf") * idf).alias("score"))
    )


def top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """-> (id, term, rank, score): each doc's ``k`` highest-TF-IDF terms
    under the deterministic total order (score desc, term asc)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    scored = tfidf_scores(docs, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k)
              .select(id_col, "term", "rank", "score")
    )
