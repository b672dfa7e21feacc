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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """-> (id, score) of the ``k`` best docs for a bag-of-terms query
    under Okapi BM25 (idf = ln(1 + (N - df + 0.5)/(df + 0.5)); tf
    saturation ``k1``; length normalization ``b`` against the mean doc
    token length). The lexical ranker the hybrid search stage fuses with
    dense cosine — and the one BM25 convention everything here follows,
    so scores are portable.

    Scale shape: the query term list is a literal array filter pushed
    into the tf aggregation (only matching terms survive the explode);
    df for the handful of query terms and the (N, avg_len) scalars ride
    broadcast frames; the readout is TakeOrderedAndProject under the
    deterministic (score desc, id asc) order."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    qset = [t.lower() for t in query_terms]
    toks = docs.select(F.col(id_col),
                       tokens_col(F.col(text_col)).alias("_t"))
    lens = toks.select(F.col(id_col), F.size("_t").alias("_len"))
    stats = lens.agg(F.count("*").alias("n"),
                     F.avg("_len").alias("avg_len"))
    terms = toks.select(
        F.col(id_col), F.explode("_t").alias("term")) \
        .filter(F.col("term").isin(qset))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("_len") / F.col("avg_len")))
    return (
        tf.join(F.broadcast(dfreq), "term")
          .join(lens, id_col)
          .crossJoin(F.broadcast(stats))
          .groupBy(id_col)
          .agg(F.sum(idf * tf_part).alias("score"))
          .orderBy(F.desc("score"), F.asc(id_col))
          .limit(k)
    )


def build_posting_lists(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10_000,
) -> DataFrame:
    """Materialized inverted index — one row per term: ``term, df,
    postings`` where ``postings`` is the (doc_id, tf) list sorted by
    tf desc then doc_id asc, truncated to ``max_postings`` (impact-
    ordered posting lists: the truncation keeps the highest-tf docs, the
    WAND/impact-sorted layout retrieval actually scans). ``df`` is the
    UNTRUNCATED document frequency, so idf stays exact even for capped
    stopword rows.

    Plan: tokenize/explode narrow, one combinable (term, doc) tf
    groupBy, one (term) groupBy whose ``slice(array_sort(...))`` bounds
    the per-term state at max_postings + the pre-slice collect of that
    term's docs — the cap is why a stopword's row stays materializable;
    for full-fidelity stopword postings shard the term upstream.
    """
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    r"[^a-z0-9]+"),
            lambda t: t != "")).alias("term"))
    tf = toks.groupBy("term", "_d").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct((-F.col("tf")).alias("ntf"),
                                 F.col("_d").alias("d")))),
                    lambda s: F.struct(
                        s["d"].alias("doc_id"),
                        (-s["ntf"]).alias("tf"))),
                1, max_postings).alias("postings"))
    )
