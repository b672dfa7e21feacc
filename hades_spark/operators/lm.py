"""Bigram language-model quality scoring — the CCNet-style perplexity
filter, as pure DataFrame algebra.

The strongest web-corpus quality signal in production pipelines is "how
surprising is this document under a language model" (CCNet / Wenzek et al.
2020 filter Common Crawl on KenLM perplexity; the heuristic rubric in
``functions/text_analysis.py`` is the cheap first gate, this is the second).
A full KenLM is env-limited here; an add-alpha-smoothed bigram model
TRAINED ON THE CORPUS ITSELF is the same mathematical shape — token
conditionals, per-doc mean log-probability, perplexity readout — and is
exactly re-derivable in ANSI SQL, so the whole operator is value-hash
oracled (unlike an opaque binary LM).

Scale shape (the part that must survive 10^12 docs):

- tokenize/bigram explode is narrow (per-row arrays_zip of two slices);
- training is two map-side-combinable groupBys over (w1, w2) — counts,
  then left-context totals as a second agg OVER THE COUNTS (never a second
  corpus scan);
- vocabulary size is a one-row aggregate broadcast back as a scalar
  (crossJoin of a 1-row frame — the pagerank sink-mass device, no
  ``collect``);
- scoring joins exploded bigram INSTANCES against distinct-keyed count
  tables: plain shuffle equi-joins on (w1, w2) / w1. The count side is
  distinct-keyed so only the instance side can skew, which AQE's skew-join
  split handles; neither side is assumed broadcastable (a web-scale vocab
  isn't).

Tokenization contract (shared with the DuckDB twin): lowercase, split on
non-alphanumeric runs, drop empties. Docs with < 2 tokens have no bigrams
and are excluded from the scored output (documented; callers route them to
the heuristic gate instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text_col) -> F.Column:
    """Lowercased alphanumeric tokens; empties (split artifacts) dropped."""
    arr = F.split(F.lower(text_col), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != "")


def bigrams_col(text_col) -> F.Column:
    """array<struct<w1,w2>> of adjacent token pairs; empty when < 2 tokens."""
    t = tokens_col(text_col)
    n = F.size(t)
    pairs = F.arrays_zip(
        F.slice(t, 1, n - 1).alias("w1"),
        F.slice(t, 2, n - 1).alias("w2"),
    )
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(docs: DataFrame, text_col: str = "text") -> dict:
    """-> {'bigrams': (w1, w2, c12), 'contexts': (w1, c1), 'vocab': 1-row
    (v)}. ``c1`` is the left-context total (sum of c12 over w2), so the
    smoothed conditional sums to 1 per context; ``v`` is the distinct
    token count feeding the add-alpha denominator."""
    inst = (
        docs.select(F.explode(bigrams_col(F.col(text_col))).alias("b"))
            .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    bigrams = inst.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
            .agg(F.countDistinct("w").alias("v"))
    )
    return {"bigrams": bigrams, "contexts": contexts, "vocab": vocab}


def bigram_quality_scores(
    docs: DataFrame,
    lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """-> (id, n_bigrams, avg_logprob, perplexity) for every doc with at
    least one bigram. ``avg_logprob`` is the mean of
    ln((c12 + alpha) / (c1 + alpha * v)) over the doc's bigram instances;
    ``perplexity = exp(-avg_logprob)`` (lower = more fluent under the
    corpus LM — boilerplate and gibberish both score high)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive: {alpha}")
    inst = (
        docs.select(F.col(id_col), F.explode(bigrams_col(F.col(text_col)))
                    .alias("b"))
            .select(id_col, F.col("b.w1").alias("w1"),
                    F.col("b.w2").alias("w2"))
    )
    scored = (
        inst.join(lm["bigrams"], ["w1", "w2"], "left")
            .join(lm["contexts"], ["w1"], "left")
            .crossJoin(F.broadcast(lm["vocab"]))
            .select(
                id_col,
                F.log((F.coalesce("c12", F.lit(0)) + F.lit(alpha))
                      / (F.coalesce("c1", F.lit(0)) + F.lit(alpha)
                         * F.col("v"))).alias("lp"))
    )
    return (
        scored.groupBy(id_col)
              .agg(F.count("*").alias("n_bigrams"),
                   F.avg("lp").alias("avg_logprob"))
              .withColumn("perplexity", F.exp(-F.col("avg_logprob")))
    )


def collocations_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-``k`` adjacent-token collocations by pointwise mutual
    information — the classic phrase-mining statistic (Church & Hanks
    1990): ``pmi = ln( p(x,y) / (p(x) p(y)) )`` with ``p(x,y)`` over
    bigram instances and unigram probabilities over token instances.
    Pairs seen fewer than ``min_count`` times are dropped (PMI's known
    rare-pair blowup). Deterministic total order: pmi desc, then (x, y)
    asc — compiles to TakeOrderedAndProject (per-partition heaps, no
    corpus sort).

    Columns: ``x, y, n_xy, pmi``. Same tokenizer as the bigram LM, so
    mined phrases line up with LM vocabulary. Shuffle shape: three
    combinable groupBys (pair counts, token counts x2 via one agg) +
    two equi-joins of the distinct-keyed pair table against the
    distinct-keyed unigram table — never an instance-level join.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    n_tokens = uni.agg(F.sum("c").alias("nt"))

    pairs = docs.select(
        F.explode(bigrams_col(F.col(text_col))).alias("b")
    ).select(F.col("b.w1").alias("x"), F.col("b.w2").alias("y"))
    pc = pairs.groupBy("x", "y").agg(F.count("*").alias("n_xy")) \
              .where(F.col("n_xy") >= min_count)
    n_pairs = pairs.groupBy().agg(F.count("*").alias("np"))

    ux = uni.select(F.col("w").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("w").alias("y"), F.col("c").alias("cy"))
    scored = (
        pc.join(ux, "x").join(uy, "y")
          .crossJoin(F.broadcast(n_pairs))
          .crossJoin(F.broadcast(n_tokens))
          .select(
              "x", "y", "n_xy",
              F.log((F.col("n_xy") / F.col("np"))
                    / ((F.col("cx") / F.col("nt"))
                       * (F.col("cy") / F.col("nt")))).alias("pmi"))
    )
    return scored.orderBy(F.col("pmi").desc(), "x", "y").limit(k)
