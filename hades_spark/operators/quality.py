"""Repetition-based quality signals and boilerplate line removal — the
Gopher/CCNet filter stages a web-corpus pipeline runs between extraction
and mixing.

Two failure modes dominate crawled text and neither is caught by the
per-doc rubric in ``functions/text_analysis.py``:

1. **Within-document repetition** (Gopher §A1.3): spam and template pages
   repeat the same phrase hundreds of times. The canonical signals are
   the character share of the single most frequent word n-gram and the
   share of n-gram instances that are duplicates. ``repetition_signals``
   computes both, plus word-shape stats, per document.
2. **Cross-document boilerplate** (CCNet's line-level dedup): navigation
   chrome, cookie banners, and copyright footers repeat VERBATIM across
   pages of a site. ``line_dedup`` removes every line whose normalized
   form appears in >= ``min_docs`` distinct documents and reassembles the
   survivors in order.

Scale shape (the 10^12-doc reading):

- ``repetition_signals`` is one ``posexplode`` of per-doc n-gram arrays
  (built with ``transform``/``slice`` column algebra — no window, no UDF)
  followed by map-side-combinable ``groupBy (id, gram)`` / ``groupBy id``
  aggregations. The shuffle key includes the doc id, so hot grams
  ("click here") cannot skew a reducer: a doc's grams land together but
  different docs spread uniformly.
- ``line_dedup`` shuffles once on the normalized line (uniform hash key)
  to count distinct docs, anti-joins the boilerplate set (broadcast by
  default — the >=min_docs filter bounds it; opt out for corpora where
  the shared-line set itself is huge), and reassembles with one combinable
  ``groupBy id``. No sort shuffle: line order is restored from the
  captured position inside the aggregated array.

The reference filters at the embedding/storage layer only (no corpus
quality pass); these are north-rule training-data operators in the same
family as operators/dedup.py and operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _words(text: Column) -> Column:
    """Non-empty whitespace-split tokens (identical to the oracle's
    ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')``)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def _word_ngrams(words: Column, n: int) -> Column:
    """Overlapping word n-grams joined with single spaces; empty array when
    the doc has fewer than ``n`` words. Pure column algebra (transform +
    slice over the split array) — no window function, no explode yet."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(F.size(words) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram: int = 2,
    dup_ngram: int = 5,
) -> DataFrame:
    """Per-document repetition/quality signals (Gopher §A1.3 family).

    Returns one row per input row with:

    - ``n_words``            non-empty whitespace tokens
    - ``word_chars``         total characters across those tokens
    - ``mean_word_len``      word_chars / n_words (0.0 for empty docs)
    - ``top_gram``           most frequent word ``top_ngram``-gram
                             (count desc, gram asc tie-break; NULL when
                             the doc has < top_ngram words)
    - ``top_gram_char_frac`` characters covered by every occurrence of
                             ``top_gram`` (spaces excluded) / word_chars
    - ``dup_gram_frac``      share of ``dup_ngram``-gram INSTANCES whose
                             gram occurs more than once in the doc

    All ratios are exact-integer sums followed by one double division, so
    the DuckDB oracle reproduces them bit-for-bit. Plan: two combinable
    (id, gram) aggregations + per-id rollups; the only wide exchanges key
    on (id, gram) / id — uniform at any corpus size.
    """
    kid = F.col(id_col)
    # NULL text behaves as empty (one well-defined zero row, never a
    # dropped doc) — the oracle applies the same coalesce
    base = df.select(
        kid.alias("_id"),
        _words(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"))

    stats = base.select(
        "_id",
        F.size("_w").alias("n_words"),
        F.aggregate("_w", F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).alias("word_chars"),
    )

    def gram_counts(n: int) -> DataFrame:
        return (
            base.select("_id", F.explode(_word_ngrams(F.col("_w"), n))
                        .alias("gram"))
                .groupBy("_id", "gram").agg(F.count("*").alias("cnt"))
        )

    # most frequent top_ngram-gram: min(struct(-cnt, gram)) == (count desc,
    # gram asc) argmax without a window (one combinable groupBy).
    top = (
        gram_counts(top_ngram)
        .groupBy("_id")
        .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                            F.col("gram").alias("gram"))).alias("t"))
        .select("_id", F.col("t.gram").alias("top_gram"),
                (-F.col("t.neg")).alias("_top_cnt"))
    )

    dup = (
        gram_counts(dup_ngram)
        .groupBy("_id")
        .agg(F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))
                   .otherwise(F.lit(0))).alias("_dup_inst"),
             F.sum("cnt").alias("_tot_inst"))
    )

    # chars covered by the top gram, per occurrence: gram length minus the
    # (top_ngram - 1) joining spaces.
    top_chars = (F.length("top_gram") - (top_ngram - 1)) * F.col("_top_cnt")
    return (
        stats.join(top, "_id", "left").join(dup, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_words", "word_chars",
            F.when(F.col("n_words") > 0,
                   F.col("word_chars").cast("double") / F.col("n_words"))
             .otherwise(F.lit(0.0)).alias("mean_word_len"),
            "top_gram",
            F.when(F.col("word_chars") > 0,
                   F.coalesce(top_chars, F.lit(0)).cast("double")
                   / F.col("word_chars"))
             .otherwise(F.lit(0.0)).alias("top_gram_char_frac"),
            F.when(F.coalesce(F.col("_tot_inst"), F.lit(0)) > 0,
                   F.col("_dup_inst").cast("double") / F.col("_tot_inst"))
             .otherwise(F.lit(0.0)).alias("dup_gram_frac"),
        )
    )


def repetition_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_gram_char_frac: float = 0.20,
    max_dup_gram_frac: float = 0.30,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    **signal_kwargs,
) -> DataFrame:
    """Keep only documents passing the repetition thresholds (Gopher-style
    gate). Returns the input rows (all original columns) that survive; the
    signals frame is joined on ``id_col`` (shuffle equi-join — both sides
    key uniformly on the doc id)."""
    sig = repetition_signals(df, id_col, text_col, **signal_kwargs)
    keep = sig.where(
        (F.col("top_gram_char_frac") <= max_top_gram_char_frac)
        & (F.col("dup_gram_frac") <= max_dup_gram_frac)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
    ).select(id_col)
    return df.join(keep, id_col, "semi")


def excise_shared_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Remove cross-document repeated token spans (the exact-substring
    dedup of Lee et al., *Deduplicating Training Data Makes Language
    Models Better*, restated at token granularity): every token position
    covered by ANY occurrence of a token ``n``-gram that appears in >=
    ``min_docs`` DISTINCT documents is excised; the surviving tokens
    reassemble in order (single spaces). ``repeated_passages`` MINES
    these spans for inspection — this operator removes them.

    One row per input doc: ``id_col``, ``text`` (cleaned), ``n_tokens``,
    ``n_removed`` (token counts). NULL text behaves as empty.

    Shuffle shape: the wide exchange keys on the int64 gram HASH
    (uniform — a million-doc boilerplate gram is one reduce group whose
    distinct-doc count combines map-side); covered positions fan out
    ``n`` rows per shared-gram occurrence (bounded), dedup by (doc, idx)
    and anti-join the token table; reassembly is the same combinable
    position-sorted groupBy as ``line_dedup`` — no corpus-wide window.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    kid = F.col(id_col)
    toks = df.select(
        kid.alias("_id"),
        F.posexplode(_words(F.coalesce(F.col(text_col), F.lit(""))))
         .alias("_pos", "_tok"))

    base = df.select(
        kid.alias("_id"),
        _words(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"))
    grams = base.select(
        "_id",
        F.posexplode(_word_ngrams(F.col("_w"), n)).alias("_gpos", "_gram")
    ).select("_id", "_gpos", F.xxhash64("_gram").alias("_gh"))

    shared = (
        grams.groupBy("_gh")
        .agg(F.countDistinct("_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_gh")
    )
    covered = (
        grams.join(shared, "_gh")
        .select("_id", F.explode(
            F.sequence(F.col("_gpos"), F.col("_gpos") + (n - 1)))
            .alias("_pos"))
        .distinct()
    )
    kept = toks.join(covered, ["_id", "_pos"], "anti")
    rolled = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("_pos"), F.col("_tok")))),
                    lambda s: s["_tok"]),
                " ").alias("text"),
            F.count("*").alias("_n_kept"))
    )
    totals = base.select("_id", F.size("_w").alias("n_tokens"))
    return (
        totals.join(rolled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .alias("n_removed"))
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    broadcast_boiler: bool = True,
) -> DataFrame:
    """Remove cross-document boilerplate lines (CCNet-style line dedup).

    A line is boilerplate when its TRIMMED form is non-empty and appears in
    >= ``min_docs`` DISTINCT documents. Surviving lines are reassembled in
    their original order. Every input document yields exactly one output
    row (a fully-boilerplate doc comes back with ``text = ''``), columns:

    - ``id_col``, ``text`` (cleaned), ``n_lines`` (original non-empty-split
      count), ``n_removed``.

    Shuffle shape: one exchange keyed on the trimmed line (uniform hash —
    a line shared by a million docs is ONE reduce group, and the distinct
    count inside it is map-side combinable via the two-level distinct agg),
    one anti-join against the boilerplate set (broadcast by default: the
    >= min_docs filter bounds it to lines that actually repeat; pass
    ``broadcast_boiler=False`` when that set is corpus-sized), one
    combinable groupBy on the doc id to reassemble. Order restoration uses
    the captured position inside ``array_sort`` — no sort exchange.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    kid = F.col(id_col)
    # NULL text coalesces to '' (one empty line) so the one-row-per-doc
    # contract holds for NULL-text docs too
    lines = df.select(
        kid.alias("_id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
         .alias("_pos", "_line"),
    ).withColumn("_key", F.trim(F.col("_line")))

    boiler = (
        lines.where(F.col("_key") != "")
        .groupBy("_key")
        .agg(F.countDistinct("_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_key")
    )
    if broadcast_boiler:
        boiler = F.broadcast(boiler)

    kept = lines.join(boiler, "_key", "anti")
    rolled = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("_pos"), F.col("_line")))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("text"),
            F.count("*").alias("_n_kept"),
        )
    )
    totals = lines.groupBy("_id").agg(F.count("*").alias("n_lines"))
    return (
        totals.join(rolled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .alias("n_removed"),
        )
    )
