"""End-to-end training-corpus curation: quality -> exact dedup ->
near-dup resolution -> deterministic dataset mixing.

This is the composition the individual operators exist FOR — the
pipeline a 100-TB web crawl goes through before tokenization. Stage
order is the cost order:

1. **quality gate** (`functions/text_analysis.quality_score_col`): pure
   column algebra at the scan — the cheapest stage runs first and
   shrinks everything downstream. Low-quality boilerplate is also the
   near-dup-heaviest slice, so this directly cuts LSH load.
2. **exact dedup**: one groupBy on ``sha2(normalized text)`` keeps the
   minimum id per identical-content group — uniform 64-hex shuffle key,
   map-side combinable, removes the mass of byte-identical mirrors for
   the price of one hash pass.
3. **near-dup resolution** (`operators/dedup.minhash_dedup_pairs` +
   ``resolve_survivors``): banded MinHash LSH pairs -> connected
   components -> ONE survivor per cluster by an explicit quality policy
   (longest text, ties to min id). Only survivors of stage 2 are
   shingled — never the raw corpus.
4. **stratified mix** (`operators/sampling.stratified_mix`): per-language
   keep fractions over a seeded hash gate — reproducible across reruns
   and partitionings, monotone in fraction, and a plain pushable
   predicate (no sample() RNG, no shuffle).

Output: one row per kept document ``(id, lang, n_tokens, quality)`` —
a full audit row (the score that admitted it, the length that won its
cluster). Every stage is individually hash-oracled elsewhere; the
registered ``curate_corpus`` query oracles the COMPOSITION end-to-end
in DuckDB (quality formula + exact-dedup min-id + exact-Jaccard
transitive closure + argmax survivor + quantized mix thresholds).

Reference parity: the reference curates at ingest via per-document
quality rubrics and key-level seen-sets (``sync.py:496-543``); the
content-level near-dup stage and mixing are the web-scale training-data
extension (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL'22 — the dedup-before-mix ordering is theirs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text_analysis import quality_score_col, token_count_col
from ..operators.dedup import (exact_dedup, minhash_dedup_pairs,
                               normalized_text_col, resolve_survivors)
from ..operators.sampling import stratified_mix


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_quality: float = 0.7,
    neardup_threshold: float = 0.7,
    mix_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    seed: int = 0,
    local_threshold: int = 1_000_000,
    **minhash_kw,
) -> DataFrame:
    """-> (id, lang, n_tokens, quality) — the curated training subset.

    ``minhash_kw`` forwards to ``minhash_dedup_pairs`` (num_hashes,
    bands, shingle_words, max_bucket_size). ``local_threshold`` forwards
    to the component resolver (0 forces the distributed CC path).
    """
    scored = docs.select(
        F.col(id_col), F.col(lang_col),
        F.col(text_col),
        token_count_col(F.col(text_col)).alias("n_tokens"),
        F.round(quality_score_col(F.col(text_col)), 2).alias("quality"),
    ).filter(F.col("quality") >= min_quality)

    # exact: min id per normalized-content hash, then keep those rows
    exact_keep = exact_dedup(scored, id_col, text_col).select(id_col)
    uniq = scored.join(exact_keep, id_col, "left_semi")

    # near-dup: shingle only the exact-unique survivors
    pairs = minhash_dedup_pairs(
        uniq, id_col, text_col,
        threshold=neardup_threshold, **minhash_kw)
    survivors = resolve_survivors(
        uniq.select(id_col, "n_tokens"), id_col, pairs,
        order_by=[F.col("n_tokens"), -F.col(id_col)],
        local_threshold=local_threshold,
    ).select(id_col)
    kept = uniq.join(survivors, id_col, "left_semi")

    if mix_fractions is not None:
        kept = stratified_mix(kept, id_col, lang_col, mix_fractions,
                              default_fraction=default_fraction, seed=seed)
    return kept.select(id_col, lang_col, "n_tokens", "quality")


def _norm_key(text_col) -> F.Column:
    """Exposed for tests: the exact-dedup grouping key."""
    return F.sha2(normalized_text_col(text_col), 256)


def curate_for_training(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 8,
    min_hits: int = 2,
    capacity: int = 2048,
    seed: int = 0,
) -> DataFrame:
    """The training-prep tail ``curate_corpus`` stops short of:
    PII scrubbing -> benchmark decontamination -> exact dedup of the
    REDACTED text -> sequence packing. -> (id, tokens, start_bin,
    end_bin, n_bins_spanned, bin_offset): the ready-to-tokenize manifest.

    Ordering is load-bearing: redaction FIRST so dedup groups and n-gram
    overlap operate on the text that will actually ship (two docs
    differing only in the PII scrubbed out of them ARE duplicates);
    decontamination before dedup so a benchmark copy can't win a dedup
    group and survive. Packing sees only survivors — the prefix sum is
    over the final corpus. Each stage is individually oracled; the
    registered ``curate_training_manifest`` query value-hashes this
    COMPOSITION end-to-end (the DuckDB twin re-derives redaction,
    overlap, the dedup winner set, and the packed bins independently).
    """
    from ..functions.pii import redact_pii
    from ..functions.text_analysis import token_count_col
    from ..operators.decontaminate import contamination_report
    from ..operators.packing import pack_sequences

    red = docs.select(F.col(id_col), redact_pii(F.col(text_col))
                      .alias("_rtext"))
    red_bench = benchmark.select(
        redact_pii(F.col(text_col)).alias("_rtext"))
    dirty = contamination_report(
        red, red_bench, id_col=id_col, text_col="_rtext",
        benchmark_text_col="_rtext", n=ngram_n, min_hits=min_hits,
    ).filter(F.col("contaminated")).select(id_col)
    clean = red.join(dirty, id_col, "left_anti")
    keep = clean.groupBy(F.sha2(F.col("_rtext"), 256).alias("_h")) \
                .agg(F.min(id_col).alias(id_col)).select(id_col)
    deduped = clean.join(keep, id_col, "left_semi").select(
        F.col(id_col), token_count_col(F.col("_rtext")).alias("_nt"))
    return pack_sequences(deduped, id_col, "_nt",
                          capacity=capacity, seed=seed)
