"""Text analysis for training-data pipelines — pure JVM column expressions.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation
/ word-shape ratios), token counting, and document fingerprinting. All are
built from built-in functions (no UDFs) so they ride whole-stage codegen at
100 TB and are exactly reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# per-language stopword marker sets (padded-space occurrence counting — the
# replace-based count is expressible identically in any SQL dialect). The
# words are the highest-frequency function words of each language; shared
# forms (e.g. fr/es 'la', pt/es 'que') are fine — identification is an
# argmax over SUMS, and each language keeps enough unique markers to win on
# its own text. All markers are space-delimited whole words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " is ", " of ", " to ", " in ", " that ",
           " it ", " was ", " for ", " with ", " are ", " this ", " have "],
    "de": [" der ", " und ", " die ", " ist ", " das ", " nicht ", " ein ",
           " mit ", " auf ", " sich ", " dem ", " eine ", " auch ", " werden "],
    "fr": [" le ", " la ", " et ", " est ", " les ", " des ", " une ",
           " dans ", " qui ", " pas ", " pour ", " ce ", " sont ", " vous "],
    "es": [" el ", " los ", " es ", " y ", " que ", " en ", " las ",
           " una ", " por ", " con ", " para ", " del ", " se ", " como "],
    "it": [" il ", " che ", " di ", " è ", " non ", " per ", " sono ",
           " della ", " una ", " con ", " gli ", " nel ", " anche ", " come "],
    "pt": [" o ", " que ", " de ", " é ", " não ", " uma ", " os ",
           " para ", " com ", " do ", " da ", " em ", " mais ", " como "],
    "nl": [" de ", " het ", " een ", " van ", " en ", " dat ", " niet ",
           " zijn ", " op ", " voor ", " met ", " maar ", " ook ", " naar "],
}


def occurrence_count(c: Column, needle: str) -> Column:
    """Number of occurrences of ``needle`` via the length/replace trick
    (portable to any SQL dialect, unlike regexp counts)."""
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def _padded(c: Column) -> Column:
    # normalize ALL whitespace to single spaces first: the project's own
    # HTML extractor emits newlines, and a marker like ' the ' would miss
    # every occurrence adjacent to a newline
    return F.concat(F.lit(" "),
                    F.regexp_replace(F.lower(c), r"\s+", " "),
                    F.lit(" "))


def lang_scores(c: Column) -> dict[str, Column]:
    p = _padded(c)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for mk in markers:
            cnt = occurrence_count(p, mk)
            score = cnt if score is None else score + cnt
        out[lang] = score
    return out


def lang_id_col(c: Column, default: str = "und") -> Column:
    """argmax over marker-hit counts; 'und' when nothing matched."""
    scores = lang_scores(c)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in sorted(scores):  # deterministic tie-break: alphabetical wins ties via strict >
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def token_count_col(c: Column) -> Column:
    """Whitespace token count (empty tokens excluded; ANY whitespace run
    separates tokens, so newline-delimited extractor output counts
    correctly)."""
    return F.size(F.filter(F.split(c, r"\s+", -1), lambda t: t != ""))


def punct_count_col(c: Column) -> Column:
    cnt = None
    for ch in [".", ",", "!", "?", ";", ":"]:
        x = occurrence_count(c, ch)
        cnt = x if cnt is None else cnt + x
    return cnt


def quality_score_col(c: Column) -> Column:
    """Additive 0..1 rubric (the confidence-rubric pattern of
    ``academic_citation_toolkit.py:632-645`` applied to doc quality):
    0.2 base + 0.3 length-in-range + 0.2 has-sentence-punctuation +
    0.2 mean-word-length-in-range + 0.1 not-shouting; capped at 1.0."""
    n_chars = F.length(c)
    n_tokens = token_count_col(c)
    n_punct = punct_count_col(c)
    mean_word = n_chars / F.greatest(n_tokens, F.lit(1))
    upper_ratio = (
        F.length(F.regexp_replace(c, "[^A-Z]", ""))
        / F.greatest(n_chars, F.lit(1))
    )
    score = (
        F.lit(0.2)
        + F.when((n_chars >= 100) & (n_chars <= 20000), 0.3).otherwise(0.0)
        + F.when(n_punct >= 1, 0.2).otherwise(0.0)
        + F.when((mean_word >= 3) & (mean_word <= 12), 0.2).otherwise(0.0)
        + F.when(upper_ratio <= 0.3, 0.1).otherwise(0.0)
    )
    return F.least(score, F.lit(1.0))


def fingerprint_col(c: Column) -> Column:
    """md5 of the whitespace-normalized lowercase text — the content
    fingerprint for change detection (``codebase.py:497-531`` semantics)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))
