"""Text-analysis kernels for the training-data pipeline — expression-only.

Each kernel is a pure Column expression (JVM-side, whole-stage codegen;
no Python UDFs), the Spark-first re-expression of the reference's
per-record string enrichment kernels (``enrichments/normalizations/
StringNormalizationUtils.scala``): language-ID heuristic, quality scoring,
token counting, fingerprinting, whitespace/HTML normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small high-frequency stopword sets per language for the n-gram/stopword
# language-ID heuristic (public-knowledge closed-class words)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "por", "para"],
}

# BPE-ish pre-tokenizer: words / numbers / single non-space symbols
# (GPT-2-style split classes, simplified to a portable regex)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col) -> Column:
    """Whitespace word split with empties dropped (splitAtDelimiter analog,
    ``StringNormalizationUtils.scala:176-178``)."""
    return F.filter(F.split(F.col(col) if isinstance(col, str) else col, r"\s+"),
                    lambda w: w != "")


def word_count(col) -> Column:
    return F.size(words(col))


def token_count(col) -> Column:
    """Regex token count (BPE-ish pre-tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0))


def stopword_hits(col, lang: str = "en") -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(col), lambda w: F.lower(w).isin(sw)))


def stopword_ratio(col, lang: str = "en") -> Column:
    wc = word_count(col)
    return F.when(wc > 0, stopword_hits(col, lang) / wc).otherwise(F.lit(0.0))


def lang_scores(col) -> dict[str, Column]:
    """Per-language stopword-hit ratios; argmax is the predicted language."""
    return {lang: stopword_ratio(col, lang) for lang in STOPWORDS}


def predict_lang(col, threshold: float = 0.03) -> Column:
    """Heuristic language ID: highest stopword ratio above threshold, else 'und'."""
    scores = lang_scores(col)
    pairs = F.array(*[
        F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        for lang, score in scores.items()
    ])
    best = F.array_max(pairs)
    return F.when(best["score"] >= threshold, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def mean_word_length(col) -> Column:
    wc = word_count(col)
    total = F.aggregate(
        F.transform(words(col), lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(wc > 0, total.cast("double") / wc).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: length, stopword, punctuation,
    and word-length signals (the MetadataCompletenessReport analog,
    ``reports/MetadataCompletenessReport.scala:44-86`` — indicator columns
    averaged into a score)."""
    c = F.col(col) if isinstance(col, str) else col
    ind_len = (F.length(c) >= 100).cast("double")
    ind_sw = (stopword_ratio(c) >= 0.01).cast("double")
    ind_punct = (punct_ratio(c) <= 0.2).cast("double")
    mwl = mean_word_length(c)
    ind_mwl = ((mwl >= 3) & (mwl <= 12)).cast("double")
    return (ind_len + ind_sw + ind_punct + ind_mwl) / 4


def normalize_text(col) -> Column:
    """lower + collapse whitespace + trim (reduceWhitespace analog,
    ``StringNormalizationUtils.scala:154-155``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def strip_html(col) -> Column:
    """Tag-strip approximation of the reference's jsoup clean
    (``StringNormalizationUtils.scala:199-208``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"<[^>]*>", " "))


def fingerprint(col) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(normalize_text(col))


def fingerprint64(col) -> Column:
    """64-bit fingerprint (xxhash64) for join-friendly dedup keys."""
    return F.xxhash64(normalize_text(col))
