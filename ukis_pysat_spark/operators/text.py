"""Text analysis for large-scale training-data pipelines.

All operators are pure relational Column expressions (JVM-side, codegen,
no Python) over a ``documents(doc_id, text, lang, source, n_chars)``
table, and each has an exact ANSI-SQL twin so DuckDB can oracle-check
results value-for-value (see __spark_entry__.oracle_sql):

- token counting: whitespace tokens + a BPE-ish regex token count;
- language ID: marker-word n-gram heuristic over en/de/fr/es with a
  deterministic argmax tie-break;
- quality scoring: length / punctuation / stopword-ratio composite;
- fingerprinting: md5 of whitespace-normalized lowercase text (md5 so
  the oracle can reproduce it engine-independently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

LANG_MARKERS = {
    "en": "\\b(the|and|of|to|in|is|you|that|it|for)\\b",
    "de": "\\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\\b",
    "fr": "\\b(le|la|les|et|est|que|pour|dans|une|des)\\b",
    "es": "\\b(el|la|los|las|es|que|para|con|una|por)\\b",
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), "\\s+"))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def marker_hits(text: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(LANG_MARKERS[lang]), 0))


def lang_id(text: Column) -> Column:
    """Marker-word language ID with deterministic en>de>fr>es tie-break."""
    s = {k: marker_hits(text, k) for k in LANG_MARKERS}
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def punct_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^.,;:!?]", "")) / F.length(text)


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: longer docs, fewer punct runs, more
    English stopwords score higher.  Rounded so float semantics match
    the SQL oracle exactly."""
    n_tok = ws_token_count(text).cast("double")
    stop_ratio = marker_hits(text, "en").cast("double") / n_tok
    score = (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return F.round(score, 6)


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")


def fingerprint(text: Column) -> Column:
    """md5 of normalized text — engine-independent document fingerprint."""
    return F.md5(normalized_text(text))


def document_profile(documents: DataFrame) -> DataFrame:
    """One row per document with every text-analysis feature."""
    t = F.col("text")
    return documents.select(
        "doc_id",
        ws_token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("pred_lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )
