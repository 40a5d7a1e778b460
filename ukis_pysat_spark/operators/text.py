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


def bm25_topk(
    documents: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 (Okapi) top-k retrieval over a document corpus — the
    standard lexical ranking for training-data curation (query-biased
    sampling, eval-set retrieval, contamination checks).

    Fully relational and scale-shaped like an inverted-index probe:
    tokens are exploded but FILTERED to the query terms before any
    exchange, so the shuffle carries only the matching postings, never
    the corpus; ``df``/corpus stats are tiny broadcast sides and the
    final top-k is a TakeOrderedAndProject.  No Python runs anywhere.

    Determinism/oracle contract: the per-term contribution
    ``idf * tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))`` is computed
    in IEEE double with the idf (the only transcendental) rounded
    through float32, then snapped to the dyadic 2^-20 grid — making
    the per-document SUM exact and therefore independent of
    aggregation order in any engine.  Scores differ from textbook
    BM25 by < 1e-6.

    Returns (doc_id, score) sorted by (score desc, doc_id asc),
    ``k`` rows."""
    terms = sorted({w for w in query.lower().split() if w})
    if not terms:
        raise ValueError("query has no tokens")
    toks = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"),
                    lambda w: w != "")
    docs2 = documents.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = docs2.agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("dl").alias("sum_dl"))
    tf = (
        docs2.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    joined = tf.join(F.broadcast(df_), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    ).cast("float").cast("double")
    part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / avgdl)
    )
    contrib = (
        F.floor(idf * part * F.lit(1048576.0)).cast("double")
        / F.lit(1048576.0)
    )
    return (
        joined.select("doc_id", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def chunk_documents(
    documents: DataFrame,
    size: int,
    overlap: int = 0,
    by: str = "chars",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size overlapping chunks — the
    standard RAG/embedding pre-pass.  ``by='chars'`` slices the raw
    string; ``by='words'`` splits on whitespace runs and rejoins each
    chunk with single spaces.  Chunk k starts at offset
    ``k * (size - overlap)``; starts past the end emit nothing, and a
    document shorter than ``size`` yields exactly one chunk (empty
    documents yield one empty chunk).

    Stays entirely JVM-side — ``sequence``/``explode`` fan-out with
    ``substring``/``slice``, no Python UDF, no shuffle — so it scales
    as a pure map over the documents table.  Output: (id, chunk_id,
    chunk_start, chunk) with chunk_start in the unit of ``by``
    (0-based)."""
    if size < 1 or overlap < 0 or overlap >= size:
        raise ValueError("need size >= 1 and 0 <= overlap < size")
    if by not in ("chars", "words"):
        raise ValueError(f"unknown chunk unit {by!r}")
    step = size - overlap
    t = F.col(text_col)
    if by == "chars":
        n = F.length(t)
        units = t
    else:
        # split on whitespace runs; a leading empty token appears when
        # the text starts with whitespace — filter like ws_token_count
        units = F.filter(F.split(t, "\\s+"), lambda w: w != "")
        n = F.size(units)
    # number of chunks: ceil(max(n - overlap, 1) / step)
    n_chunks = F.floor(
        (F.greatest(n - overlap, F.lit(1)) + (step - 1)) / F.lit(step)
    ).cast("long")
    k = F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    start = (F.col("k") * step).cast("long")
    if by == "chars":
        chunk = F.substring(t, (start + 1).cast("int"), size)
    else:
        chunk = F.array_join(F.slice(units, (start + 1).cast("int"), size), " ")
    return (
        documents.select(F.col(id_col).alias("id"), t.alias(text_col))
        .withColumn("k", k)
        .select(
            "id",
            F.col("k").cast("long").alias("chunk_id"),
            start.alias("chunk_start"),
            chunk.alias("chunk"),
        )
    )
