"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting. All built-in-function plans (split / regexp /
array ops) — narrow, shuffle-free per-document transforms that scale to
arbitrary corpus size; the only shuffles are the explicit corpus-level
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tailpipe_spark.operators.dedup import normalize_text

#: tiny marker-word lists per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _word_hits(words_col, vocab: list[str]):
    """Tokens matching any vocab word, counted over the already-split
    token array — one split per document, no per-word regex passes."""
    return F.size(F.filter(words_col, lambda t: t.isin(*vocab)))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts, 'und'
    (undetermined) when no marker appears. The text is split once; each
    language score is an array filter over the token array (the
    regexp-replace-per-word formulation cost ~20 full-text regex passes
    per row)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    scored = docs
    for lang, markers in LANG_MARKERS.items():
        scored = scored.withColumn(f"__s_{lang}", _word_hits(words, markers))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"__s_{l}") for l in langs])
    pred = F.lit("und")
    # deterministic tie-break: first language in sorted order wins
    for l in sorted(langs, reverse=True):
        pred = F.when((best > 0) & (F.col(f"__s_{l}") == best), F.lit(l)).otherwise(pred)
    out = scored.withColumn("pred_lang", pred)
    return out.drop(*[f"__s_{l}" for l in langs])


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a boolean keep flag:
    n_chars / n_words / avg_word_len / punct_ratio / stopword_ratio."""
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")
    n_chars = F.length(norm)
    n_words = F.size(words)
    n_punct = F.length(F.regexp_replace(norm, r"[a-z0-9 ]", ""))
    stop_hits = _word_hits(words, STOPWORDS)
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    return docs.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        avg_word_len.alias("q_avg_word_len"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("q_punct_ratio"),
        (stop_hits / n_words).alias("q_stopword_ratio"),
        (
            (n_words >= 5)
            & (n_words <= 100000)
            & (avg_word_len >= 2.0)
            & (avg_word_len <= 12.0)
        ).alias("q_keep"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", top_k: int = 20) -> DataFrame:
    """Corpus token frequency table, top_k by count (token asc tiebreak)."""
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(top_k)
    )


def doc_token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts (total + distinct) — the 'token
    counting' primitive for pipeline budgeting."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    return docs.select(
        id_col,
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set. Docs differing only in token order/duplication collide."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    return docs.select(
        id_col,
        F.md5(F.array_join(F.array_sort(F.array_distinct(words)), " ")).alias(
            "fingerprint"
        ),
    )
