"""Text-analysis operators for large-scale training-data pipelines.

Extension tier beyond the reference surface (SURVEY.md §7 phase 5):
token statistics, quality scoring, and exact deduplication over a
``documents``-shaped table (``doc_id``, ``text``, ...). Everything is
native column expressions — whole-stage codegen, no Python in the hot
path — so the same plan scales from the sf0.01 test tables to a
100 TB corpus (narrow per-row transforms; the only shuffle is the
dedup groupBy on a well-distributed hash key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default stopword list for quality scoring (tiny on purpose — the
#: mechanism is the operator; swap in a real list per language).
STOPWORDS = ["the", "a", "of", "to", "and"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (Java regex ``\\s+`` over trimmed text)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics (counts + average token length)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars_calc"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
    )


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document quality signals: stopword ratio, lexical diversity,
    and a combined score ``diversity * (1 - stopword_ratio)``.
    """
    stop = stopwords if stopwords is not None else STOPWORDS
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop))).cast("long")
    stop_ratio = n_stop.cast("double") / n_tokens
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("distinct_ratio"),
        (diversity * (F.lit(1.0) - stop_ratio)).alias("quality_score"),
    )


#: Marker-word profiles for the language-ID heuristic. Tiny stopword
#: sets — the operator demonstrates the scoring mechanism (per-language
#: marker hit counts → argmax with a deterministic tie-break); swap in
#: real n-gram profiles for production use.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "zu"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "les", "de", "et", "des"],
}

#: BPE-ish token pattern: word runs or single non-space punctuation.
BPE_TOKEN_PATTERN = r"\w+|[^\w\s]"

#: Rolling-hash parameters (polynomial hash mod a 31-bit prime, so the
#: fold stays far from 64-bit overflow on any engine).
FP_BASE = 31
FP_MOD = 1_000_000_007


def md5_token_hash(c: Column) -> Column:
    """60-bit md5-derived token hash (same integer DuckDB computes)."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Language-ID heuristic: marker-word scores + deterministic argmax.

    Ties break alphabetically by language code; an all-zero score row
    is classified ``und`` (undetermined).
    """
    prof = profiles if profiles is not None else LANG_PROFILES
    toks = tokens(text_col)

    def marker_hits(words: list[str]):
        return lambda t: t.isin(*words)

    scores = {
        lang: F.size(F.filter(toks, marker_hits(words))).cast("long")
        for lang, words in sorted(prof.items())
    }
    mx = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    pred = F.when(mx == 0, F.lit("und"))
    for lang in sorted(prof):
        pred = pred.when(scores[lang] == mx, F.lit(lang))
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(prof)],
        pred.alias("predicted_lang"),
    )


def bpe_token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counts under whitespace and BPE-ish regex tokenizations."""
    return docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )


def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the md5-hashed token sequence (content-defined, whitespace-robust)."""
    toks = tokens(text_col)
    hashed = F.transform(toks, lambda t: F.pmod(md5_token_hash(t), F.lit(FP_MOD)))
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * FP_BASE + h, F.lit(FP_MOD)),
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        fp.alias("fingerprint"),
    )


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact deduplication by content hash (one group row per distinct
    text): ``fingerprint`` (md5 hex), ``n_copies``, ``keep_doc_id``
    (the smallest id — the canonical representative).

    The groupBy key is a 128-bit content hash, so the shuffle is
    uniformly distributed regardless of document skew; at 100 TB this
    is a single well-balanced exchange.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_doc_id"),
        )
    )


def deduplicate_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one document (smallest id) per distinct text."""
    keep = exact_dedup_groups(docs, text_col, id_col).select(
        F.col("keep_doc_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")
