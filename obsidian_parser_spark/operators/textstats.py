"""Text-analysis operators for training-data curation.

All JVM-native (built-in functions only — these run in whole-stage codegen
and are exactly reproducible by the DuckDB oracle):

* language-ID      — stopword-marker n-gram heuristic, argmax over fixed
                     marker lists with deterministic tie-break;
* quality scoring  — length / punctuation / stopword / repetition ratios;
* token counting   — whitespace tokens + a BPE-ish regex token count
                     (letter runs, digit runs, single punctuation marks —
                     the classic GPT-2-style pre-tokenizer shape);
* fingerprinting   — polynomial rolling hash over tokens (order-sensitive,
                     unlike a bag-of-words hash), mod 1e9+7 so the
                     accumulator never overflows 64-bit in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker stopwords per language (tiny fixed dictionaries; heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "mit"],
    "en": ["the", "and", "of", "to", "is", "that", "it", "for"],
    "es": ["el", "la", "los", "las", "que", "de", "y", "es"],
    "fr": ["le", "la", "les", "et", "que", "est", "pour", "dans"],
}

_TOKENS = "filter(split(lower({t}), '\\\\s+'), x -> x != '')"


def _marker_hits(lang: str, tokens: str) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + ")"
    return f"size(filter({tokens}, x -> array_contains({arr}, x)))"


def lang_id(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, marker_hits): argmax marker-count language,
    ties broken by language code order, 'und' (undetermined) when 0 hits."""
    t = _TOKENS.format(t=text_col)
    langs = sorted(LANG_MARKERS)
    hits = ", ".join(
        f"struct({_marker_hits(lang, t)} AS hits, '{lang}' AS lang)" for lang in langs
    )
    # array_max on struct(hits, lang) orders by hits then lang — we want
    # max hits, tie → FIRST lang code, so invert lang order via sort+reverse:
    # simpler: reduce with explicit comparison.
    best = (
        f"aggregate(array({hits}), struct(-1 AS hits, '' AS lang), "
        f"(acc, x) -> CASE WHEN x.hits > acc.hits THEN x ELSE acc END)"
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"CASE WHEN ({best}).hits <= 0 THEN 'und' ELSE ({best}).lang END"
        ).alias("pred_lang"),
        F.expr(f"({best}).hits").cast("long").alias("marker_hits"),
    )


def quality_scores(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features + a composite score in [0, 1]."""
    t = _TOKENS.format(t=text_col)
    en = "array(" + ", ".join(f"'{w}'" for w in LANG_MARKERS["en"]) + ")"
    d = documents.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({t})").cast("long").alias("n_words"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '[.,;:!?]', 0))"
        ).cast("long").alias("n_punct"),
        F.expr(f"size(filter({t}, x -> array_contains({en}, x)))")
        .cast("long")
        .alias("n_stopwords"),
        F.expr(f"size(array_distinct({t}))").cast("long").alias("n_distinct_words"),
    )
    d = d.withColumn(
        "avg_word_len",
        F.round(
            F.when(F.col("n_words") > 0, F.col("n_bytes") / F.col("n_words")).otherwise(
                F.lit(0.0)
            ),
            4,
        ),
    ).withColumn(
        "distinct_ratio",
        F.round(
            F.when(
                F.col("n_words") > 0, F.col("n_distinct_words") / F.col("n_words")
            ).otherwise(F.lit(0.0)),
            4,
        ),
    )
    # composite: reasonable length + some punctuation + lexical diversity
    return d.withColumn(
        "quality",
        F.round(
            (F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.4)
            + (F.least(F.col("n_punct") / 5.0, F.lit(1.0)) * 0.2)
            + (F.col("distinct_ratio") * 0.4),
            4,
        ),
    )


# GPT-2-ish pre-tokenizer shape: letter runs | digit runs | single non-space symbol
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]"


def token_counts(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    t = _TOKENS.format(t=text_col)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({t})").cast("long").alias("ws_tokens"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0))"
        ).cast("long").alias("bpe_tokens"),
    )


def fingerprints(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive rolling hash: acc = (acc*31 + len(tok)*7 + ascii(tok))
    mod 1e9+7.  Accumulator < 2^35 at every step — exact in any engine."""
    t = _TOKENS.format(t=text_col)
    # map tokens to small ints first, then fold — the same two-step shape is
    # expressible as list_transform + list_reduce in the DuckDB oracle
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"aggregate(transform({t}, x -> length(x) * 7 + ascii(x)), 0L, "
            f"(acc, v) -> (acc * 31 + v) % 1000000007)"
        ).alias("fingerprint"),
    )
