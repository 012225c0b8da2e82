"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything except the winnowing fingerprint is pure Spark expressions
(whole-stage codegen); the fingerprint is a numpy Arrow UDF.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# Tiny per-language stopword profiles (n-gram heuristic seeds).  The
# point is the *operator shape* (per-language hit-rate scoring + argmax),
# not lexicographic completeness.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non", "con", "del"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased trimmed text; empty text → []"""
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation
    symbols, via one regex extract-all (a cheap stand-in for a real BPE
    vocabulary; counts within ~10% of GPT-2 BPE on English prose)."""
    return F.size(
        F.regexp_extract_all(
            text, F.lit(r"[A-Za-z]{1,8}|\d|[^\sA-Za-z\d]"), 0
        )
    )


def _lang_score(text: Column, words: list[str]) -> Column:
    toks = tokens_col(text)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(words))
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits / F.size(toks)
    )


def language_id(text: Column, min_score: float = 0.05) -> Column:
    """Heuristic language ID: per-language stopword hit rate, argmax;
    below ``min_score`` → 'unknown'.  Pure when-chain over array
    predicates — no Python."""
    scores = [(lang, _lang_score(text, words)) for lang, words in LANG_PROFILES.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("unknown")
    # build reverse so earlier languages win ties (deterministic order)
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best >= min_score), lang).otherwise(expr)
    return expr


EN_STOPWORDS = LANG_PROFILES["en"] + [
    "a", "an", "on", "at", "by", "be", "as", "are", "was", "this",
]


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features: length, token stats, punctuation /
    digit / uppercase ratios, stopword ratio, mean word length — the
    standard pretraining-corpus filters, all codegen expressions."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    safe = lambda c: F.when(n_chars == 0, F.lit(0.0)).otherwise(c)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[!-/:-@\[-`{-~]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        safe(n_punct / n_chars).alias("punct_ratio"),
        safe(n_digit / n_chars).alias("digit_ratio"),
        safe(n_upper / n_chars).alias("upper_ratio"),
        F.when(n_tokens == 0, F.lit(0.0))
        .otherwise(n_stop / n_tokens)
        .alias("stopword_ratio"),
        F.when(n_tokens == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(
                toks, F.lit(0), lambda acc, x: acc + F.length(x)
            ).cast("double")
            / n_tokens
        )
        .alias("mean_word_len"),
    )


def quality_score(features: DataFrame) -> DataFrame:
    """Scalar quality score in [0,1]: length band + low punct/digit +
    sane stopword ratio (the classic Gopher-style rule set, linearized).
    """
    f = features
    length_ok = F.when(
        (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.0)
    punct_ok = F.lit(1.0) - F.least(F.col("punct_ratio") * 2, F.lit(1.0))
    digit_ok = F.lit(1.0) - F.least(F.col("digit_ratio") * 3, F.lit(1.0))
    stop_ok = F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    word_ok = F.when(
        (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 1.0
    ).otherwise(0.0)
    return f.withColumn(
        "quality_score",
        F.round(
            (length_ok + punct_ok + digit_ok + stop_ok + word_ok) / 5.0, 6
        ),
    )


def make_winnow_udf(k: int = 5, window: int = 4):
    """Winnowing fingerprints (Schleimer et al.): k-gram rolling hashes,
    min per sliding window, dedup — numpy Arrow UDF, one vectorized pass
    per document."""

    @F.pandas_udf(ArrayType(LongType()))
    def winnow(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            t = (t or "").lower()
            if len(t) < k:
                out.append([zlib.crc32(t.encode())] if t else [])
                continue
            hashes = np.fromiter(
                (zlib.crc32(t[i : i + k].encode()) for i in range(len(t) - k + 1)),
                dtype=np.int64,
            )
            if len(hashes) <= window:
                out.append([int(hashes.min())])
                continue
            strides = np.lib.stride_tricks.sliding_window_view(hashes, window)
            mins = strides.min(axis=1)
            out.append(sorted(set(int(x) for x in mins)))
        return pd.Series(out)

    return winnow


def fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(doc_id, fingerprints array<long>) — winnowed rolling-hash set;
    overlap of fingerprint sets ≈ shared content (plagiarism/leak
    detection at corpus scale via explode + groupBy on hash)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        make_winnow_udf(k, window)(F.col(text_col)).alias("fingerprints"),
    )


def fingerprint_matches(fp: DataFrame, min_shared: int = 2) -> DataFrame:
    """Documents sharing ≥ min_shared fingerprints: explode → self-join
    on hash (inverted index — never all-pairs)."""
    x = fp.select("doc_id", F.explode("fingerprints").alias("h"))
    a, b = x.alias("a"), x.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
