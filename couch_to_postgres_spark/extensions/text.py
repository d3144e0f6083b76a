"""Text analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in string/regex/higher-order functions — JVM-side,
embarrassingly parallel, no shuffle — which is exactly the shape a 100 TB
corpus pass needs (pure map over partitions, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z0-9]+"
#: tiny function-word list for the language-ID heuristic (en-weighted).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def _words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda w: w != F.lit(""))


def token_count(text: Column | str) -> Column:
    """Regex token count (BPE-ish word/number tokens)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def text_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document feature row: char/word/token counts, mean word length,
    punctuation ratio, stopword ratio — the standard quality-filter inputs."""
    words = _words(text_col)
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", ""))
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        token_count(text_col).alias("n_tokens"),
        F.round((n_chars.cast("double") / F.greatest(n_words, F.lit(1))), 4).alias(
            "chars_per_word"
        ),
        F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias(
            "stopword_ratio"
        ),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """Keep documents passing the basic quality gates (Gopher-style length
    and symbol-ratio rules, reduced to the portable feature set)."""
    feats = text_features(df, text_col, id_col)
    return feats.filter(
        (F.col("n_words") >= min_words) & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(id_col, "n_words", "punct_ratio")


def language_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language-ID signal: function-word hit ratio (an n-gram/
    wordlist language detector reduced to its portable core). Emits the
    ratio and a binary english-like flag; a real deployment swaps in a
    per-language wordlist table joined by broadcast."""
    words = _words(text_col)
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    ratio = F.round(
        stop_hits.cast("double") / F.greatest(F.size(words), F.lit(1)), 4
    )
    return df.select(
        F.col(id_col),
        ratio.alias("stopword_ratio"),
        (ratio >= 0.05).alias("english_like"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over case/whitespace-normalized text, plus
    a coarse 8-hex-char prefix bucket (the rolling-hash analog used for
    shard-local near-dup prefiltering)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    h = F.md5(norm)
    return df.select(
        F.col(id_col),
        h.alias("fp_md5"),
        F.substring(h, 1, 8).alias("fp_bucket"),
    )

def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    salt: str = "split1",
) -> DataFrame:
    """Deterministic, reproducible train/eval split by md5 bucket.

    The split key is ``md5(salt || ':' || id)``; a row is *train* iff its
    first 4 hex chars fall below ``floor(train_frac * 16^4)``. Unlike
    ``df.sample``/``randomSplit`` this is stable across runs, partitionings
    and engines (same rows land in the same split on any cluster size —
    and in the DuckDB oracle), and changing ``salt`` re-rolls the split.
    Pure map, no shuffle."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    thr = format(int(train_frac * 65536), "04x")
    return df.withColumn(
        "split",
        F.when(F.substring(key, 1, 4) < F.lit(thr), F.lit("train")).otherwise(
            F.lit("eval")
        ),
    )


def top_tokens(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level token frequency top-k with a total deterministic order
    (count desc, token asc).

    Plan shape at scale: explode → partial map-side count → one shuffle of
    (token, partial-count) → TakeOrderedAndProject (per-partition top-k
    merged on the driver) — the full sorted histogram is never
    materialized or globally sorted."""
    words = _words(text_col)
    return (
        df.select(F.explode(words).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )
