"""Text-analysis column functions for large-scale corpus pipelines.

All pure Column expressions (JVM-side, whole-stage codegen; zero Python in
the hot path): token counting, quality features, n-gram language ID,
document fingerprinting. Semantics deliberately chosen to be expressible in
ANSI SQL so DuckDB can oracle-check them (driver contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword inventories for the n-gram/stopword heuristic;
# deterministic, dependency-free (a real deployment plugs fastText etc. into
# the same column slot)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "est", "que"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}

_WS = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (matches DuckDB regexp_split_to_array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokenization: letter runs, digit runs, and single
    punctuation marks as separate tokens (the BPE-pretokenizer regex family;
    a real BPE merges from here). SQL-expressible (regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_BPE_ISH), F.lit(0))


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def fingerprint(col: Column | str) -> Column:
    """Normalized document fingerprint: md5 of lowercase, whitespace-collapsed
    text (whole-document form; md5 keeps it SQL-oracle-checkable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), _WS, " "))


def winnow_fingerprints(col: Column | str, k: int = 7, w: int = 4) -> Column:
    """Winnowing fingerprint SET (the rolling-hash fingerprint family;
    Schleimer/Wilkerson/Aiken's MOSS algorithm, public): hash every
    character k-gram of the normalized text, keep the minimum hash of each
    sliding window of ``w`` grams, dedupe. Local edits perturb only nearby
    windows, so two documents sharing a long run of text share most
    fingerprints — unlike the whole-document md5, which any edit breaks.

    Pure Column expressions (sequence/transform/slice/array_min — JVM-side);
    guards degenerate short texts to an empty set."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), _WS, " ")
    n_grams = F.length(norm) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(F.substring(norm, i, k)),
    )
    n_windows = F.greatest(n_grams - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(grams, j, w)),
    )
    empty = F.array().cast("array<bigint>")
    return F.when(n_grams >= 1, F.array_distinct(mins)).otherwise(empty)


def _hit_filter(words: tuple[str, ...]):
    # NB: pyspark higher-order lambdas must take exactly the lambda arity —
    # extra default params would be bound to Columns — so close over words.
    return lambda t: F.lower(t).isin(*words)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, _hit_filter(stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens(col)
    n_tokens = F.size(toks)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stopword_ratio(col, LANG_STOPWORDS["en"]),
    }


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when nothing matches. Pure Column expression."""
    toks = tokens(col)
    scored = []
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(toks, _hit_filter(words)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    feats = quality_features(text_col)
    out = df
    for name, expr in feats.items():
        out = out.withColumn(name, expr)
    return out
