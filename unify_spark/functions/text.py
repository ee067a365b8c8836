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


def with_winnow_fingerprints(
    df: DataFrame, text_col: str, out_col: str = "winnow_fps", k: int = 7, w: int = 4
) -> DataFrame:
    """Winnowing fingerprint SET (the rolling-hash fingerprint family;
    Schleimer/Wilkerson/Aiken's MOSS algorithm, public): hash every
    character k-gram of the normalized text, keep the minimum hash of each
    sliding window of ``w`` grams, dedupe. Local edits perturb only nearby
    windows, so two documents sharing a long run of text share most
    fingerprints — unlike the whole-document md5, which any edit breaks.

    Implementation is ONE Arrow-batched ``mapInPandas`` with numpy
    sliding-window views — NOT nested Column higher-order functions:
    Catalyst's project collapse re-inlines intermediate expressions into
    HOF lambdas (no CSE across lambda boundaries), so the expression form
    re-evaluates the normalization per gram and the gram array per window —
    O(n³) regex work per row, measured as a 20-minute single-task stall on
    500 short documents. The same trap (and fix) as the round-1 minhash
    and LSH-signature rebuilds. Deterministic splitmix-mixed polynomial
    rolling hash; fingerprints are int64."""
    import re

    import numpy as np
    import pandas as pd

    ws = re.compile(r"\s+")
    pw = (np.uint64(257) ** np.arange(k - 1, -1, -1, dtype=np.uint64))

    def _mix(h: "np.ndarray") -> "np.ndarray":
        # splitmix64 finalizer, vectorized (wraparound arithmetic intended)
        h = (h + np.uint64(0x9E3779B97F4A7C15))
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<bigint>"

    def run(batches):
        with np.errstate(over="ignore"):
            for pdf in batches:
                if pdf.empty:
                    # same guard as every other array-schema emitter: a
                    # 0-row dict/copy-built frame defaults new columns to
                    # float64, which pyarrow cannot convert to array<bigint>
                    continue
                fps = []
                for t in pdf[text_col]:
                    if t is None:
                        fps.append([])
                        continue
                    s = ws.sub(" ", str(t).strip().lower()).encode("utf-8")
                    if len(s) < k:
                        fps.append([])
                        continue
                    a = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
                    grams = _mix(
                        (np.lib.stride_tricks.sliding_window_view(a, k) * pw).sum(axis=1)
                    )
                    ww = min(w, len(grams))
                    mins = np.lib.stride_tricks.sliding_window_view(grams, ww).min(axis=1)
                    fps.append(np.unique(mins).view(np.int64).tolist())
                out = pdf.copy()
                out[out_col] = fps
                yield out

    return df.mapInPandas(run, schema=out_schema)


def _hit_filter(words: tuple[str, ...]):
    # NB: pyspark higher-order lambdas must take exactly the lambda arity —
    # extra default params would be bound to Columns — so close over words.
    return lambda t: F.lower(t).isin(*words)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, _hit_filter(stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals, plus the
    Gopher-style repetition signals (Rae et al. 2021 §A1.1): the fraction
    of repeated tokens and of repeated token-3-grams — boilerplate, keyword
    stuffing, and degenerate generations score high on both. All pure
    Column expressions (higher-order functions, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens(col)
    n_tokens = F.size(toks)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    n3 = n_tokens - 2
    # trigrams via zip_with over three shifted slices — NOT element_at(toks,
    # i) inside a transform lambda: an expression referenced INSIDE a HOF
    # lambda is re-evaluated per element (the known Catalyst behavior the
    # winnow fingerprints work around), which re-runs the regexp split
    # n_tokens times per row (~20x wall on the documents table). The slices
    # sit outside the lambdas, so the split evaluates O(1) times per row.
    t12 = F.zip_with(
        F.slice(toks, F.lit(1), n3),
        F.slice(toks, F.lit(2), n3),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tris = F.zip_with(
        t12, F.slice(toks, F.lit(3), n3), lambda ab, c: F.concat_ws(" ", ab, c)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stopword_ratio(col, LANG_STOPWORDS["en"]),
        "token_repetition_ratio": F.when(
            n_tokens > 0,
            1.0 - F.size(F.array_distinct(toks)) / n_tokens.cast("double"),
        ).otherwise(F.lit(0.0)),
        # guard n_tokens >= 3: F.sequence(1, n) DESCENDS when n < 1
        "trigram_repetition_ratio": F.when(
            n_tokens >= 3,
            1.0 - F.size(F.array_distinct(tris)) / n3.cast("double"),
        ).otherwise(F.lit(0.0)),
    }


def with_quality_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    r"""``with_quality``'s batch form: the same seven quality features in ONE
    Arrow-batched ``mapInPandas`` pass instead of a stack of higher-order
    Column expressions.

    Why: the Column form's HOF lambdas (filter/zip_with/array_distinct) are
    interpreted per element with no codegen and no common-subexpression
    reuse across feature columns — measured 8–10s for 50k documents at
    local[32], all CPU (guide §4.2: hand whole batches to native code
    instead). Here tokenization happens once per document and the
    set/trigram distinct counts are C-speed ``set`` operations; measured
    ~10× faster on the same input with identical outputs.

    Semantics parity with ``quality_features`` (pinned by
    tests/test_functions.py and the q_text_quality oracle): ASCII ``\s+``
    regex split of the trimmed text (Java regex \s is ASCII-only —
    ``re.ASCII`` matches it), distinct counts as exact integers, the same
    float expression order, null text yielding NULL length/ratio features
    and 0.0 repetition ratios (the Column form's ``otherwise`` branch)."""
    import re

    import pandas as pd

    ws_split = re.compile(r"\s+", re.ASCII)
    punct_re = re.compile(r"[.,;:!?]")
    stop = {w for w in LANG_STOPWORDS["en"]}

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = base + (
        ", n_chars int, n_tokens int, mean_token_len double, punct_ratio double"
        ", stopword_ratio double, token_repetition_ratio double"
        ", trigram_repetition_ratio double"
    )

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            cols: dict[str, list] = {k: [None] * n for k in (
                "n_chars", "n_tokens", "mean_token_len", "punct_ratio",
                "stopword_ratio", "token_repetition_ratio",
                "trigram_repetition_ratio",
            )}
            for i, t in enumerate(pdf[text_col]):
                if not isinstance(t, str):
                    # null text: length/ratio features stay NULL; the
                    # repetition ratios hit the Column form's otherwise(0.0)
                    cols["token_repetition_ratio"][i] = 0.0
                    cols["trigram_repetition_ratio"][i] = 0.0
                    continue
                nc = len(t)
                toks = ws_split.split(t.strip())
                nt = len(toks)
                denom = max(nt, 1)
                cols["n_chars"][i] = nc
                cols["n_tokens"][i] = nt
                cols["mean_token_len"][i] = (nc - nt + 1) / denom
                cols["punct_ratio"][i] = (nc - len(punct_re.sub("", t))) / max(nc, 1)
                hits = 0
                for x in toks:
                    if x.lower() in stop:
                        hits += 1
                cols["stopword_ratio"][i] = hits / denom
                cols["token_repetition_ratio"][i] = (
                    1.0 - len(set(toks)) / nt if nt > 0 else 0.0
                )
                if nt >= 3:
                    n3 = nt - 2
                    tris = {" ".join(toks[j : j + 3]) for j in range(n3)}
                    cols["trigram_repetition_ratio"][i] = 1.0 - len(tris) / n3
                else:
                    cols["trigram_repetition_ratio"][i] = 0.0
            out = pdf.copy()
            for k, v in cols.items():
                out[k] = pd.Series(v, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(run, schema=out_schema)


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


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization for dedup: lowercase, strip everything
    but letters/digits/whitespace, collapse whitespace, trim. Catches the
    near-dups whole-document md5 misses (case, punctuation, formatting).
    Pure Column expression; DuckDB reproduces it with the same regexes
    (global flag)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), _WS, " ")
    )


def normalized_duplicates(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, norm_fp, group_size) for rows whose NORMALIZED text collides
    with at least one other row — formatting-insensitive exact dedup, the
    tier between byte-exact md5 and MinHash. Two-phase like the uniqueness
    constraint: only (id, 32-byte fp) shuffles, never the text."""
    from pyspark.sql import Window

    fp = df.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("norm_fp")
    )
    w = Window.partitionBy("norm_fp")
    return (
        fp.withColumn("group_size", F.count(F.lit(1)).over(w))
        .where(F.col("group_size") > 1)
        .select(id_col, "norm_fp", "group_size")
    )


# Simple, engine-portable PII surface patterns (no lookaround, so Java
# regex and RE2/DuckDB agree): the redaction-pipeline pre-filter. A real
# deployment chains an NER model behind this cheap column-expression gate.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-pattern non-overlapping match counts (regexp_count — JVM-side,
    codegen). Keys become ``n_<name>`` columns in ``with_pii``."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(p)) for name, p in PII_PATTERNS.items()}


def with_pii(df: DataFrame, text_col: str) -> DataFrame:
    out = df
    for name, expr in pii_counts(text_col).items():
        out = out.withColumn(f"n_{name}", expr)
    return out


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_freq: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """C4-style line-level boilerplate removal: a line occurring in ≥
    ``min_doc_freq`` DISTINCT documents (nav bars, cookie banners, footer
    text — the sub-document duplication whole-doc dedup can't see) is
    dropped from EVERY document; all other lines keep their order. Returns
    (id, cleaned text, n_lines, n_removed). ``delim`` generalizes to
    sentence- or segment-level dedup.

    Matching is on the trimmed line's xxhash64 (8-byte key — the
    doc-frequency distinct/aggregate and the join back all compare longs,
    not 32-char hex strings; two distinct lines collide with probability
    ~2^-64, indistinguishable from the former md5's truncated practical
    use); blank lines never count toward doc frequency and are never
    removed (every doc has them — they'd all be 'boilerplate'). Null text
    passes through as null.

    Plan shape at 10^10 docs: lines explode once; doc-frequency is a
    two-phase hash aggregate on the 8-byte line hash (count DISTINCT docs
    per hash with a (hash, id) pre-distinct — never the line text); the
    boilerplate set joins back by hash; reassembly is one groupBy(id) with
    an array_sort(collect_list(struct(pos, line))) — order restored from
    the captured position, no window."""
    # F.split's separator is a Java regex — \Q...\E quotes the literal
    # delimiter so ". " (sentence mode) doesn't match any-char + space
    quoted = "\\Q" + delim + "\\E"
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(quoted), -1)).alias("_pos", "_line"),
    ).withColumn("_h", F.xxhash64(F.trim(F.col("_line"))))

    hot = (
        lines.filter(F.trim(F.col("_line")) != "")
        .select("_h", "_id")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("_h")
    )
    kept = lines.join(hot.withColumn("_hot", F.lit(True)), on="_h", how="left")
    rebuilt = (
        kept.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.coalesce(F.col("_hot"), F.lit(False)).cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_hot").isNull(),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda x: x["_line"],
                ),
                delim,
            ).alias("_cleaned"),
        )
    )
    orig = df.select(F.col(id_col), F.col(text_col).alias("_orig"))
    out = orig.join(rebuilt.withColumnRenamed("_id", id_col), on=id_col, how="left")
    return out.select(
        F.col(id_col),
        F.when(F.col("_orig").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("_cleaned"), F.lit("")))
        .alias(text_col),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
    )


def top_ngrams(
    df: DataFrame, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-level top-k token n-grams by DOCUMENT frequency (number of
    documents containing the gram — the boilerplate/contamination signal;
    shingles are distinct-per-doc, which is exactly doc frequency after the
    explode). Deterministic ties (doc_freq desc, ngram asc).
    explode→groupBy gets map-side partial aggregation; the orderBy+limit
    compiles to TakeOrdered (per-partition top-k then a k-row driver
    merge), never a full sort shuffle. Gram generation is the batch Arrow
    pass (dedup.shingle_rows — same strings, ~8× less CPU than the HOF
    expression chain)."""
    from unify_spark.functions.dedup import _ensure_parallel, shingle_rows

    grams = shingle_rows(
        _ensure_parallel(df.select(F.col(text_col))), None, text_col, n
    ).withColumnRenamed("s", "ngram")
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("ngram"))
        .limit(k)
    )
