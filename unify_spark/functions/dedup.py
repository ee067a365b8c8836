"""Deduplication operators for training-data pipelines, Spark-first.

Exact (hash groupBy), MinHash+LSH (shingle → k minhashes → banded bucket
join), SimHash (64-bit token-hash majority), and n-gram Jaccard — all built
from JVM-side column expressions + shuffles Catalyst can reason about. No
Python UDFs anywhere: hashing is ``xxhash64``, set ops are higher-order
array functions.

Scale notes per operator are inline — the candidate-pair joins are the part
that must survive 10^9+ documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from unify_spark.functions.text import tokens


def exact_duplicates(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Groups with >1 occurrence of the exact key (hash-aggregate;
    map-side partial combine keeps the shuffle tiny)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (pure expression:
    split → n shifted slices → iterated zip_with join).

    Construction note: the grams are built by zip_with over n SHIFTED
    SLICES of the token array, never by slice(toks, i, n) inside a
    transform lambda — an expression referenced inside a HOF lambda is
    re-evaluated per element (Catalyst's lambda semantics), which would
    re-run the regexp split once per shingle per row and made the whole
    shingle family (Jaccard/containment/minhash/top-ngrams) several times
    slower. The slices sit outside the lambdas, so the split evaluates
    O(n) times per row, independent of token count.

    Short-text guard: texts with < n tokens (k < 1) emit an empty shingle
    set; null text emits null."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    grams = F.slice(toks, F.lit(1), F.greatest(k, F.lit(1)))
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, F.lit(1 + j), F.greatest(k, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    empty = F.array().cast("array<string>")
    return (
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))  # null in, null out
        .when(k >= 1, F.array_distinct(grams))
        .otherwise(empty)
    )


def shingle_rows(
    df: DataFrame, id_col: str | None, text_col: str, n: int = 3
) -> DataFrame:
    """Exploded distinct word-``n``-gram rows — ``(id, s)`` per (document,
    shingle), or just ``(s)`` when ``id_col`` is None — in ONE Arrow pass.

    The batch twin of ``shingles(col, n)`` + ``explode``: identical strings
    (ASCII ``\\s+`` split of the trimmed text — Java regex \\s is
    ASCII-only, ``re.ASCII`` matches it — space-joined n-grams, first-
    occurrence distinct, null/short texts emit nothing), but tokenization
    and gram assembly run as C-speed string ops once per document instead
    of an interpreted zip_with/array_distinct HOF chain per row (guide
    §4.2; measured 4.2s → ~0.5s for the bigram explode over 50k docs).
    Oracle-facing consumers (q_ngram_jaccard/containment, q_top_ngrams)
    stay bit-identical because only the string set matters downstream."""
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)
    cols = ([F.col(id_col)] if id_col else []) + [F.col(text_col)]
    slim = df.select(*cols)
    if id_col:
        id_type = df.schema[id_col].dataType.simpleString()
        schema = f"{id_col} {id_type}, s string"
    else:
        schema = "s string"

    def run(batches):
        for pdf in batches:
            ids_out: list = []
            sh_out: list = []
            texts = pdf[text_col]
            ids = pdf[id_col] if id_col else texts
            for i, t in zip(ids, texts):
                if not isinstance(t, str):
                    continue
                toks = ws.split(t.strip())
                if len(toks) < n:
                    continue
                seen = set()
                for j in range(len(toks) - n + 1):
                    g = " ".join(toks[j : j + n])
                    if g not in seen:
                        seen.add(g)
                        if id_col:
                            ids_out.append(i)
                        sh_out.append(g)
            out = {"s": sh_out}
            if id_col:
                out = {id_col: ids_out, "s": sh_out}
            yield pd.DataFrame(out)

    return slim.mapInPandas(run, schema=schema)


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    session's shuffle parallelism — the small-file case where one parquet
    split would serialize the whole shingle/fingerprint compute stage (a
    5 MB single-row-group file cannot be split by maxPartitionBytes). The
    shuffled payload is the slim (id, text) projection the caller already
    made. At production scale input splits >> cores and this is a no-op."""
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df




def _pair_agg_width(df: DataFrame) -> int:
    """Partition width for candidate-PAIR aggregations: 4× the session's
    shuffle parallelism. The pair join's OUTPUT is orders of magnitude
    larger than its input (quadratic in bucket size), which AQE's
    input-size-based coalescing cannot see — at the default width each
    aggregation task builds a multi-million-entry hash map and falls back
    to sort+spill (guide §2.2/§5; measured 14.8s → 10.8s on a 114M-pair
    aggregate and 30.6s → 19.8s on a 208M-pair aggregate at local[32],
    where the 8× width beat 4× for the larger mass at no cost to the
    smaller). An explicit hash repartition on the pair key right before
    the groupBy both widens the stage and lets the aggregate reuse the
    exchange (single complete agg, no spilling partial phase). Scales
    with the session conf, not the host."""
    return 8 * int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """k minhashes per document via explode → k min-aggregates.

    Why this shape: computing k ``array_min(transform(shingles, ...))``
    columns re-evaluates the shingle expression per hash family (Catalyst's
    project-collapse re-inlines it — measured), whereas explode evaluates
    shingling ONCE per row and the k mins combine map-side, so the shuffle
    carries only k longs per (id, input-partition). This is also the shape
    that survives 10^9 documents: state is bounded by ids × k."""
    src = _ensure_parallel(df.select(F.col(id_col), F.col(text_col)))
    sh = shingle_rows(src, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _drop_hot_buckets(banded: DataFrame, keys: list[str], cap: int | None) -> DataFrame:
    """Drop LSH buckets with more than ``cap`` members before the self-join.

    At 10^9 documents a boilerplate-heavy bucket of 10^6 members emits
    10^12 pairs from ONE key — no amount of AQE skew-splitting survives
    that; the standard guard is a bucket-size cap. Members of an
    over-cap bucket are near-certain exact/near duplicates of each other,
    which ``exact_duplicates`` (hash groupBy — linear, skew-immune) already
    reports; the cap only suppresses their quadratic re-derivation here.

    Implementation: an inline ``count().over(Window.partitionBy(keys))``
    filter, NOT a separate groupBy + broadcast anti-join. The window's
    exchange hashes on exactly the keys the candidate self-join partitions
    by, so the cap rides the shuffle the join already needs — zero extra
    aggregation passes (the r2 anti-join form cost minhash/simhash ~50%
    extra wall for the same semantics)."""
    if cap is None:
        return banded
    from pyspark.sql import Window

    # explicit-width repartition on the join keys: the banded set is SMALL
    # on the wire (ids + band hashes), so AQE coalesces its exchange to a
    # handful of partitions — and then the self-join EXPLODES inside those
    # few tasks (join output >> join input is invisible to AQE's input-size
    # coalescing; measured 8 tasks grinding 100M pair rows). A user-specified
    # partition count is exempt from AQE coalescing, the window clusters on
    # it with no extra exchange, and the self-join reuses it on both aliases.
    # 4× the session parallelism for the same reason as _pair_agg_width:
    # the join's OUTPUT is quadratic in bucket size, so per-task pair
    # production at 1× width dwarfs the input share (208M-pair containment
    # inter stage measured 17.0s at 1× → 12.9s at 4×, local[32]); the
    # extra width also shrinks the hinted SHJ's per-partition build.
    p = 4 * int(banded.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    banded = banded.repartition(p, *keys)
    w = Window.partitionBy(*keys)
    return (
        banded.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= cap)
        .drop("_bn")
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing any band bucket.

    Scale design: the self-join is on (band_id, band_hash) — uniformly
    distributed 64-bit buckets, so the shuffle partitions evenly; moderately
    hot buckets are AQE skew-join's job, and pathologically hot buckets
    (boilerplate corpora) are cut by ``max_bucket_size`` (see
    _drop_hot_buckets — their members are exact-dedup's findings, not
    candidate-join work). Output is (id_a < id_b) candidate pairs with the
    estimated Jaccard from full-signature agreement.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    mh_cols = [f"mh_{i}" for i in range(num_hashes)]
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.array(*[F.col(c) for c in mh_cols]).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_id", "band.band_hash")
    banded = _drop_hot_buckets(banded, ["band_id", "band_hash"], max_bucket_size)
    # symmetric ALIAS self-join with an explicit SHUFFLE_HASH hint: both
    # sides are the identical subplan (same scan, projections, exchange),
    # and a shuffled-hash join lets Spark's exchange reuse evaluate the
    # signature pipeline ONCE. Left to the planner, the size estimate
    # lands under the broadcast threshold and it picks BroadcastHashJoin —
    # which has no exchange to reuse, so the whole signature subtree runs
    # twice and the banded frame is broadcast besides (measured on every
    # candidate generator's plan in round 6). The forced SHJ's per-partition
    # build is banded_rows/p slim rows (p = the explicit repartition width
    # in _drop_hot_buckets, i.e. the session's shuffle parallelism) — size
    # shuffle.partitions to the corpus as usual and the build stays
    # hash-table-sized; the hot-bucket cap separately bounds any one key.
    a, b = banded.alias("a"), banded.alias("b").hint("shuffle_hash")
    pairs = (
        a.join(b, on=["band_id", "band_hash"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda x: x == 1,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (agree / F.lit(len(mh_cols))).alias("est_jaccard"),
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: explode tokens, hash, per-bit majority
    vote via 64 conditional sums (one hash-aggregate; no UDF)."""
    src = _ensure_parallel(df.select(F.col(id_col), F.col(text_col)))
    tok = src.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # skip the sign bit to stay in positive int64
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(63):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    band_bits: int = 16,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Near-dup candidates: documents sharing any of the 64/band_bits simhash
    bands (Hamming-distance blocking), with exact Hamming distance attached
    via bit_count(xor). Pathologically hot bands are cut by
    ``max_bucket_size`` (see _drop_hot_buckets)."""
    sh = simhash(df, id_col, text_col)
    n_bands = 63 // band_bits
    banded = sh.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(
                            F.col("simhash"), b * band_bits
                        ).bitwiseAND(F.lit((1 << band_bits) - 1)).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_id", "band.band_val")
    banded = _drop_hot_buckets(banded, ["band_id", "band_val"], max_bucket_size)
    # hinted shuffled-hash self-join → exchange reuse (see minhash_candidates)
    a, b = banded.alias("a"), banded.alias("b").hint("shuffle_hash")
    return (
        a.join(b, on=["band_id", "band_val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .repartition(_pair_agg_width(sh), "id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 10000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above a threshold.

    Classic explode→join-on-shingle→count plan: |A∩B| from the join,
    |A∪B| = |A|+|B|−|A∩B|. Scale guard: shingles occurring in more than
    ``max_shingle_freq`` docs are dropped before the self-join (they
    contribute candidates quadratically but little Jaccard mass) — the
    standard hot-token cap; set None to disable. Per-doc sizes are counted
    AFTER the hot-shingle drop so intersection and union use the same
    filtered shingle universe (Jaccard stays exact over that universe —
    counting sizes pre-filter would systematically underestimate).

    The join/aggregate key is ``xxhash64`` of the shingle, not the string
    (guide §2.3 narrower types): the self-join's exchange, sort and merge
    compare 8-byte longs instead of ~25-byte strings, and only set
    EQUALITY matters downstream, never the text. Distinct-shingle counts
    are identical up to 64-bit collisions (expected colliding shingle
    pairs ≈ D²/2^65 — ~1e-9 at a million distinct shingles; at 10^10+
    distinct shingles swap in a 128-bit hash).
    """
    src = _ensure_parallel(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    sh = shingle_rows(src, "id", text_col, n).select("id", F.xxhash64("s").alias("s"))
    # same inline-window cap as the LSH banders (rides the self-join's shuffle)
    sh = _drop_hot_buckets(sh, ["s"], max_shingle_freq)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # hinted shuffled-hash self-join → exchange reuse (see minhash_candidates);
    # the tiny per-doc size table broadcasts onto the pair frame explicitly
    # (it is an aggregate whose estimate can exceed the auto threshold)
    a, b = sh.alias("a"), sh.alias("b").hint("shuffle_hash")
    inter = (
        a.join(b, on="s")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(_pair_agg_width(sh), "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        inter.join(F.broadcast(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"})), on="id_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"})), on="id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 10000,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment(A in B) = |A∩B| / |A|.
    Catches subset duplicates symmetric Jaccard misses — a paragraph quoted
    inside a much longer page scores near-zero Jaccard but containment ≈ 1,
    the case web-corpus dedup handles with containment, not similarity.

    Output is directional: (id_small, id_big, containment) where the
    SMALLER shingle set is the contained side (ties by id). Same plan
    skeleton as ngram_jaccard_pairs — one shingle self-join with the
    hot-shingle cap, sizes counted over the same filtered universe — so it
    inherits the capped-join scale shape (including the hashed 8-byte join
    key — see ngram_jaccard_pairs)."""
    src = _ensure_parallel(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    sh = shingle_rows(src, "id", text_col, n).select("id", F.xxhash64("s").alias("s"))
    sh = _drop_hot_buckets(sh, ["s"], max_shingle_freq)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # hinted shuffled-hash self-join + broadcast size joins (see
    # ngram_jaccard_pairs for both rationales)
    a, b = sh.alias("a"), sh.alias("b").hint("shuffle_hash")
    inter = (
        a.join(b, on="s")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(_pair_agg_width(sh), "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    paired = (
        inter.join(F.broadcast(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"})), on="id_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"})), on="id_b")
    )
    small_is_a = (F.col("sz_a") < F.col("sz_b")) | (
        (F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        paired.select(
            F.when(small_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias("id_small"),
            F.when(small_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias("id_big"),
            (
                F.col("common") / F.least(F.col("sz_a"), F.col("sz_b"))
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
    max_shingle_freq: int | None = 10000,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing ≥
    ``min_overlap`` token ``n``-grams with any benchmark/eval document —
    the standard test-set-leakage screen (GPT-3 appendix C / PaLM use
    8-13-gram overlap; default n=8). Returns one row per contaminated
    (corpus doc, benchmark doc) pair: (doc_id, bench_id, n_shared,
    contamination = n_shared / corpus-doc shingle count).

    Scale shape — the asymmetric sibling of ngram_jaccard_pairs' self-join:
    shingles explode on BOTH sides, the (usually tiny) benchmark side joins
    the corpus side on the shingle. The benchmark's distinct shingle set is
    the natural broadcast side at real scale (thousands of eval docs vs
    10^10 corpus docs), and ``broadcast_bench=True`` HINTS it explicitly —
    relying on AQE alone sort-merges (shuffling the full corpus shingle
    explosion) whenever runtime stats are missing or the exploded benchmark
    exceeds the adaptive threshold. Set it False only when the "benchmark"
    side is itself corpus-sized. The hot-shingle cap drops boilerplate
    grams that contribute candidates quadratically but no leakage signal.
    Drop flagged ids with a left_anti join on doc_id."""
    bid = bench_id_col or id_col
    btx = bench_text_col or text_col
    src = _ensure_parallel(corpus.select(F.col(id_col).alias("id"), F.col(text_col)))
    sh = shingle_rows(src, "id", text_col, n)
    # sizes over the FULL shingle universe (pre-cap): contamination's
    # denominator is the doc's true distinct n-gram count, so dropping a
    # doc's boilerplate grams from the join can only LOWER its score —
    # the cap never inflates contamination on boilerplate-heavy docs
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sh = _drop_hot_buckets(sh, ["s"], max_shingle_freq)
    bench_sh = shingle_rows(
        benchmark.select(F.col(bid).alias("bench_id"), F.col(btx)), "bench_id", btx, n
    )
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        sh.join(bench_sh, on="s")
        .groupBy("id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return (
        hits.join(sizes, on="id")
        .select(
            F.col("id").alias("doc_id"),
            "bench_id",
            "n_shared",
            (F.col("n_shared") / F.col("sz")).alias("contamination"),
        )
    )


def winnow_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 7,
    w: int = 4,
    min_shared: int = 3,
    max_fp_freq: int | None = 100_000,
) -> DataFrame:
    """Near-dup candidate pairs via winnowing fingerprints (rolling-hash
    k-grams, window minima — text.winnow_fingerprints): pairs sharing at
    least ``min_shared`` fingerprints, with the shared count attached.

    Same scale shape as the shingle join: explode → self-join on the
    fingerprint (uniform 64-bit values partition evenly), hot fingerprints
    capped like hot shingles, alias self-join for exchange reuse. Robust to
    local edits where exact/whole-doc fingerprints break. Uses the staged
    DataFrame fingerprint form — the single-expression form re-evaluates
    across lambda boundaries (see text.with_winnow_fingerprints)."""
    from unify_spark.functions.text import with_winnow_fingerprints

    fps = with_winnow_fingerprints(
        _ensure_parallel(df.select(F.col(id_col).alias("id"), F.col(text_col))),
        text_col,
        "_fps",
        k,
        w,
    )
    fp = fps.select("id", F.explode("_fps").alias("f")).distinct()
    fp = _drop_hot_buckets(fp, ["f"], max_fp_freq)
    # hinted shuffled-hash self-join → exchange reuse: without it the
    # planner broadcasts one side and the winnowing mapInPandas pass runs
    # TWICE (see minhash_candidates)
    a, b = fp.alias("a"), fp.alias("b").hint("shuffle_hash")
    return (
        a.join(b, on="f")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(_pair_agg_width(fp), "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
