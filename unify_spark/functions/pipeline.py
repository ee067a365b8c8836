"""End-to-end corpus cleaning: the composed training-data pipeline.

One call chains the individual operators the way a production text-corpus
pipeline does: quality gate → exact dedup → near-dup clustering → canonical
selection. Every stage is one of this package's primitives (quality_features,
exact dedup via fingerprint clusters, minhash-LSH candidates → connected
components, keep-best-per-cluster), so the composition inherits their scale
shapes: no stage collects rows, the heaviest shuffles are key-only, and the
candidate joins carry the hot-bucket caps.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from unify_spark.functions import text as text_fns
from unify_spark.functions.graph import canonical_docs, duplicate_clusters


def _keep_one_per_key(df: DataFrame, keys: list, order_cols: list) -> DataFrame:
    """Deterministically keep ONE row per key: row_number over the keys
    ordered by content-derived columns. NOT ``dropDuplicates`` — that
    keeps whichever twin's partition happens to arrive first, so
    duplicate-id rows with different payloads would resolve differently
    across runs, breaking the pipeline's determinism contract. The
    ``order_cols`` must be derived from row CONTENT (digests, sidecar
    values), never from partition or arrival order."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("_keep_rn", F.row_number().over(w))
        .filter(F.col("_keep_rn") == 1)
        .drop("_keep_rn")
    )


@dataclass
class CleanReport:
    """Driver-side counters (each one aggregate over a lazy plan)."""

    n_input: int
    n_after_quality: int
    n_kept: int
    n_decontaminated: int = 0

    @property
    def removed_quality(self) -> int:
        return self.n_input - self.n_after_quality

    @property
    def removed_duplicates(self) -> int:
        return self.n_after_quality - self.n_decontaminated - self.n_kept


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    max_tok_rep_ratio: float | None = None,
    boilerplate_min_df: int | None = None,
    min_est_jaccard: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    max_iter: int = 50,
    benchmark: DataFrame | None = None,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    decontaminate_n: int = 8,
    decontaminate_min_overlap: int = 1,
) -> tuple[DataFrame, CleanReport]:
    """Quality-gate, dedup, and canonicalize a document corpus.

    0. (optional, ``boilerplate_min_df``) line-level boilerplate removal —
       lines in >= N distinct docs stripped from every doc BEFORE anything
       scores it (the C4 ordering: boilerplate otherwise inflates token
       counts past the quality floor and pollutes the shingle space);
    1. quality gate: token floor + punctuation-ratio cap + optional
       Gopher-style repeated-token-fraction cap (``max_tok_rep_ratio`` —
       boilerplate/keyword-stuffing screen; pure Column expressions, fold
       into the scan);
    2. near-duplicate clustering: minhash-LSH candidates filtered by
       estimated Jaccard → connected components (exact duplicates land in
       the same cluster automatically — identical docs agree on every
       signature band); ``max_iter`` bounds the CC rounds;
    3. canonical selection: keep ONE doc per cluster, preferring the
       highest quality score (token count here), ties by id.

    With ``benchmark`` set, a decontamination stage runs between the gate
    and the dedup clustering: docs sharing >= ``decontaminate_min_overlap``
    token ``decontaminate_n``-grams with any benchmark row (``decontaminate``
    — the GPT-3/PaLM test-set-leakage screen, broadcast benchmark side)
    are dropped with a left_anti join BEFORE clustering, so a leaked doc
    can never become a cluster's canonical survivor.

    Returns (kept DataFrame with a ``quality_score`` column, CleanReport).

    Job accounting: ONE aggregate job computes both input and post-gate
    counts, and the returned ``kept`` frame is persisted before the final
    count — so the dedup pipeline (minhash + connected components) runs
    exactly once whether or not the caller writes the result afterwards.
    The caller owns ``kept.unpersist()`` once done with the frame.
    """
    if boilerplate_min_df is not None:
        cleaned = text_fns.remove_boilerplate_lines(
            df, id_col, text_col, min_doc_freq=boilerplate_min_df
        ).select(id_col, text_col)
        # one cleaned row per id: duplicate-id input (the state the
        # uniqueness constraint reports) must not multiply rows through
        # the join — same guard as the audio sibling's sidecar join.
        cleaned = _keep_one_per_key(
            cleaned, [id_col], [F.md5(F.coalesce(F.col(text_col), F.lit("")))]
        )
        df = df.drop(text_col).join(cleaned, on=id_col, how="inner")
    feats = text_fns.quality_features(text_col)
    scored = df.withColumn("_n_tokens", feats["n_tokens"]).withColumn(
        "_punct", feats["punct_ratio"]
    )
    good_cond = (
        F.col(text_col).isNotNull()
        & (F.col("_n_tokens") >= min_tokens)
        & (F.col("_punct") <= max_punct_ratio)
    )
    if max_tok_rep_ratio is not None:
        scored = scored.withColumn("_tok_rep", feats["token_repetition_ratio"])
        good_cond = good_cond & (F.col("_tok_rep") <= max_tok_rep_ratio)
    # one scan for both counters (was two separate jobs)
    counts = scored.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(good_cond.cast("long")).alias("n_quality"),
    ).first()
    n_input, n_quality = counts["n_input"], int(counts["n_quality"] or 0)

    good = scored.filter(good_cond)
    n_decon = 0
    if benchmark is not None:
        from unify_spark.functions.dedup import decontaminate

        flagged = (
            decontaminate(
                good, benchmark, id_col, text_col,
                bench_id_col=bench_id_col, bench_text_col=bench_text_col,
                n=decontaminate_n, min_overlap=decontaminate_min_overlap,
            )
            .select(F.col("doc_id").alias(id_col))
            .distinct()
            .persist()  # metadata-scale: flagged ids only, used twice
        )
        n_decon = flagged.count()
        good = good.join(flagged, on=id_col, how="left_anti")
    clusters = duplicate_clusters(
        good,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        min_est_jaccard=min_est_jaccard,
        max_iter=max_iter,
    )
    kept = canonical_docs(
        good.withColumn("quality_score", F.col("_n_tokens").cast("double")),
        clusters,
        id_col=id_col,
        prefer="quality_score",
    ).drop("_n_tokens", "_punct", "_tok_rep", "cluster")

    # persist BEFORE the count: the report counter and the caller's
    # write/collect share one computation of the whole dedup pipeline
    kept = kept.persist()
    n_kept = kept.count()
    if benchmark is not None:
        flagged.unpersist()  # kept is materialized; the flag cache can go
    return kept, CleanReport(n_input, n_quality, n_kept, n_decon)


def clean_audio_corpus(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    max_silence_ratio: float = 0.95,
    max_clipping_ratio: float = 0.2,
    min_speech_ms: int = 0,
    threshold_dbfs: float = -40.0,
    near_dup_min_shared: int | None = None,
) -> tuple[DataFrame, CleanReport]:
    """The audio sibling of ``clean_corpus``: gate a clips table on
    decodability and signal quality, then drop exact-duplicate payloads —
    the standard screen before a speech corpus feeds training.

    1. **decode + quality gate** — one Arrow decode pass
       (``audio_sidecars``: features AND activity segments from the same
       decoded matrices) rejects undecodable rows (non-empty ``reason``),
       dead air (``silence_ratio > max_silence_ratio``), clipped
       recordings (``clipping_ratio > max_clipping_ratio``), and clips
       with under ``min_speech_ms`` of detected speech;
    2. **exact payload dedup** — md5 of the raw bytes, keep the
       smallest-id row per digest (the bytes never shuffle: the digest
       does, 16 bytes per clip, same two-phase shape as text dedup).

    Returns (kept DataFrame with the quality columns attached, CleanReport
    with the same counter semantics as the text pipeline). With
    ``near_dup_min_shared`` set, a third stage collapses acoustic
    near-duplicates (the SAME recording under a different codec or gain —
    ``audio_dup_clusters``' Haitsma–Kalker fingerprints → connected
    components) keeping the smallest id per cluster; embedding-space
    near-dups (``embedding_dup_clusters`` over acoustic embeddings)
    compose behind this gate the same way.

    Duplicate-id input (the state the uniqueness constraint reports): the
    quality join uses one sidecar row per id, so row counts never inflate;
    exact dedup keys on (id, payload digest), so an id's exact copies
    collapse to one row and distinct-payload twins survive to be flagged
    upstream. Twin resolution is CONTENT-deterministic, not
    arbitrary-row-deterministic: when twins share an id with DIFFERENT
    payloads, the surviving sidecar row is the one with the smallest
    feature tuple (row_number ordered by the feature values — identical
    across runs and partitionings, unlike dropDuplicates' first-seen
    row)."""
    from pyspark.sql import Window

    from unify_spark.functions.multimodal import audio_sidecars

    side_raw = audio_sidecars(
        df, id_col=id_col, bytes_col=bytes_col, codec_col=codec_col,
        sr_col=sr_col, threshold_dbfs=threshold_dbfs,
    ).select(
        id_col, "rms_db", "clipping_ratio", "silence_ratio", "speech_ms", "reason"
    )
    sidecars = _keep_one_per_key(
        side_raw,
        [id_col],
        ["reason", "rms_db", "clipping_ratio", "silence_ratio", "speech_ms"],
    ).persist()
    # persisted: metadata-sized, and BOTH the counter aggregate and the
    # kept-branch (plus the winners sub-branch) re-derive it — without the
    # cache each action re-runs the dominant PCM decode
    scored = df.join(sidecars, on=id_col, how="inner")
    good_cond = (
        (F.col("reason") == "")
        & (F.col("silence_ratio") <= max_silence_ratio)
        & (F.col("clipping_ratio") <= max_clipping_ratio)
        & (F.col("speech_ms") >= min_speech_ms)
    )
    counts = scored.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(good_cond.cast("long")).alias("n_quality"),
    ).first()
    n_input, n_quality = counts["n_input"], int(counts["n_quality"] or 0)

    good = scored.filter(good_cond).withColumn("_digest", F.md5(F.col(bytes_col)))
    # two-phase exact dedup: only (id, 16-byte digest) flows through the
    # window (slim.distinct collapses exact-copy rows); winners join back on
    # (id, digest) — AQE broadcasts the slim winner set, so payload bytes
    # stay put (the canonical_docs slim-projection shape)
    slim = good.select(F.col(id_col), F.col("_digest")).distinct()
    w = Window.partitionBy("_digest").orderBy(id_col)
    winners = (
        slim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    kept = good.join(winners, on=[id_col, "_digest"], how="left_semi")
    # exact-copy rows: ONE survivor, picked content-deterministically —
    # same (id, digest) rows can still differ in sidecar metadata columns
    # (e.g. transcript), and dropDuplicates would pick whichever partition
    # arrived first
    other = [c for c in kept.columns if c not in (id_col, "_digest", bytes_col)]
    wk = Window.partitionBy(id_col, "_digest").orderBy(
        F.xxhash64(*other) if other else F.lit(1)
    )
    kept = (
        kept.withColumn("_copy_rn", F.row_number().over(wk))
        .filter(F.col("_copy_rn") == 1)
        .drop("_copy_rn", "_digest")
    )
    if near_dup_min_shared is not None:
        from unify_spark.functions.audio_dedup import audio_dup_clusters

        clusters = audio_dup_clusters(
            kept, id_col=id_col, bytes_col=bytes_col, codec_col=codec_col,
            sr_col=sr_col, min_shared=near_dup_min_shared,
        )
        canon = (
            clusters.groupBy("cluster")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        kept = kept.join(canon, on=id_col, how="left_semi")
    kept = kept.persist()
    n_kept = kept.count()
    sidecars.unpersist()  # kept is materialized; the decode cache can go
    return kept, CleanReport(n_input, n_quality, n_kept)
