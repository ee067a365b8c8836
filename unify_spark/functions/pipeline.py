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


@dataclass
class CleanReport:
    """Driver-side counters (each one aggregate over a lazy plan)."""

    n_input: int
    n_after_quality: int
    n_kept: int

    @property
    def removed_quality(self) -> int:
        return self.n_input - self.n_after_quality

    @property
    def removed_duplicates(self) -> int:
        return self.n_after_quality - self.n_kept


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    max_tok_rep_ratio: float | None = None,
    min_est_jaccard: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    max_iter: int = 50,
) -> tuple[DataFrame, CleanReport]:
    """Quality-gate, dedup, and canonicalize a document corpus.

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

    Returns (kept DataFrame with a ``quality_score`` column, CleanReport).

    Job accounting: ONE aggregate job computes both input and post-gate
    counts, and the returned ``kept`` frame is persisted before the final
    count — so the dedup pipeline (minhash + connected components) runs
    exactly once whether or not the caller writes the result afterwards.
    The caller owns ``kept.unpersist()`` once done with the frame.
    """
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
    return kept, CleanReport(n_input, n_quality, kept.count())
