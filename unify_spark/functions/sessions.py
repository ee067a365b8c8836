"""Gap-based event sessionization — the standard events→sessions rollup
(user behavior sequences, dialog turns, listening sessions) a training-data
pipeline derives before packing interaction data.

Built on ``F.session_window``: Spark's native session state machine, so the
SAME expression runs on a batch frame and on ``readStream`` (add a
watermark and late events merge into the correct session instead of
fragmenting it). The aggregation is a hash shuffle on (key, merged
window) with map-side partials — no UDF, no per-key driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    agg_exprs: list[Column] | None = None,
) -> DataFrame:
    """One row per (key, session): events closer than ``gap`` chain into a
    session; a quiet period longer than ``gap`` starts a new one. Emits
    (key, session_start, session_end, duration_s, n_events) plus any
    ``agg_exprs`` verbatim.

    Streaming: apply ``df.withWatermark(ts_col, ...)`` first and the same
    call runs under Structured Streaming (update/append modes), with
    session merging handled by the engine's state store.

    Skew: one key's events must meet in one task (session merging is a
    per-key total order — salting would split sessions at salt boundaries).
    Human-scale keys are naturally bounded; for degenerate hot keys (bots,
    a null-user bucket) pre-filter or pre-thin with ``hash_keep`` on the
    event id before sessionizing — the same escape as the quota sampler."""
    aggs = [F.count(F.lit(1)).alias("n_events")] + list(agg_exprs or [])
    sw = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(F.col(key_col), sw.alias("sw")).agg(*aggs)
    return out.select(
        key_col,
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        (F.unix_timestamp("sw.end") - F.unix_timestamp("sw.start")).alias("duration_s"),
        *[c for c in out.columns if c not in (key_col, "sw")],
    )
