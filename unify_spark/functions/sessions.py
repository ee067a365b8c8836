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
    max_events_per_key: int | None = None,
    key_counts: dict[str, int] | None = None,
    event_id_col: str | None = None,
    salt: str = "",
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
    Human-scale keys are naturally bounded; degenerate hot keys (bots, a
    null-user sentinel) get the quota sampler's two-phase escape: pass
    ``max_events_per_key`` plus ``key_counts`` ({key value: approximate
    event count}, e.g. from a profile/HLL pass) and ``event_id_col``, and
    keys whose count exceeds the cap are PRE-THINNED with the deterministic
    ``hash_keep`` predicate on the event id at rate cap/count BEFORE the
    session shuffle — a pure Column filter, so a 10^9-event bot key ships
    ~cap rows to its task instead of 10^9. Caveat (documented, inherent):
    thinning drops events, so a thinned key's session BOUNDARIES are
    approximate — a dropped event that bridged two quiet periods splits the
    session. Normal keys (count <= cap) pass through bit-identically.
    NULL event ids survive the thin (kept, like the quota sampler)."""
    if max_events_per_key is not None and key_counts:
        from unify_spark.functions.sampling import _per_stratum_keep

        rates = {
            value: min(1.0, max_events_per_key / count)
            for value, count in key_counts.items()
            if count > max_events_per_key
        }
        if rates:
            if event_id_col is None:
                raise ValueError(
                    "max_events_per_key pre-thinning needs event_id_col (the "
                    "deterministic hash domain)"
                )
            keep = _per_stratum_keep(event_id_col, key_col, rates, 1.0, salt)
            df = df.where(F.coalesce(keep, F.lit(True)))
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
