"""Metric-history anomaly detection across a chain of validation runs.

The single-baseline drift check (``validate --baseline``) answers "did the
distribution move since THAT run"; this module answers the ops question
"is today's run out of line with the trailing runs" — the Deequ
MetricsRepository + anomaly-strategy analogue over the profile sidecars
every ``validate --profile`` / ``profile`` run already persists.

Robust-statistics choice: median ± k·MAD (scaled by 1.4826 to estimate
sigma under normality) over the trailing window, NOT mean ± k·stddev — a
single bad historical run would inflate a stddev envelope and mask the
next regression, while the median/MAD envelope tolerates up to half the
history being corrupt. When the history is bit-stable (MAD == 0, the
common case for row counts and null rates on a healthy pipeline), the
check degrades to an exact-change test with a relative tolerance.

Everything is driver-side: profile rows are metadata-scale
(tables × columns × stats), read with one column-pruned parquet scan per
run dir.
"""

from __future__ import annotations

import os
from statistics import median

from pyspark.sql import SparkSession

DEFAULT_STATS = ("rows", "null_rate", "approx_distinct", "min", "max")


def _load_global_stats(
    spark: SparkSession, out_dir: str, stats: tuple[str, ...]
) -> dict[tuple[str, str, str], float]:
    """{(table, column, stat): value} from one run's profile sidecar,
    global rows only (part='*')."""
    path = os.path.join(out_dir, "profile")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no profile sidecar under {out_dir} — run `validate --profile` "
            "(or the profile command) so the run records metrics"
        )
    rows = (
        spark.read.parquet(path)
        .where("part = '*'")
        .select("table", "column", "stat", "value")
        .collect()
    )
    out: dict[tuple[str, str, str], float] = {}
    for r in rows:
        if r["stat"] not in stats or r["value"] is None:
            continue
        try:
            out[(r["table"], r["column"], r["stat"])] = float(r["value"])
        except ValueError:
            continue  # sketch arrays and other non-scalar stats
    return out


def history_anomalies(
    spark: SparkSession,
    run_dirs: list[str],
    k: float = 4.0,
    min_history: int = 3,
    rel_tol: float = 1e-9,
    stats: tuple[str, ...] = DEFAULT_STATS,
) -> list[dict]:
    """Score the LAST run in ``run_dirs`` against the trailing history
    (all earlier dirs, oldest first). Returns one record per anomalous
    (table, column, stat): observed value, the history's median and MAD,
    and the robust z-score. Metrics with fewer than ``min_history`` prior
    observations are skipped (no basis), as are metrics absent from the
    current run (a disappeared column is schema drift — `schema-diff`'s
    job, not a numeric envelope's)."""
    if len(run_dirs) < 2:
        raise ValueError("need at least one history run and one current run")
    history = [_load_global_stats(spark, d, stats) for d in run_dirs[:-1]]
    current = _load_global_stats(spark, run_dirs[-1], stats)

    anomalies: list[dict] = []
    for key, cur in sorted(current.items()):
        prior = [h[key] for h in history if key in h]
        if len(prior) < min_history:
            continue
        med = median(prior)
        mad = median(abs(x - med) for x in prior)
        rec = {
            "table": key[0],
            "column": key[1],
            "stat": key[2],
            "value": cur,
            "median": med,
            "mad": mad,
            "history_n": len(prior),
        }
        if mad == 0.0:
            # bit-stable history: any change beyond relative tolerance is
            # an exact-change anomaly (z undefined — reported as None)
            if abs(cur - med) > max(rel_tol, rel_tol * abs(med)):
                rec["z"] = None
                anomalies.append(rec)
            continue
        z = abs(cur - med) / (1.4826 * mad)
        if z > k:
            rec["z"] = round(z, 3)
            anomalies.append(rec)
    return anomalies
