"""Mergeable t-digest quantile sketch (north_star: "dur_ms/sr_hz quantiles
via t-digest sketches").

Spark's built-in ``percentile_approx`` (Greenwald-Khanna-family) already
satisfies space-bounded quantiles and is what ``profile_table`` uses for
pass/fail-adjacent stats (deterministic across runs — SURVEY §7.4). This
module adds a true t-digest for the metrics sidecar: per-partition digests
built vectorized inside ``applyInPandas``/``mapInPandas`` (bounded state,
one pass), merged associatively — the same partial/merge shape Spark uses
for its own sketches, so it scales to 10^12 rows with (n_partitions ×
compression) total state.

Pure-numpy implementation of the Dunning t-digest clustering (public
algorithm: sorted values → cumulative quantiles → centroid capacity from the
scale function k1; merge = re-cluster of concatenated centroids). No
external libraries.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_SKETCH_SCHEMA = "part string, means array<double>, weights array<double>, lo double, hi double"


@dataclass
class TDigest:
    means: np.ndarray
    weights: np.ndarray
    lo: float
    hi: float

    @property
    def total(self) -> float:
        return float(self.weights.sum())


def _compress(means: np.ndarray, weights: np.ndarray, compression: int) -> tuple[np.ndarray, np.ndarray]:
    """Cluster sorted (mean, weight) pairs under the k1 scale function."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if total == 0:
        return means[:0], weights[:0]
    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    q0 = 0.0

    def k(q: float) -> float:
        q = min(max(q, 1e-12), 1 - 1e-12)
        return compression * (math.asin(2 * q - 1) / math.pi + 0.5)

    k_limit = k(q0) + 1.0
    for m, w in zip(means[1:], weights[1:]):
        q = (q0 + cur_w + w) / total
        if k(q) <= k_limit:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w
            k_limit = k(q0 / total if total else 0.0) + 1.0
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def build(values: np.ndarray, compression: int = 100) -> TDigest:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return TDigest(np.zeros(0), np.zeros(0), math.nan, math.nan)
    m, w = _compress(v, np.ones_like(v), compression)
    return TDigest(m, w, float(v.min()), float(v.max()))


def merge(digests: list[TDigest], compression: int = 100) -> TDigest:
    ds = [d for d in digests if d.means.size]
    if not ds:
        return TDigest(np.zeros(0), np.zeros(0), math.nan, math.nan)
    m = np.concatenate([d.means for d in ds])
    w = np.concatenate([d.weights for d in ds])
    mm, mw = _compress(m, w, compression)
    return TDigest(mm, mw, min(d.lo for d in ds), max(d.hi for d in ds))


def quantile(d: TDigest, q: float) -> float:
    """Interpolated quantile from centroids (midpoint rule)."""
    if d.means.size == 0:
        return math.nan
    if d.means.size == 1:
        return float(d.means[0])
    total = d.total
    target = q * total
    cum = np.cumsum(d.weights) - d.weights / 2.0
    if target <= cum[0]:
        return d.lo + (target / cum[0]) * (d.means[0] - d.lo) if cum[0] > 0 else d.lo
    if target >= cum[-1]:
        span = total - cum[-1]
        return d.means[-1] + ((target - cum[-1]) / span) * (d.hi - d.means[-1]) if span > 0 else d.hi
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(d.means[i] + frac * (d.means[i + 1] - d.means[i]))


def sketch_column(
    df: DataFrame,
    column: str,
    part_col: str | None = None,
    compression: int = 100,
) -> dict[str, TDigest]:
    """Distributed build: one t-digest per Spark input partition (bounded
    state, built vectorized in Arrow batches), merged per table-partition
    and globally ('*') on the driver. Returns {part: TDigest}."""
    part_expr = (
        F.col(part_col).cast("string") if part_col else F.lit("*")
    ).alias("part")
    slim = df.select(part_expr, F.col(column).cast("double").alias("v")).where(
        F.col(column).isNotNull()
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, list[np.ndarray]] = {}
        for pdf in batches:
            for part, g in pdf.groupby("part"):
                acc.setdefault(str(part), []).append(g["v"].to_numpy())
        if not acc:
            # an empty input partition must yield NOTHING: an empty dict-built
            # DataFrame defaults every column to float64 and pyarrow cannot
            # convert an empty float64 column to the array<double> schema
            # slots (ArrowNotImplementedError at collect time)
            return
        rows = {"part": [], "means": [], "weights": [], "lo": [], "hi": []}
        for part, chunks in acc.items():
            d = build(np.concatenate(chunks), compression)
            rows["part"].append(part)
            rows["means"].append(d.means.tolist())
            rows["weights"].append(d.weights.tolist())
            rows["lo"].append(d.lo)
            rows["hi"].append(d.hi)
        yield pd.DataFrame(rows)

    partials = slim.mapInPandas(partial, schema=_SKETCH_SCHEMA).collect()
    by_part: dict[str, list[TDigest]] = {}
    for r in partials:
        by_part.setdefault(r["part"], []).append(
            TDigest(np.array(r["means"]), np.array(r["weights"]), r["lo"], r["hi"])
        )
    out = {p: merge(ds, compression) for p, ds in by_part.items()}
    out["*"] = merge(list(out.values()), compression)
    return out


TDIGEST_ROW_SCHEMA = (
    "table string, part string, column string, "
    "means array<double>, weights array<double>, lo double, hi double"
)


def sketch_rows(
    df: DataFrame,
    column: str,
    table: str,
    part_col: str | None = None,
    compression: int = 100,
) -> DataFrame:
    """Persistable t-digest sidecar rows: one merged digest per table
    partition (plus the global '*'), in the same incremental shape as the
    HLL sketch sidecar (profile.hll_sketches) — append a new partition's
    digest row and any later quantile question over any partition subset
    merges stored centroids (merge is associative) instead of re-scanning.
    State per row is ≤ ~compression centroids; driver assembly is
    metadata-sized."""
    digests = sketch_column(df, column, part_col=part_col, compression=compression)
    spark = df.sparkSession
    rows = [
        (table, p, column, d.means.tolist(), d.weights.tolist(), d.lo, d.hi)
        for p, d in sorted(digests.items())
    ]
    return spark.createDataFrame(rows, TDIGEST_ROW_SCHEMA)


def quantile_from_rows(
    sketches: DataFrame,
    qs: list[float],
    table: str | None = None,
    column: str | None = None,
    parts: list[str] | None = None,
    compression: int = 100,
) -> dict[tuple[str, str], list[float]]:
    """Merge persisted digest rows (optionally filtered to a table, column,
    or partition subset — '*' rows are excluded when selecting subsets so
    nothing double-counts) and evaluate quantiles. Returns
    {(table, column): [q...]} — a driver-side dict; the sketch table is
    metadata-sized by construction."""
    df = sketches
    if table:
        df = df.filter(F.col("table") == table)
    if column:
        df = df.filter(F.col("column") == column)
    if parts is not None:
        df = df.filter(F.col("part").isin(parts))
    else:
        df = df.filter(F.col("part") != "*")
    out: dict[tuple[str, str], list[TDigest]] = {}
    for r in df.collect():
        out.setdefault((r["table"], r["column"]), []).append(
            TDigest(np.array(r["means"]), np.array(r["weights"]), r["lo"], r["hi"])
        )
    return {
        k: [quantile(merge(ds, compression), q) for q in qs] for k, ds in out.items()
    }
