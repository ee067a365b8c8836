"""Distribution-drift constraint: KS + PSI of a numeric column across
partitions (BASELINE.json north_rule "KS/PSI distribution-drift tests across
partitions").

Scale design (SURVEY §4.3): Spark has no built-in two-sample tests, but the
sufficient statistic is a tiny histogram. One ``groupBy(part, bucket).count``
shuffle produces (n_parts × n_bins) rows regardless of input size — THAT is
collected (a few KB at any scale) and the KS statistic / PSI are computed
vectorized in numpy on the driver. No raw rows ever leave the executors.

Each partition is compared against the pooled rest-of-table distribution;
a partition fails if PSI > psi_threshold or KS > ks_threshold. Violations are
partition-grain (key = partition value), mirroring the reference's per-kind
query validations with allowed-set results
(src/com/vendekagonlabs/unify/validation/post_import/query.clj:151-186).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from unify_spark.operators.base import Constraint, ValidationContext, make_violations


def _psi(p: np.ndarray, q: np.ndarray) -> float:
    """PSI with Laplace (add-1) smoothing — raw epsilon smoothing makes
    empty tail bins dominate at small partition sizes."""
    p = p + 1.0
    q = q + 1.0
    p = p / p.sum()
    q = q / q.sum()
    return float(np.sum((p - q) * np.log(p / q)))


def _ks(p: np.ndarray, q: np.ndarray) -> float:
    cp = np.cumsum(p) / max(p.sum(), 1)
    cq = np.cumsum(q) / max(q.sum(), 1)
    return float(np.max(np.abs(cp - cq)))


def _ks_critical(n1: float, n2: float, c_alpha: float = 2.0) -> float:
    """Two-sample KS critical value scaled by sample sizes (c=2.0 ≈ α 1e-4),
    so the drift verdict is stable from 10^3-row test partitions up to
    10^9-row production partitions."""
    if n1 <= 0 or n2 <= 0:
        return float("inf")
    return c_alpha * float(np.sqrt((n1 + n2) / (n1 * n2)))


class DriftConstraint(Constraint):
    partition_grain = True

    def __init__(
        self,
        table: str,
        column: str,
        n_bins: int = 20,
        psi_threshold: float = 0.25,
        ks_threshold: float = 0.15,
    ):
        self.table = table
        self.column = column
        self.n_bins = n_bins
        self.psi_threshold = psi_threshold
        self.ks_threshold = ks_threshold
        self.name = f"drift:{table}.{column}"

    def histogram(self, df: DataFrame, part_col: str) -> DataFrame:
        """(part, bucket, n) — the one distributed aggregation."""
        c = F.col(self.column).cast("double")
        stats = df.select(
            F.min(c).alias("lo"), F.max(c).alias("hi")
        )  # scan-level min/max; parquet footer stats make this cheap
        bounded = df.select(F.col(part_col).alias("part"), c.alias("v")).where(
            c.isNotNull()
        ).crossJoin(F.broadcast(stats))
        width = (F.col("hi") - F.col("lo")) / F.lit(self.n_bins)
        bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.floor((F.col("v") - F.col("lo")) / width), F.lit(self.n_bins - 1)
            )
        )
        return bounded.groupBy("part", bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("n")
        )

    def partition_scores(
        self, tables: dict[str, DataFrame], ctx: ValidationContext
    ) -> list[tuple[str, float, float, bool]]:
        df = tables[self.table]
        part_col = ctx.part_col
        hist = self.histogram(df, part_col).toPandas()  # n_parts × n_bins rows
        pivot = hist.pivot_table(
            index="part", columns="bucket", values="n", fill_value=0, aggfunc="sum"
        )
        # ensure all bins present
        for b in range(self.n_bins):
            if b not in pivot.columns:
                pivot[b] = 0
        pivot = pivot[sorted(pivot.columns)]
        mat = pivot.to_numpy(dtype=np.float64)
        total = mat.sum(axis=0)
        out = []
        for i, part in enumerate(pivot.index):
            rest = total - mat[i]
            psi = _psi(mat[i], rest)
            ks = _ks(mat[i], rest)
            ks_crit = max(self.ks_threshold, _ks_critical(mat[i].sum(), rest.sum()))
            failed = psi > self.psi_threshold or ks > ks_crit
            out.append((str(part), psi, ks, failed))
        return out

    def violations(self, tables: dict[str, DataFrame], ctx: ValidationContext) -> DataFrame:
        spark = tables[self.table].sparkSession
        scores = self.partition_scores(tables, ctx)
        rows = [
            (part, psi, ks) for part, psi, ks, failed in scores if failed
        ]
        vio = spark.createDataFrame(rows, "part string, psi double, ks double")
        return make_violations(
            vio,
            constraint=self.name,
            table=self.table,
            key="part",
            column=self.column,
            observed=F.concat_ws(
                ";",
                F.concat(F.lit("psi="), F.round("psi", 4).cast("string")),
                F.concat(F.lit("ks="), F.round("ks", 4).cast("string")),
            ),
            expected=f"psi<={self.psi_threshold} and ks<={self.ks_threshold}",
            part="part",
        )
