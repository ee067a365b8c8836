"""Dataset reconciliation: row-level diff of two table versions.

The migration-validation primitive: after rewriting a 10^12-row table
(engine swap, backfill, compaction, format migration) the question is
"is the new table the same data", and the only honest answer is row-level
— aggregate equality (counts, sums) can mask compensating errors.

Scale shape — two phases so the expensive work is proportional to the
DIFF, not the data:

1. **Classify** (always): each side is reduced map-side to a slim
   (key, fingerprint) projection — ``xxhash64`` over the canonicalized
   compared columns, 8 bytes per row regardless of row width — and the
   two projections full-outer-join on the key. Every key lands in exactly
   one class: ``only_left`` / ``only_right`` / ``differing`` /
   ``matching``. One shuffle per side of (key, 8-byte hash); payload
   columns (audio bytes) never move.
2. **Drill down** (``details=True``): per-column mismatch evidence is
   computed ONLY for the differing keys — both sides are semi-joined down
   to that (normally tiny) key set before the wide join, so a 10^12-row
   reconciliation with 10^3 bad rows pays the wide comparison on 10^3
   rows. Evidence rows use the canonical VIOLATION_SCHEMA, so the same
   caps/report plumbing applies.

Canonicalization (both phases use the same one, so the drill-down agrees
with the classifier): values compare as their exact SQL string form with a
NULL sentinel; floats compare bit-form by default (a migration should be
byte-faithful) or rounded to ``float_digits`` when a decode/recompute step
legitimately perturbs low bits.

Reference parity: unify's diff tooling compares import runs by entity
attribute maps (src/com/vendekagonlabs/unify/db/query.clj — pull-diff
flow); here the same question is answered set-theoretically at table
scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

_NULL_SENTINEL = "\x00null\x00"


def _canon(col: str, dtype: str, float_digits: int | None) -> Column:
    base = dtype.split("(")[0]
    c = F.col(col)
    if float_digits is not None and base in ("double", "float"):
        c = F.round(c.cast("double"), float_digits)
    return F.coalesce(c.cast("string"), F.lit(_NULL_SENTINEL))


def _fingerprint(
    df: DataFrame, key_cols: list[str], cols: list[str], float_digits: int | None
) -> DataFrame:
    dtypes = dict(df.dtypes)
    key = [F.coalesce(F.col(k).cast("string"), F.lit(_NULL_SENTINEL)).alias(f"__k_{i}")
           for i, k in enumerate(key_cols)]
    fp = F.xxhash64(*[_canon(c, dtypes[c], float_digits) for c in cols]) if cols else F.lit(0).cast("bigint")
    return df.select(*key, fp.alias("__fp"))


@dataclass
class ReconcileReport:
    """Classification counts plus (optionally) capped per-column evidence."""

    n_left: int
    n_right: int
    only_left: int
    only_right: int
    differing: int
    matching: int
    compared_columns: list[str]
    column_mismatches: dict[str, int] = field(default_factory=dict)

    @property
    def identical(self) -> bool:
        return self.only_left == self.only_right == self.differing == 0

    def summary(self) -> dict:
        return {
            "identical": self.identical,
            "n_left": self.n_left,
            "n_right": self.n_right,
            "only_left": self.only_left,
            "only_right": self.only_right,
            "differing": self.differing,
            "matching": self.matching,
            "compared_columns": self.compared_columns,
            "column_mismatches": dict(sorted(self.column_mismatches.items())),
        }


def reconcile_keys(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    float_digits: int | None = None,
) -> DataFrame:
    """Phase 1: (key..., status) for every key on either side, status in
    {only_left, only_right, differing, matching}. Slim by construction —
    safe to persist or aggregate at any scale. Duplicate keys within a side
    are collapsed by fingerprint-set semantics first (count + xor-agg of
    fingerprints), so a side with two copies of a row differs from a side
    with one — reconciliation treats the table as a multiset."""
    cols = _compare_cols(left, right, key_cols, compare_cols)

    def side(df: DataFrame) -> DataFrame:
        fp = _fingerprint(df, key_cols, cols, float_digits)
        # multiset collapse: (count, order-insensitive SUM of hashes) per
        # key — one map-side-combinable aggregation, still tiny per key.
        # Sum (not xor: two identical duplicate rows xor to 0 and {A,A}
        # would match {B,B}) over decimal(38,0): a bigint sum of 64-bit
        # hashes overflows, which throws under ANSI mode; the decimal
        # headroom (|sum| ≤ n·2^63 ≈ 10^31 at 10^12 rows) never does.
        return fp.groupBy(*[f"__k_{i}" for i in range(len(key_cols))]).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__fp").cast("decimal(38,0)")).alias("__fpsum"),
        )

    # key columns are null-sentineled strings by construction, so a plain
    # equi-join is already null-safe
    lk, rk = side(left).alias("l"), side(right).alias("r")
    joined = lk.join(rk, on=[f"__k_{i}" for i in range(len(key_cols))], how="full_outer")
    status = (
        F.when(F.col("l.__n").isNull(), F.lit("only_right"))
        .when(F.col("r.__n").isNull(), F.lit("only_left"))
        .when(
            (F.col("l.__n") == F.col("r.__n"))
            & (F.col("l.__fpsum") == F.col("r.__fpsum")),
            F.lit("matching"),
        )
        .otherwise(F.lit("differing"))
    )
    return joined.select(
        *[
            F.col(f"__k_{i}").alias(k)
            for i, k in enumerate(key_cols)
        ],
        status.alias("status"),
    )


def _compare_cols(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None,
) -> list[str]:
    if compare_cols is not None:
        missing = [c for c in compare_cols if c not in left.columns or c not in right.columns]
        if missing:
            raise ValueError(f"compare_cols absent from a side: {missing}")
        return list(compare_cols)
    shared = [c for c in left.columns if c in set(right.columns) and c not in set(key_cols)]
    if not shared:
        raise ValueError("no shared non-key columns to compare")
    return shared


def reconcile_tables(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    float_digits: int | None = None,
    details: bool = True,
    detail_cap: int = 1000,
    table: str = "table",
) -> tuple[ReconcileReport, DataFrame | None]:
    """Full reconciliation: classify every key (phase 1), then — only when
    ``details`` and some keys differ — compute per-column mismatch counts
    and up to ``detail_cap`` evidence rows (VIOLATION_SCHEMA: one row per
    (key, column) that disagrees; observed = the RIGHT/candidate value,
    expected = the LEFT/baseline value) over the differing keys only.

    Returns (report, evidence_df) — evidence is None when details are off
    or nothing differs. The classifier result is aggregated internally;
    call :func:`reconcile_keys` directly to keep the per-key frame."""
    cols = _compare_cols(left, right, key_cols, compare_cols)
    keyed = reconcile_keys(left, right, key_cols, cols, float_digits).persist()
    try:
        counts = {r["status"]: r["n"] for r in keyed.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
        report = ReconcileReport(
            n_left=left.count(),
            n_right=right.count(),
            only_left=counts.get("only_left", 0),
            only_right=counts.get("only_right", 0),
            differing=counts.get("differing", 0),
            matching=counts.get("matching", 0),
            compared_columns=cols,
        )
        evidence = None
        if details and report.differing:
            evidence, col_counts = _drill_down(
                left, right, key_cols, cols, float_digits, keyed, detail_cap, table
            )
            report.column_mismatches = col_counts
        return report, evidence
    finally:
        keyed.unpersist()


def _drill_down(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    cols: list[str],
    float_digits: int | None,
    keyed: DataFrame,
    detail_cap: int,
    table: str,
):
    """Per-column evidence over the differing keys ONLY: both sides are
    semi-joined down to the differing key set (broadcast-friendly — the
    diff is the small side by assumption; AQE picks the strategy from its
    runtime size), then compared column-by-column in one wide join. Keys
    with within-side duplicates compare positionally ambiguous rows; they
    are reported at key grain with column='*' instead of inventing a row
    pairing."""
    bad = keyed.filter(F.col("status") == "differing").select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(key_cols)]
    )
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)

    def slim(df: DataFrame, dtypes: dict) -> DataFrame:
        proj = df.select(
            *[
                F.coalesce(F.col(k).cast("string"), F.lit(_NULL_SENTINEL)).alias(f"__k_{i}")
                for i, k in enumerate(key_cols)
            ],
            *[_canon(c, dtypes[c], float_digits).alias(c) for c in cols],
        )
        return proj.join(bad, on=[f"__k_{i}" for i in range(len(key_cols))], how="leftsemi")

    kj = [f"__k_{i}" for i in range(len(key_cols))]
    l, r = slim(left, ldt).alias("l"), slim(right, rdt).alias("r")
    # within-side duplicate keys make row pairing ambiguous: split them out
    dup_keys = (
        l.groupBy(*kj).agg(F.count(F.lit(1)).alias("nl"))
        .join(r.groupBy(*kj).agg(F.count(F.lit(1)).alias("nr")), on=kj, how="full_outer")
        .filter((F.coalesce("nl", F.lit(0)) > 1) | (F.coalesce("nr", F.lit(0)) > 1))
        .select(*kj)
    ).persist()
    paired = (
        l.join(dup_keys, on=kj, how="left_anti")
        .join(r.join(dup_keys, on=kj, how="left_anti"), on=kj, how="inner")
    )
    key_expr = F.concat_ws("|", *[F.col(k) for k in kj])
    diffs = paired.select(
        key_expr.alias("key"),
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(
                            F.col(f"l.{c}") != F.col(f"r.{c}"),
                            # left is the baseline (EXPECTED), right the
                            # candidate under validation (OBSERVED)
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(f"r.{c}").alias("observed"),
                                F.col(f"l.{c}").alias("expected"),
                            ),
                        )
                        for c in cols
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("d"),
    )
    col_counts = {
        r["column"]: r["n"]
        for r in diffs.groupBy(F.col("d.column").alias("column"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    evidence = (
        diffs.select(
            F.lit(f"reconcile:{table}").alias("constraint"),
            F.lit(table).alias("table"),
            F.col("key"),
            F.col("d.column").alias("column"),
            # canonicalization's NULL sentinel maps back to a real NULL in
            # user-facing evidence
            F.nullif(F.col("d.observed"), F.lit(_NULL_SENTINEL)).alias("observed"),
            F.nullif(F.col("d.expected"), F.lit(_NULL_SENTINEL)).alias("expected"),
            F.lit(None).cast("string").alias("part"),
            F.lit(None).cast("string").alias("source_file"),
            F.lit(None).cast("long").alias("row_index"),
        )
        .limit(detail_cap)
    )
    ambiguous = dup_keys.select(
        F.lit(f"reconcile:{table}").alias("constraint"),
        F.lit(table).alias("table"),
        key_expr.alias("key"),
        F.lit("*").alias("column"),
        F.lit(None).cast("string").alias("observed"),
        F.lit("unambiguous row pairing (duplicate key on a side)").alias("expected"),
        F.lit(None).cast("string").alias("part"),
        F.lit(None).cast("string").alias("source_file"),
        F.lit(None).cast("long").alias("row_index"),
    ).limit(detail_cap)
    # evidence is capped (≤ 2·detail_cap rows): materialize it now so the
    # returned frame is frozen (limit is otherwise nondeterministic across
    # re-evaluations) and dup_keys can be released
    from unify_spark.operators.base import VIOLATION_SCHEMA

    spark = left.sparkSession
    rows = evidence.unionByName(ambiguous).collect()
    dup_keys.unpersist()
    return spark.createDataFrame(rows, VIOLATION_SCHEMA), col_counts
