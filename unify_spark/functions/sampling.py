"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is non-reproducible across runs/partitionings, which
breaks dataset versioning: re-running the pipeline yields a different
corpus. The standard fix (used by every large-scale dedup/sampling paper
since CC-Net) is HASH sampling — keep a row iff a stable hash of its id
lands under a threshold. Properties:

- deterministic: same ids → same sample, regardless of partitioning,
  cluster size, or engine (md5 is engine-portable, so DuckDB oracles it);
- consistent across tables: joining two hash-samples of related tables at
  the same rate keeps referential integrity for the kept keys;
- pure Column expression: JVM-side, whole-stage codegen, filter pushes
  toward the scan; zero shuffle.

Threshold mechanics: the first 8 hex chars of md5 are compared
lexicographically against ``hex(rate * 16^8)`` — fixed-width lowercase hex
compares identically to the numeric value, and both Spark and DuckDB emit
lowercase md5, so the SQL oracle is a string comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_WIDTH = 8
_HEX_SPACE = 16**_HEX_WIDTH


def wilson_interval(k: int, n: int, z: float = 1.959963984540054) -> tuple[float, float]:
    """Wilson score interval for a binomial proportion: ``k`` successes in
    ``n`` trials at confidence ``z`` (default 95%). Preferred over the normal
    approximation because it stays inside [0, 1] and behaves at k=0 / k=n —
    exactly the regimes a violation-rate estimate lives in (most corpora are
    nearly clean, so k is tiny). Returns (low, high); (0.0, 1.0) when n=0."""
    if n <= 0:
        return (0.0, 1.0)
    if not 0 <= k <= n:
        raise ValueError(f"need 0 <= k <= n, got k={k} n={n}")
    p = k / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = (z / denom) * ((p * (1 - p) / n + z2 / (4 * n * n)) ** 0.5)
    # pin the exact boundary cases (float rounding can leave the k=0 lower
    # bound at ~1e-17, which breaks `lo == 0` expectations downstream)
    lo = 0.0 if k == 0 else max(0.0, center - half)
    hi = 1.0 if k == n else min(1.0, center + half)
    return (lo, hi)


def hash_threshold(rate: float) -> str:
    """The 8-hex-digit threshold for ``rate``; md5-prefix < threshold keeps
    ~rate of rows. Exposed so oracle SQL can embed the identical literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), f"0{_HEX_WIDTH}x")


def hash_keep(col: Column | str, rate: float, salt: str = "") -> Column:
    """Boolean keep-predicate: md5(id||salt) prefix under the rate threshold.
    ``salt`` decorrelates independent samples drawn from the same ids (e.g.
    a 10% eval split disjoint-by-construction from a 10% train split uses
    two salts)."""
    c = F.col(col) if isinstance(col, str) else col
    if rate >= 1.0:
        return F.lit(True)
    h = F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, _HEX_WIDTH)
    return h < F.lit(hash_threshold(rate))


def sample_hash(df: DataFrame, id_col: str, rate: float, salt: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by id hash."""
    return df.where(hash_keep(id_col, rate, salt))


def _per_stratum_keep(
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    salt: str,
) -> Column:
    """The per-stratum CASE-chain keep predicate shared by
    ``stratified_sample`` and ``take_per_stratum``'s pre-thin phase."""
    keep = hash_keep(id_col, default_rate, salt)
    s = F.col(strata_col).cast("string")
    for value, rate in sorted(rates.items()):
        keep = F.when(s == F.lit(str(value)), hash_keep(id_col, rate, salt)).otherwise(
            keep
        )
    return keep


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic hash sampling — the rebalancing primitive
    (downsample the dominant web crawl, keep all of the rare high-quality
    stratum). ``rates`` maps stratum value → keep rate; strata not listed
    get ``default_rate``. The rates dict compiles to a CASE expression
    (plan literals, broadcast with the plan — no join, no shuffle); a
    million-stratum table would use a broadcast join instead, but quality
    tiers / language buckets are small."""
    return df.where(_per_stratum_keep(id_col, strata_col, rates, default_rate, salt))


def take_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n: int,
    salt: str = "",
    strata_counts: dict[str, int] | str | None = None,
    oversample: float = 3.0,
) -> DataFrame:
    """EXACT-count deterministic sampling: the ``n`` rows per stratum whose
    id-hash is smallest ("take 10k docs per language"). Rate-based sampling
    can't hit exact quotas; this can, and stays deterministic and
    partition-independent (the hash defines a global per-stratum order, so
    adding rows elsewhere in the stratum only evicts from the boundary).

    Plan shape: one shuffle on the stratum key + a row_number window over
    the md5 order — the window input is whatever ``df`` carries, so project
    first if rows are wide. A stratum's rows land in ONE window task, so
    for giant strata pass ``strata_counts`` ({stratum value: approximate
    row count}, e.g. from a prior profile pass or HLL sketch): strata whose
    count exceeds ``10 * oversample * n`` are PRE-THINNED with the
    ``hash_keep`` predicate at rate oversample*n/count before the window.

    ``strata_counts="auto"`` derives the counts itself: one key-only
    count aggregate (map-side combine) filtered to strata over the
    pre-thin threshold BEFORE collecting — at most
    total_rows / (10 * oversample * n) strata can exceed the threshold,
    so the driver result is bounded no matter how many strata exist. Pass
    an explicit dict (from a prior profile pass) to skip that job.

    The two-phase form is EXACT, not approximate: hash_keep keeps rows with
    md5-prefix under a threshold — a strict PREFIX of the very hash order
    the window ranks by — so the pre-filter can never evict a true top-n
    row as long as it keeps ≥ n rows, which the ``oversample`` margin
    guarantees to ~sqrt(n) fluctuation (at n=10^4 a 3x margin is ~200
    sigma). The pre-filter is a pure Column predicate evaluated BEFORE the
    shuffle, so a 10^10-row dominant stratum ships ~3n slim rows to its
    window task instead of 10^10."""
    from pyspark.sql import Window

    if strata_counts == "auto":
        threshold = 10 * oversample * n
        strata_counts = {
            row["_sv"]: row["_sc"]
            for row in (
                df.groupBy(F.col(strata_col).cast("string").alias("_sv"))
                .agg(F.count(F.lit(1)).alias("_sc"))
                .where(F.col("_sc") > threshold)
                .collect()
            )
            if row["_sv"] is not None  # NULL strata stay on the window path
        }

    if strata_counts:
        rates = {
            value: min(1.0, oversample * n / count)
            for value, count in strata_counts.items()
            if count > 10 * oversample * n
        }
        if rates:
            keep = _per_stratum_keep(id_col, strata_col, rates, 1.0, salt)
            # NULL-safe: a NULL id hashes to NULL → predicate NULL → WHERE
            # would drop it, but the single-phase window ranks NULL hashes
            # FIRST (they are always in the top-n), so they must survive
            # the pre-thin for the two-phase form to stay exact
            df = df.where(F.coalesce(keep, F.lit(True)))

    c = F.col(id_col).cast("string")
    h = F.md5(F.concat(c, F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def split_columns(
    col: Column | str, splits: dict[str, float], salt: str = ""
) -> Column:
    """Assign each row a split label ("train"/"val"/"test", …) from
    contiguous hash ranges — disjoint and exhaustive iff rates sum to 1.
    Deterministic: a row's split never changes when data is added around it.
    Returns a string Column; when rates sum to < 1, rows past the last
    boundary get null."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, _HEX_WIDTH)
    cum = 0.0
    bounds = []
    names = list(splits)
    for name, rate in splits.items():
        cum += rate
        bounds.append((name, hash_threshold(min(cum, 1.0))))
    if cum > 1.0 + 1e-9:
        raise ValueError(f"split rates sum to {cum} > 1")
    if cum >= 1.0 - 1e-9:
        # rates are exhaustive: the last split is a catch-all, not a clamped
        # strict-< boundary — otherwise rows whose 8-hex md5 prefix is
        # exactly 'ffffffff' (~2^-32 of rows, i.e. real rows at 10^10 docs)
        # would fall through to null
        bounds[-1] = (names[-1], None)
    # cascading whens in ascending-threshold order: first boundary the hash
    # falls under wins, so ranges are contiguous and disjoint
    expr = F.lit(None).cast("string")
    for name, thr in bounds:
        cond = F.lit(True) if thr is None else (h < F.lit(thr))
        expr = F.coalesce(expr, F.when(cond, F.lit(name)))
    return expr
