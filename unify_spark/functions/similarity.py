"""Similarity search over embedding columns (array<float>).

Brute-force cosine (zip_with/aggregate — JVM-side, codegen'd) as the exact
baseline, plus a random-hyperplane LSH-bucketed variant as the scale path:
signatures shrink the candidate set from O(N) to a bucket, then exact cosine
re-ranks inside the bucket. Hyperplanes are deterministic (seeded hash-based
pseudo-gaussians), so results are reproducible without shipping a model.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine to a literal query vector.

    One narrow scan + a single global top-k (takeOrdered semantics via
    orderBy+limit → Spark's TakeOrderedAndProject, no full sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(_as_double(vec_col), q).alias("cos_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact, O(N²) dot
    products; the correctness baseline the LSH path is checked against.
    At production N this is what ``lsh_ann_topk`` replaces."""
    v = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.round(F.col("cos_sim"), 4) >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-gaussian hyperplane via splitmix64 + Box-Muller."""
    out = []
    for d in range(0, dim, 2):
        u1 = _splitmix_unit(plane_idx * 100_003 + d)
        u2 = _splitmix_unit(plane_idx * 100_003 + d + 1)
        r = math.sqrt(-2.0 * math.log(max(u1, 1e-12)))
        out.append(r * math.cos(2 * math.pi * u2))
        out.append(r * math.sin(2 * math.pi * u2))
    return out[:dim]


def _splitmix_unit(x: int) -> float:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z = z ^ (z >> 31)
    return (z >> 11) / float(1 << 53)


def lsh_signature(vec_col: Column | str, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit b = sign(v · h_b); packed to int64."""
    v = _as_double(vec_col)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        h = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        bit = F.when(dot(v, h) >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: bucket by hyperplane signature, exact cosine inside
    the bucket, per-query top-k via window. Queries is a (id, vec) DataFrame
    (typically small → broadcast). Recall/latency tuned by n_planes."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id_b"),
        _as_double(vec_col).alias("vb"),
        lsh_signature(vec_col, dim, n_planes).alias("sig"),
    )
    qs = queries.select(
        F.col(id_col).alias("id_q"),
        _as_double(vec_col).alias("vq"),
        lsh_signature(vec_col, dim, n_planes).alias("sig"),
    )
    joined = base.join(F.broadcast(qs), on="sig").where(F.col("id_b") != F.col("id_q"))
    scored = joined.select(
        "id_q", "id_b", cosine(F.col("vq"), F.col("vb")).alias("cos_sim")
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos_sim"), F.col("id_b"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
