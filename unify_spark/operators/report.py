"""Violation-report enrichment: referencing-entities reverse lookup.

Reference: when a violating entity has no file/line annotation of its own,
unify's error formatter walks the REVERSE index (:vaet datoms) to show up to
the first 10 entities referencing it, recursively formatting those
(src/com/vendekagonlabs/unify/validation/post_import/util.clj:44-63).

Spark restatement: the violation set is tiny (capped like the reference's
1000-error cap), so it broadcasts against each declared referrer table; the
referrer side is scanned once over (fk, key) columns only, per-violation
referrers are capped with a window row_number, and the result is an
``referenced_from`` array column — no driver loops, no per-row queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def annotate_referencing_entities(
    violations: DataFrame,
    tables: dict[str, DataFrame],
    refs: list[tuple[str, str, str]],
    cap: int = 10,
) -> DataFrame:
    """Attach ``referenced_from`` (array of '<table>:<key>' strings, at most
    ``cap`` per violation — util.clj's take-10) to violation rows that lack
    their own source_file lineage.

    ``refs``: (referrer_table, fk_col, referrer_key_col) triples describing
    which tables reference the violating entities' keys.
    """
    from pyspark.sql import Window

    parts = []
    for rt, fk, kc in refs:
        df = tables[rt]
        parts.append(
            df.select(
                F.col(fk).cast("string").alias("key"),
                F.concat_ws(":", F.lit(rt), F.col(kc).cast("string")).alias("_referrer"),
            ).where(F.col(fk).isNotNull())
        )
    if not parts:
        return violations.withColumn(
            "referenced_from", F.lit(None).cast("array<string>")
        )
    refs_union = parts[0]
    for p in parts[1:]:
        refs_union = refs_union.unionByName(p)

    needy = violations.filter(F.col("source_file").isNull()).select("key").distinct()
    hits = refs_union.join(F.broadcast(needy), on="key")
    w = Window.partitionBy("key").orderBy("_referrer")
    top = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("_referrer")).alias("referenced_from"))
    )
    return violations.join(F.broadcast(top), on="key", how="left")
