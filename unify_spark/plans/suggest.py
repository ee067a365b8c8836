"""Constraint suggestion: profile the tables and emit a RUNNABLE suite.

The Deequ-ConstraintSuggestion analogue, closing the config loop the
reference opens with schema inference (unify's `infer-schema` reconstructs
the DSL from a compiled schema, src/com/vendekagonlabs/unify/db/schema/
compile.clj:298-316; this module goes one step further and reconstructs
the VALIDATION contract from the data itself): profile each table once,
derive candidate constraints from the stats, verify the cheap-to-verify
ones exactly, and emit specs in the exact shape `plans/config.py`
`_build_constraint` consumes — so `suggest-constraints --out suite.yaml`
feeds straight into `validate --config suite.yaml`.

Heuristics (each suggestion carries its evidence):

- **required**: observed null rate exactly 0 over a non-empty table.
- **range**: numeric column → observed [min, max]. When the column's
  distinct count is tiny (an enum-like rate set such as sr_hz), an
  `allowed_set` of the exact values is suggested instead.
- **domain**: string column whose approx-distinct is under the cardinality
  cap → the exact value set (confirmed with one capped distinct collect).
- **uniqueness**: null-free column whose approx-distinct (HLL, ±2%) is
  within slack of the row count → confirmed with one exact count-distinct
  (key-only scan; skippable via ``verify_unique=False`` at extreme scale,
  the suggestion is then marked approximate).
- **referential**: a child column sharing its name with a parent table's
  confirmed-unique column → child→parent integrity.

Scale shape: one aggregate pass per table (the profile scan — map-side
partials, no shuffle beyond the final combine), plus one tiny
distinct-collect per confirmed domain candidate (bounded by the cap) and
one count-distinct per uniqueness candidate. Nothing row-scale ever
reaches the driver.

Suggestions describe THE DATA AS IT IS: run them against the same data
and they pass by construction (the round-trip test pins this); their
value is catching future regressions, exactly like a recorded baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUMERIC_BASES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
}


def _profile_stats(
    df: DataFrame, table: str
) -> tuple[int, dict[str, dict[str, float]]]:
    """{column: {stat: value}} + row count from ONE profile pass."""
    from unify_spark.operators.profile import profile_table

    rows_stats: dict[str, dict[str, float]] = {}
    n_rows = 0
    for r in profile_table(df, table, part_col=None).collect():
        if r["column"] == "*" and r["stat"] == "rows":
            n_rows = int(r["value"])
            continue
        if r["stat"] == "quantiles":
            continue  # suggestion uses exact min/max, not sketch quantiles
        try:
            v = float(r["value"]) if r["value"] is not None else None
        except ValueError:
            continue
        rows_stats.setdefault(r["column"], {})[r["stat"]] = v
    return n_rows, rows_stats


def suggest_constraints(
    tables: dict[str, DataFrame],
    part_col: str = "part_date",
    domain_max_cardinality: int = 50,
    uniqueness_hll_slack: float = 0.05,
    verify_unique: bool = True,
    exclude: dict[str, list[str]] | None = None,
) -> dict:
    """Returns ``{"constraints": [spec, ...], "evidence": {name: {...}}}``
    where every spec is directly consumable by ``_build_constraint`` /
    a ``validate --config`` suite."""
    exclude = exclude or {}
    specs: list[dict] = []
    evidence: dict[str, dict] = {}
    # deferred drift companions: (kind, table, column, probe constraint) —
    # their calibration scores all evaluate in ONE union job after the
    # per-column loop (a probe job per column would turn a one-pass
    # suggestion into a column-by-column crawl at 10^9-row tables)
    drift_probes: list[tuple] = []
    unique_cols: dict[str, set[str]] = {}  # table -> confirmed-unique columns

    profiles: dict[str, tuple[int, dict, DataFrame]] = {}
    for name, df in tables.items():
        drop = set(exclude.get(name, [])) | {part_col}
        slim = df.select(*[c for c in df.columns if c not in drop])
        n_rows, stats = _profile_stats(slim, name)
        profiles[name] = (n_rows, stats, slim)

    for name, (n_rows, stats, slim) in profiles.items():
        if n_rows == 0:
            continue
        dtypes = dict(slim.dtypes)
        required_cols: list[str] = []
        for col in slim.columns:
            s = stats.get(col, {})
            base = dtypes[col].split("(")[0]
            null_rate = s.get("null_rate")
            approx_d = s.get("approx_distinct") or 0.0

            if null_rate == 0.0:
                required_cols.append(col)

            if base in _NUMERIC_BASES and s.get("min") is not None:
                if 0 < approx_d <= domain_max_cardinality:
                    vals = sorted(
                        r[0]
                        for r in slim.select(col).distinct()
                        .limit(domain_max_cardinality + 1).collect()
                        if r[0] is not None
                    )
                    if len(vals) <= domain_max_cardinality:
                        specs.append(
                            {"type": "range", "table": name, "column": col,
                             "allowed_set": vals}
                        )
                        evidence[f"range:{name}.{col}"] = {
                            "kind": "allowed_set", "cardinality": len(vals)
                        }
                    else:  # HLL under-counted past the cap — fall back
                        specs.append(
                            {"type": "range", "table": name, "column": col,
                             "min": s["min"], "max": s["max"]}
                        )
                        evidence[f"range:{name}.{col}"] = {
                            "kind": "observed_bounds",
                            "min": s["min"], "max": s["max"],
                        }
                else:
                    specs.append(
                        {"type": "range", "table": name, "column": col,
                         "min": s["min"], "max": s["max"]}
                    )
                    evidence[f"range:{name}.{col}"] = {
                        "kind": "observed_bounds", "min": s["min"], "max": s["max"]
                    }

                # numeric distribution-drift companion, same calibration
                # contract as the categorical one: bounds = the observed
                # range (stable bins), thresholds raised above the max
                # per-partition PSI/KS the baseline already shows. Skipped
                # for id-like columns (approx-distinct ≈ rows): a monotone
                # id's per-partition distribution ALWAYS drifts, by design.
                if (
                    part_col in tables[name].columns
                    and s["min"] < s["max"]
                    and approx_d < n_rows * (1 - uniqueness_hll_slack)
                ):
                    from unify_spark.operators.drift import DriftConstraint

                    drift_probes.append(
                        ("drift", name, col,
                         DriftConstraint(name, col, bounds=(s["min"], s["max"])))
                    )

            if (
                base == "string"
                and 0 < approx_d <= domain_max_cardinality
                and approx_d < n_rows * (1 - uniqueness_hll_slack)
            ):
                vals = sorted(
                    r[0]
                    for r in slim.select(col).distinct()
                    .limit(domain_max_cardinality + 1).collect()
                    if r[0] is not None
                )
                if len(vals) <= domain_max_cardinality:
                    specs.append(
                        {"type": "domain", "table": name, "column": col,
                         "allowed": vals}
                    )
                    evidence[f"domain:{name}.{col}"] = {
                        "cardinality": len(vals), "rows": n_rows
                    }
                    # an enum-like column on a partitioned table also gets
                    # the mix-drift companion: the verified domain doubles
                    # as the contract `categories`, so the drift check runs
                    # from ONE (part, value) aggregate (no top-K discovery
                    # scan) — per-row domain legality and category-mix
                    # stability are different failures of the same column.
                    # CALIBRATED against the profiled baseline (the
                    # suggestion contract: the data it was derived from
                    # must pass): the threshold sits 25% above the max
                    # observed per-partition PSI (floor 0.25), and the
                    # new-category alarm arms only when the baseline has
                    # no partition-exclusive categories — "alert when the
                    # mix drifts beyond what this corpus already shows".
                    if part_col in tables[name].columns:
                        from unify_spark.operators.drift import (
                            CategoricalDriftConstraint,
                        )

                        drift_probes.append(
                            ("cat_drift", name, col,
                             CategoricalDriftConstraint(
                                 name, col, categories=vals,
                                 new_category_fails=False,
                             ))
                        )

            if (
                null_rate == 0.0
                and base != "binary"
                and approx_d >= n_rows * (1 - uniqueness_hll_slack)
            ):
                confirmed = None
                if verify_unique:
                    exact = (
                        slim.select(col).agg(F.countDistinct(col).alias("d"))
                        .collect()[0]["d"]
                    )
                    confirmed = exact == n_rows
                    if not confirmed:
                        evidence[f"uniqueness:{name}.{col}"] = {
                            "rejected": True, "distinct": exact, "rows": n_rows
                        }
                if confirmed or (confirmed is None):
                    specs.append({"type": "uniqueness", "table": name, "keys": [col]})
                    evidence[f"uniqueness:{name}.{col}"] = {
                        "rows": n_rows,
                        "approx_distinct": approx_d,
                        "verified_exact": bool(confirmed),
                    }
                    unique_cols.setdefault(name, set()).add(col)

        if required_cols:
            specs.append(
                {"type": "required", "table": name, "columns": sorted(required_cols)}
            )
            evidence[f"required:{name}"] = {"columns": sorted(required_cols)}

    # referential: child column named like a parent's confirmed-unique column
    for child, (n_rows, stats, slim) in profiles.items():
        for col in slim.columns:
            for parent, ucols in unique_cols.items():
                if parent != child and col in ucols:
                    specs.append(
                        {"type": "referential", "child_table": child,
                         "child_key": col, "parent_table": parent,
                         "parent_key": col}
                    )
                    evidence[f"referential:{child}.{col}->{parent}.{col}"] = {
                        "matched_on": "column name + parent uniqueness"
                    }
    if drift_probes:
        from pyspark.sql import functions as _F

        from unify_spark.operators.base import ValidationContext as _Ctx

        pctx = _Ctx(run_id="suggest", part_col=part_col)
        union = None
        for kind, name, col, probe in drift_probes:
            sp = probe.scores_plan({name: tables[name]}, pctx)
            # normalize to (tag, psi, aux): aux = ks for numeric,
            # new-category count for categorical
            aux = _F.col("ks") if kind == "drift" else _F.col(
                "new_categories"
            ).cast("double")
            tagged = sp.select(
                _F.lit(f"{kind}:{name}.{col}").alias("tag"),
                _F.col("psi"),
                aux.alias("aux"),
            )
            union = tagged if union is None else union.unionByName(tagged)
        maxes = {
            r["tag"]: (r["mp"] or 0.0, r["ma"] or 0.0)
            for r in union.groupBy("tag")
            .agg(_F.max("psi").alias("mp"), _F.max("aux").alias("ma"))
            .collect()
        }
        for kind, name, col, probe in drift_probes:
            max_psi, max_aux = maxes.get(f"{kind}:{name}.{col}", (0.0, 0.0))
            psi_thr = max(0.25, round(1.25 * max_psi, 2))
            if kind == "drift":
                spec = {
                    "type": "drift", "table": name, "column": col,
                    "bounds": [probe.bounds[0], probe.bounds[1]],
                }
                ks_thr = max(0.15, round(1.25 * max_aux, 2))
                if psi_thr > 0.25:
                    spec["psi_threshold"] = psi_thr
                if ks_thr > 0.15:
                    spec["ks_threshold"] = ks_thr
                evidence[f"drift:{name}.{col}"] = {
                    "baseline_max_psi": round(max_psi, 4),
                    "baseline_max_ks": round(max_aux, 4),
                    "calibrated": psi_thr > 0.25 or ks_thr > 0.15,
                }
            else:
                novel = max_aux > 0
                spec = {
                    "type": "categorical_drift", "table": name,
                    "column": col, "categories": probe.categories,
                    "new_category_fails": not novel,
                }
                if psi_thr > 0.25:
                    spec["psi_threshold"] = psi_thr
                evidence[f"cat_drift:{name}.{col}"] = {
                    "categories": len(probe.categories),
                    "from": "verified domain",
                    "baseline_max_psi": round(max_psi, 4),
                    "calibrated": psi_thr > 0.25,
                }
            specs.append(spec)

    return {"constraints": specs, "evidence": evidence}


def suggestions_to_suite(
    suggestions: dict,
    table_paths: dict[str, str],
    run_id: str = "suggested-run",
    part_col: str = "part_date",
) -> dict:
    """Wrap suggested specs into a full suite-config document —
    `yaml.dump` it and `validate --config` runs it as-is."""
    return {
        "run_id": run_id,
        "part_col": part_col,
        "tables": dict(table_paths),
        "constraints": suggestions["constraints"],
    }
