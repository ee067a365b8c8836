"""Metamodel diff — schema-evolution drift between two inferred (or
compiled) metamodels.

The reference round-trips schemas through inference and compilation
(src/com/vendekagonlabs/unify/db/schema/compile.clj:298-316); what a
long-running validation deployment additionally needs is the DIFF between
the metamodel a pipeline was validated against and the one inferred from
today's data: a new column, a type change, or a narrowed enum domain is
schema drift the same way a shifted dur_ms histogram is distribution drift.
This is driver-side metadata comparison — zero Spark jobs — so it can gate
every run for free (`unify_spark.cli schema-diff`, or `infer-schema
--baseline`).

Severity model (documented convention, asserted in tests): a change is
**breaking** when data valid under the OLD metamodel can be invalid — or
read incorrectly — under the NEW one (removed kind/attr, changed type or
cardinality, tightened requiredness, narrowed enum, changed id or ref
target). Additions and loosenings are **compatible**.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

from unify_spark.schema.model import Metamodel

BREAKING = "breaking"
COMPATIBLE = "compatible"


@dataclass
class SchemaChange:
    kind: str
    change: str
    severity: str
    attr: str | None = None
    old: str | None = None
    new: str | None = None


def _fmt(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, (list, tuple, set)):
        return ",".join(str(x) for x in sorted(v))
    return str(v)


def diff_metamodels(old: Metamodel, new: Metamodel) -> list[SchemaChange]:
    """Ordered list of changes from ``old`` to ``new`` (kinds sorted, then
    attributes sorted — deterministic for golden tests and audit rows)."""
    out: list[SchemaChange] = []
    old_kinds, new_kinds = set(old.kinds), set(new.kinds)

    for k in sorted(old_kinds - new_kinds):
        out.append(SchemaChange(k, "kind_removed", BREAKING))
    for k in sorted(new_kinds - old_kinds):
        out.append(SchemaChange(k, "kind_added", COMPATIBLE))

    for k in sorted(old_kinds & new_kinds):
        ok, nk = old.kinds[k], new.kinds[k]
        if (ok.id_attr or None) != (nk.id_attr or None):
            out.append(
                SchemaChange(k, "id_changed", BREAKING, old=_fmt(ok.id_attr), new=_fmt(nk.id_attr))
            )
        for field_name in ("parent", "id_scope", "composite_id_components"):
            ov, nv = getattr(ok, field_name), getattr(nk, field_name)
            if (ov or None) != (nv or None):
                out.append(
                    SchemaChange(
                        k, f"{field_name}_changed", BREAKING, old=_fmt(ov), new=_fmt(nv)
                    )
                )
        oa = {a.name: a for a in ok.attributes}
        na = {a.name: a for a in nk.attributes}
        for name in sorted(set(oa) - set(na)):
            out.append(SchemaChange(k, "attr_removed", BREAKING, attr=name, old=oa[name].dtype))
        for name in sorted(set(na) - set(oa)):
            sev = BREAKING if na[name].required else COMPATIBLE
            out.append(
                SchemaChange(
                    k,
                    "attr_added_required" if na[name].required else "attr_added",
                    sev,
                    attr=name,
                    new=na[name].dtype,
                )
            )
        for name in sorted(set(oa) & set(na)):
            a, b = oa[name], na[name]
            if a.dtype != b.dtype or (a.tuple_types or None) != (b.tuple_types or None):
                out.append(
                    SchemaChange(k, "type_changed", BREAKING, attr=name, old=a.dtype, new=b.dtype)
                )
            if a.cardinality != b.cardinality:
                out.append(
                    SchemaChange(
                        k, "cardinality_changed", BREAKING, attr=name,
                        old=a.cardinality, new=b.cardinality,
                    )
                )
            if a.required != b.required:
                out.append(
                    SchemaChange(
                        k,
                        "required_tightened" if b.required else "required_loosened",
                        BREAKING if b.required else COMPATIBLE,
                        attr=name,
                        old=str(a.required),
                        new=str(b.required),
                    )
                )
            od = set(a.enum_domain or [])
            nd = set(b.enum_domain or [])
            if od != nd:
                # narrowed: a previously-valid value is no longer allowed.
                # A domain APPEARING where there was none is a narrowing of
                # the implicit unconstrained domain; one disappearing widens.
                if (od and nd and (od - nd)) or (not od and nd):
                    out.append(
                        SchemaChange(
                            k, "enum_narrowed", BREAKING, attr=name,
                            old=_fmt(od) or None, new=_fmt(nd),
                        )
                    )
                else:
                    out.append(
                        SchemaChange(
                            k, "enum_widened", COMPATIBLE, attr=name,
                            old=_fmt(od), new=_fmt(nd) or None,
                        )
                    )
            if (a.ref_to or None) != (b.ref_to or None):
                out.append(
                    SchemaChange(
                        k, "ref_changed", BREAKING, attr=name, old=_fmt(a.ref_to), new=_fmt(b.ref_to)
                    )
                )
            if a.unique != b.unique:
                out.append(
                    SchemaChange(
                        k,
                        "unique_tightened" if b.unique else "unique_loosened",
                        BREAKING if b.unique else COMPATIBLE,
                        attr=name,
                        old=str(a.unique),
                        new=str(b.unique),
                    )
                )
            # numeric bounds: a bound APPEARING or moving inward narrows the
            # valid range (breaking); disappearing or moving outward widens
            lo_narrowed = (a.min_value is None and b.min_value is not None) or (
                a.min_value is not None and b.min_value is not None and b.min_value > a.min_value
            )
            hi_narrowed = (a.max_value is None and b.max_value is not None) or (
                a.max_value is not None and b.max_value is not None and b.max_value < a.max_value
            )
            if (a.min_value, a.max_value) != (b.min_value, b.max_value):
                out.append(
                    SchemaChange(
                        k,
                        "range_narrowed" if (lo_narrowed or hi_narrowed) else "range_widened",
                        BREAKING if (lo_narrowed or hi_narrowed) else COMPATIBLE,
                        attr=name,
                        old=f"[{a.min_value},{a.max_value}]",
                        new=f"[{b.min_value},{b.max_value}]",
                    )
                )
    return out


def diff_report(changes: list[SchemaChange]) -> dict:
    """JSON-able summary: counts + the change list, breaking first."""
    ordered = sorted(
        changes, key=lambda c: (c.severity != BREAKING, c.kind, c.attr or "", c.change)
    )
    return {
        "n_changes": len(changes),
        "n_breaking": sum(1 for c in changes if c.severity == BREAKING),
        "changes": [asdict(c) for c in ordered],
    }


def diff_json(old_json: str, new_json: str) -> dict:
    return diff_report(
        diff_metamodels(Metamodel.from_json(old_json), Metamodel.from_json(new_json))
    )


def main_diff_files(old_path: str, new_path: str) -> dict:
    with open(old_path) as f:
        old_json = f.read()
    with open(new_path) as f:
        new_json = f.read()
    report = diff_json(old_json, new_json)
    report["old"] = old_path
    report["new"] = new_path
    return report


__all__ = [
    "SchemaChange",
    "diff_metamodels",
    "diff_report",
    "diff_json",
    "main_diff_files",
    "BREAKING",
    "COMPATIBLE",
]

if __name__ == "__main__":  # pragma: no cover - convenience
    import sys

    print(json.dumps(main_diff_files(sys.argv[1], sys.argv[2]), indent=2))
