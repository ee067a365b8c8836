"""Compile a Metamodel into a constraint plan — the analogue of unify's
config parse → directive jobs (reference
src/com/vendekagonlabs/unify/import/engine/parse/config.clj:594-660), with
ref-dependency topological ordering (config.clj:426-488).

Derivation rules:
- attr.unique / kind.id_attr        → UniquenessConstraint
- attr.required                     → RequiredConstraint (grouped per kind)
- attr.enum_domain                  → DomainConstraint (isin)
- attr.min_value/max_value declared → RangeConstraint
- attr.ref_to                       → ReferentialIntegrityConstraint
- kind.composite_id_components     → CompositeIdConstraint
"""

from __future__ import annotations

from graphlib import TopologicalSorter

from unify_spark.operators import (
    CompositeIdConstraint,
    Constraint,
    DomainConstraint,
    RangeConstraint,
    ReferentialIntegrityConstraint,
    RequiredConstraint,
    UniquenessConstraint,
)
from unify_spark.schema.model import Metamodel


def kind_order(mm: Metamodel) -> list[str]:
    """Topological order over ref dependencies (referenced kinds first),
    mirroring unify's ref-data ordering with its cycle guard."""
    ts = TopologicalSorter()
    for kind, ks in mm.kinds.items():
        deps = {a.ref_to for a in ks.attributes if a.ref_to and a.ref_to != kind}
        if ks.parent and ks.parent != kind:
            deps.add(ks.parent)
        ts.add(kind, *sorted(deps))
    return list(ts.static_order())


def compile_constraints(
    mm: Metamodel,
    check_ranges: bool = False,
) -> list[Constraint]:
    """Build the constraint list in dependency order. ``check_ranges`` uses
    profiled min/max as range constraints (off by default: observed bounds
    are descriptive, not contracts, unless the config says otherwise)."""
    out: list[Constraint] = []
    for kind in kind_order(mm):
        ks = mm.kinds[kind]
        required_cols = [a.name for a in ks.attributes if a.required]
        if ks.id_attr:
            out.append(UniquenessConstraint(kind, [ks.id_attr]))
        for a in ks.attributes:
            if a.unique and a.name != ks.id_attr:
                out.append(UniquenessConstraint(kind, [a.name]))
            if a.enum_domain:
                out.append(DomainConstraint(kind, a.name, allowed=a.enum_domain))
            if a.ref_to:
                target = mm.kinds[a.ref_to]
                if target.id_attr:
                    out.append(
                        ReferentialIntegrityConstraint(
                            kind, a.name, a.ref_to, target.id_attr
                        )
                    )
            if check_ranges and (a.min_value is not None or a.max_value is not None):
                out.append(
                    RangeConstraint(kind, a.name, a.min_value, a.max_value)
                )
        if required_cols:
            out.append(RequiredConstraint(kind, required_cols))
        if ks.composite_id_components and ks.id_attr:
            out.append(
                CompositeIdConstraint(kind, ks.id_attr, ks.composite_id_components)
            )
    return out
