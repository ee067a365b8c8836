from unify_spark.operators.base import (  # noqa: F401
    Constraint,
    ValidationContext,
    VIOLATION_SCHEMA,
    empty_violations,
)
from unify_spark.operators.constraints import (  # noqa: F401
    AggregateConsistencyConstraint,
    AnyPresentConstraint,
    CompositeIdConstraint,
    ConditionalConstraint,
    DomainConstraint,
    EnumMappingConstraint,
    EqualityAcrossTablesConstraint,
    FreshnessConstraint,
    FuzzyEqualityConstraint,
    LengthConstraint,
    PartitionCompletenessConstraint,
    RangeConstraint,
    ReferentialIntegrityConstraint,
    RegexConstraint,
    RequiredConstraint,
    UniquenessConstraint,
    VectorConstraint,
    UpsertConflictConstraint,
)
from unify_spark.operators.drift import (  # noqa: F401
    CategoricalDriftConstraint,
    DriftConstraint,
)
from unify_spark.operators.payload import AudioPayloadConstraint  # noqa: F401
from unify_spark.operators.profile import profile_table  # noqa: F401
from unify_spark.operators.reconcile import (  # noqa: F401
    reconcile_keys,
    reconcile_tables,
)
