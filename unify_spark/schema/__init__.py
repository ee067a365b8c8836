from unify_spark.schema.model import (  # noqa: F401
    AttributeSpec,
    KindSchema,
    Metamodel,
    to_struct_type,
)
from unify_spark.schema.infer import infer_kind_schema  # noqa: F401
