from unify_spark.streaming.validate import (  # noqa: F401
    row_level_violation_expr,
    validate_stream,
    validate_stream_foreach_batch,
)
