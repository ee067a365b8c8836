from unify_spark.streaming.validate import (  # noqa: F401
    drift_monitor_foreach_batch,
    row_level_violation_expr,
    validate_stream,
    validate_stream_foreach_batch,
)
