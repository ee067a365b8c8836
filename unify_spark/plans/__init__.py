from unify_spark.plans.runner import ValidationRunner, RunResult  # noqa: F401
from unify_spark.plans.suite import audio_suite, load_audio_tables  # noqa: F401
