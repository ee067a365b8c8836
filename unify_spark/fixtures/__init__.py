from unify_spark.fixtures.generate import generate_fixture  # noqa: F401
