from promhouse_spark.operators.matchers import (  # noqa: F401
    matcher_to_column,
    matchers_to_column,
)
