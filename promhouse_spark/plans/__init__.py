from promhouse_spark.plans.read import (  # noqa: F401
    group_into_series,
    restrict_to_series,
    samples_in_range,
    select_series,
)
from promhouse_spark.plans.rawsql import is_rawsql, rawsql_text, run_rawsql  # noqa: F401
