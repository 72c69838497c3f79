"""PromQL front-end: parse real PromQL text and compile it to Spark
DataFrame plans over the engine's operators (beyond-reference — the
reference forwards PromQL to Prometheus and only does selection;
SURVEY §7 names server-side PromQL-lite the north star).

    from promhouse_spark.promql import PromQLEngine
    eng = PromQLEngine(samples_df, series_df, start_ms, end_ms, step_ms)
    df = eng.eval('sum by (job) (rate(http_requests_total{code="200"}[5m]))')
"""

from promhouse_spark.promql.engine import PromQLEngine
from promhouse_spark.promql.parser import parse

__all__ = ["PromQLEngine", "parse"]
