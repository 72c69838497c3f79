"""PromQL front-end: parse real PromQL text and compile it to Spark
DataFrame plans over the engine's operators (beyond-reference — the
reference forwards PromQL to Prometheus and only does selection;
SURVEY §7 names server-side PromQL-lite the north star).

    from promhouse_spark.promql import PromQLEngine
    eng = PromQLEngine(samples_df, series_df, start_ms, end_ms, step_ms)
    df = eng.eval('sum by (job) (rate(http_requests_total{code="200"}[5m]))')

Supported surface (all differentially tested; see tests/test_promql_compile.py
and the oracle-paired ph_promql_* registry queries):

- selectors: metric names (colons allowed), {=, !=, =~, !~} matchers
  (absent ≡ ""), ``offset``, ``@ <ts>`` (instant), subqueries
  ``[range:step]`` over any expression;
- range functions (true sliding windows at any range/step):
  rate / increase / delta (exact extrapolatedRate), irate / idelta,
  avg/min/max/sum/count/last/stddev/stdvar/present_over_time,
  quantile_over_time, deriv, predict_linear, resets, changes,
  holt_winters;
- instant functions: abs ceil floor exp ln log2 log10 sqrt sgn, the trig
  family (sin..tanh, deg/rad), clamp/clamp_min/clamp_max (min>max → NaN),
  round(v, to), histogram_quantile, absent, scalar, vector, time, pi,
  minute/hour/day_of_week/day_of_month/month/year,
  label_replace / label_join, sort / sort_desc;
- aggregations with by/without: sum avg min max count group stddev stdvar
  quantile topk bottomk count_values;
- binary operators with full precedence (^ over unary, right-assoc):
  + - * / % ^, comparisons with filter and ``bool`` semantics, vector
  matching via on/ignoring + group_left/group_right(include), set
  operators and/or/unless;
- rule evaluation: promql.alerts.alert_intervals_promql (FOR-duration
  interval replay), promql.rules.evaluate_rules/record_rules (recording
  rules materialized back into storage);
- serving: Prometheus HTTP API v1 (query, query_range, labels,
  label values, series) in edge/http.py.

Documented divergences: /0 yields NULL (Spark non-ANSI) not ±Inf;
``absent_over_time`` is not compiled (the standalone operator covers the
batch use); NaN ordering in topk follows Spark sort order.
"""

from promhouse_spark.promql.engine import PromQLEngine
from promhouse_spark.promql.parser import parse

__all__ = ["PromQLEngine", "parse"]
