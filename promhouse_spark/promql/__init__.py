"""PromQL front-end: parse real PromQL text and compile it to Spark
DataFrame plans over the engine's operators (beyond-reference — the
reference forwards PromQL to Prometheus and only does selection;
SURVEY §7 names server-side PromQL-lite the north star).

    from promhouse_spark.promql import PromQLEngine
    eng = PromQLEngine(samples_df, series_df, start_ms, end_ms, step_ms)
    df = eng.eval('sum by (job) (rate(http_requests_total{code="200"}[5m]))')

Supported surface (all differentially tested; see tests/test_promql_compile.py,
tests/test_promql_conformance.py, and the oracle-paired ph_promql_*
registry queries):

- selectors: metric names (colons allowed), {=, !=, =~, !~} matchers
  (absent ≡ ""), ``offset`` (±), ``@ <ts>`` / ``@ start()`` / ``@ end()``
  on instant AND range selectors AND subqueries; subqueries
  ``[range:step]`` over any expression; number literals with exponent /
  hex / Inf / NaN forms;
- range functions (true sliding windows at any range/step):
  rate / increase / delta (exact extrapolatedRate), irate / idelta,
  avg/min/max/sum/count/last/stddev/stdvar/present_over_time (max folds
  NaN exactly as Go: NaN never displaces a numeric max),
  quantile_over_time (φ∉[0,1] → ∓Inf), mad_over_time, the ts_of_* family,
  absent_over_time, deriv, predict_linear, resets, changes,
  holt_winters / double_exponential_smoothing;
- instant functions: abs ceil floor exp ln log2 log10 sqrt sgn, the trig
  family (sin..tanh, deg/rad), clamp/clamp_min/clamp_max (min>max → NaN,
  unary-minus literal bounds), round(v, to), histogram_quantile, absent,
  scalar, vector, time, pi, timestamp (raw sample ts under offset/@),
  minute/hour/day_of_week/day_of_month/month/year/day_of_year/
  days_in_month, label_replace / label_join, sort / sort_desc /
  sort_by_label / sort_by_label_desc, info (target_info label
  enrichment);
- aggregations with by/without: sum avg min max count group stddev stdvar
  quantile topk bottomk count_values limitk limit_ratio;
- binary operators with full precedence (^ over unary, right-assoc):
  + - * / % ^ atan2 with IEEE float semantics exactly as
  promql/engine.go (x/0 → ±Inf honoring a -0.0 divisor's sign, 0/0 and
  x%0 → NaN, math.Pow for ^ incl. 0^-1 → +Inf), comparisons with filter
  and ``bool`` semantics (NaN-false, != true), vector matching via
  on/ignoring + group_left/group_right(include), scalar-vector matching
  for scalar-TYPED operands, set operators and/or/unless, topk/bottomk
  NaN-last heap order;
- rule machinery: promql.alerts.alert_intervals_promql (FOR-duration
  interval replay), promql.rules.evaluate_rules/record_rules (recording
  rules materialized back into storage), promql.check (static
  promtool-style validation), promql.unittest (promtool ``test rules``
  against the engine), promql.format (canonical String() rendering,
  parse∘format round-trips);
- serving: Prometheus HTTP API v1 in edge/http.py — query (scalar /
  string / vector / matrix result typing incl. bare range selectors and
  top-level subqueries), query_range, format_query, parse_query, labels,
  label values, series (time-bounded via ?start/?end), metadata, rules,
  alerts, query_exemplars, status/{buildinfo,flags,runtimeinfo,tsdb},
  with ?limit= truncation warnings and Go-strconv value serialization.

Documented divergences (each pinned by a test): the regex dialect is
Java, not RE2 (POSIX classes parse differently); info() keeps the data
series' value on label conflicts where Prometheus errors; native
histograms are out of scope (the reference's data model is scalar
samples).
"""

from promhouse_spark.promql.engine import PromQLEngine
from promhouse_spark.promql.parser import parse

__all__ = ["PromQLEngine", "parse"]
