"""PromQL-semantics workloads, second wave: instant-vector evaluation via
the as-of join (operators/asof.py), grid gap-filling, the regression
functions ``deriv`` / ``predict_linear``, ``quantile_over_time``,
``holt_winters`` (recursive-CTE oracle), Prometheus's real extrapolated
rate/increase, label_replace/label_join, alerting-rule interval replay,
``count_values``, ``absent_over_time``, and the LOCF time-weighted average
(operators/promql_lite.py, functions/labels.py).

The instant-vector and gap-fill oracles run DuckDB's NATIVE ``ASOF JOIN``
— a genuinely independent mechanism from the union-merge window rendering
on the Spark side, so a hash match there validates the as-of semantics,
not just the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.operators.asof import instant_vector
from promhouse_spark.operators.promql_lite import deriv, predict_linear
from promhouse_spark.session import load_table

# the events table spans 2024-01-01..2024-01-30 (~3 samples/user/day at
# sf0.01); evaluate a 2-day grid at 1 h steps starting Jan 2 so every grid
# point has history behind it, with a 6 h staleness lookback to match the
# sparse cadence
_START_MS = 1704153600000  # 2024-01-02T00:00:00Z
_END_MS = _START_MS + 48 * 3600 * 1000
_STEP_MS = 3600 * 1000
_LOOKBACK_MS = 6 * 3600 * 1000


def _samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("fingerprint"),
        F.unix_millis(F.col("ts")).alias("timestamp_ms"),
        F.col("value"),
    )


def ph_instant_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instant-vector evaluation: per (series, grid hour) the most recent
    sample within a 6 h staleness lookback — PromQL's point-in-time read,
    rendered as the one-shuffle union-merge as-of join."""
    out = instant_vector(
        _samples(spark, sf_dir), _START_MS, _END_MS, _STEP_MS, _LOOKBACK_MS
    )
    return out.select(
        F.col("fingerprint").alias("user_id"),
        "eval_ms",
        F.round("value", 6).alias("value"),
        "sample_ts_ms",
    ).orderBy("user_id", "eval_ms")


PH_INSTANT_VECTOR_SQL = f"""
WITH samples AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
),
grid AS (
  SELECT u.user_id, g.eval_ms
  FROM (SELECT DISTINCT user_id FROM samples) u
  CROSS JOIN (
    SELECT unnest(generate_series({_START_MS}, {_END_MS}, {_STEP_MS})) AS eval_ms
  ) g
),
joined AS MATERIALIZED (
  -- MATERIALIZED: DuckDB 1.0 would otherwise push the staleness WHERE into
  -- the join and reject it as a second ASOF inequality
  SELECT g.user_id, g.eval_ms, round(s.value, 6) AS value, s.ts_ms AS sample_ts_ms
  FROM grid g ASOF JOIN samples s
    ON g.user_id = s.user_id AND g.eval_ms >= s.ts_ms
)
SELECT * FROM joined
WHERE sample_ts_ms >= eval_ms - {_LOOKBACK_MS}
ORDER BY user_id, eval_ms
"""


def ph_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL deriv(): per-(series, 6 h window) least-squares slope of the
    gauge, value/second — one algebraic aggregation, no window sort."""
    step = 6 * 3600 * 1000
    return (
        deriv(_samples(spark, sf_dir), step_ms=step)
        .select(
            F.col("fingerprint").alias("user_id"),
            "window_start_ms",
            "slope_per_sec",
            "n_samples",
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_DERIV_SQL = """
SELECT user_id,
       (epoch_ms(ts) // 21600000) * 21600000 AS window_start_ms,
       round(regr_slope(value, (epoch_ms(ts) - (epoch_ms(ts) // 21600000) * 21600000) / 1000.0), 6)
         AS slope_per_sec,
       CAST(count(*) AS BIGINT) AS n_samples
FROM events
GROUP BY 1, 2
HAVING count(*) >= 2
ORDER BY user_id, window_start_ms
"""


def ph_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL predict_linear(): the 6 h-window fit extrapolated 1 h past the
    window end — the capacity-alerting primitive."""
    step = 6 * 3600 * 1000
    return (
        predict_linear(_samples(spark, sf_dir), step_ms=step, horizon_s=3600)
        .select(
            F.col("fingerprint").alias("user_id"),
            "window_start_ms",
            "predicted",
            "n_samples",
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_PREDICT_LINEAR_SQL = """
WITH xy AS (
  SELECT user_id,
         (epoch_ms(ts) // 21600000) * 21600000 AS window_start_ms,
         (epoch_ms(ts) - (epoch_ms(ts) // 21600000) * 21600000) / 1000.0 AS x,
         value AS y
  FROM events
)
SELECT user_id, window_start_ms,
       round(regr_intercept(y, x) + regr_slope(y, x) * (21600.0 + 3600.0), 4) AS predicted,
       CAST(count(*) AS BIGINT) AS n_samples
FROM xy
GROUP BY user_id, window_start_ms
HAVING count(*) >= 2
ORDER BY user_id, window_start_ms
"""


QUERIES = {
    "ph_instant_vector": ph_instant_vector,
    "ph_deriv": ph_deriv,
    "ph_predict_linear": ph_predict_linear,
}

ORACLES = {
    "ph_instant_vector": PH_INSTANT_VECTOR_SQL,
    "ph_deriv": PH_DERIV_SQL,
    "ph_predict_linear": PH_PREDICT_LINEAR_SQL,
}


def ph_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL quantile_over_time(0.9, …): exact interpolated p90 per
    (series, 6 h window)."""
    from promhouse_spark.operators.promql_lite import quantile_over_time

    step = 6 * 3600 * 1000
    return (
        quantile_over_time(_samples(spark, sf_dir), q=0.9, step_ms=step)
        .select(
            F.col("fingerprint").alias("user_id"),
            "window_start_ms",
            "quantile",
            "n_samples",
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_QUANTILE_SQL = """
SELECT user_id,
       (epoch_ms(ts) // 21600000) * 21600000 AS window_start_ms,
       round(quantile_cont(value, 0.9), 6) AS quantile,
       CAST(count(*) AS BIGINT) AS n_samples
FROM events
GROUP BY 1, 2
ORDER BY user_id, window_start_ms
"""

QUERIES["ph_quantile_over_time"] = ph_quantile_over_time
ORACLES["ph_quantile_over_time"] = PH_QUANTILE_SQL


def ph_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid gap-filling with linear interpolation between the straddling
    samples (operators/asof.py:gap_fill) — the TimescaleDB
    time_bucket_gapfill + interpolate() shape. NULL outside a series'
    sample range (no extrapolation)."""
    from promhouse_spark.operators.asof import gap_fill

    out = gap_fill(
        _samples(spark, sf_dir), _START_MS, _END_MS, _STEP_MS, method="linear"
    )
    return out.select(
        F.col("fingerprint").alias("user_id"),
        "eval_ms",
        F.round("value", 6).alias("value"),
    ).orderBy("user_id", "eval_ms")


PH_GAP_FILL_SQL = f"""
WITH samples AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
),
grid AS (
  SELECT u.user_id, g.eval_ms
  FROM (SELECT DISTINCT user_id FROM samples) u
  CROSS JOIN (
    SELECT unnest(generate_series({_START_MS}, {_END_MS}, {_STEP_MS})) AS eval_ms
  ) g
),
prev AS MATERIALIZED (
  SELECT g.user_id, g.eval_ms, s.ts_ms AS p_ts, s.value AS p_v
  FROM grid g ASOF LEFT JOIN samples s
    ON g.user_id = s.user_id AND g.eval_ms >= s.ts_ms
),
nxt AS MATERIALIZED (
  SELECT g.user_id, g.eval_ms, s.ts_ms AS n_ts, s.value AS n_v
  FROM grid g ASOF LEFT JOIN samples s
    ON g.user_id = s.user_id AND g.eval_ms <= s.ts_ms
)
SELECT p.user_id, p.eval_ms,
       round(CASE WHEN p.eval_ms = p.p_ts THEN p.p_v
                  ELSE p.p_v + (n.n_v - p.p_v)
                        * (p.eval_ms - p.p_ts) / nullif(n.n_ts - p.p_ts, 0)
             END, 6) AS value
FROM prev p JOIN nxt n USING (user_id, eval_ms)
ORDER BY user_id, eval_ms
"""

QUERIES["ph_gap_fill_linear"] = ph_gap_fill_linear
ORACLES["ph_gap_fill_linear"] = PH_GAP_FILL_SQL


def ph_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL holt_winters(0.3, 0.1) per (series, 6 h window): the
    sequential smoothing recurrence as a JVM array fold; the oracle replays
    the identical recurrence through a DuckDB RECURSIVE CTE — an
    independent sequential mechanism."""
    from promhouse_spark.operators.promql_lite import holt_winters

    step = 6 * 3600 * 1000
    return (
        holt_winters(_samples(spark, sf_dir), sf=0.3, tf=0.1, step_ms=step)
        .select(
            F.col("fingerprint").alias("user_id"),
            "window_start_ms",
            "smoothed",
            "n_samples",
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_HOLT_WINTERS_SQL = """
WITH RECURSIVE vals AS (
  SELECT user_id,
         (epoch_ms(ts) // 21600000) * 21600000 AS w,
         row_number() OVER (PARTITION BY user_id, (epoch_ms(ts) // 21600000) * 21600000
                            ORDER BY epoch_ms(ts), value) AS i,
         value
  FROM events
),
counts AS (SELECT user_id AS cu, w AS cw, max(i) AS n FROM vals GROUP BY 1, 2),
hw AS (
  SELECT v2.user_id, v2.w, 2 AS i, v2.value AS s, v2.value - v1.value AS b
  FROM vals v1 JOIN vals v2 ON v1.user_id = v2.user_id AND v1.w = v2.w
  WHERE v1.i = 1 AND v2.i = 2
  UNION ALL
  SELECT hw.user_id, hw.w, hw.i + 1,
         0.3 * v.value + 0.7 * (hw.s + hw.b),
         0.1 * ((0.3 * v.value + 0.7 * (hw.s + hw.b)) - hw.s) + 0.9 * hw.b
  FROM hw JOIN vals v ON v.user_id = hw.user_id AND v.w = hw.w AND v.i = hw.i + 1
)
SELECT hw.user_id, hw.w AS window_start_ms, round(hw.s, 6) AS smoothed,
       CAST(c.n AS BIGINT) AS n_samples
FROM hw JOIN counts c ON hw.user_id = c.cu AND hw.w = c.cw AND hw.i = c.n
ORDER BY user_id, window_start_ms
"""

QUERIES["ph_holt_winters"] = ph_holt_winters
ORACLES["ph_holt_winters"] = PH_HOLT_WINTERS_SQL


def ph_alert_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alerting-rule replay: maximal value > 90 runs per series that held
    for at least 12 h (operators/promql_lite.py:alert_intervals) — the
    batch form of `expr > 90 FOR 12h`."""
    from promhouse_spark.operators.promql_lite import alert_intervals

    return (
        alert_intervals(_samples(spark, sf_dir), threshold=90.0, for_ms=12 * 3600 * 1000)
        .select(
            F.col("fingerprint").alias("user_id"),
            "start_ms",
            "end_ms",
            "n_samples",
        )
        .orderBy("user_id", "start_ms")
    )


PH_ALERT_INTERVALS_SQL = """
WITH flagged AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value > 90 AS ok,
         sum(CASE WHEN value > 90 THEN 0 ELSE 1 END)
           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), value
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM events
)
SELECT user_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
       CAST(count(*) AS BIGINT) AS n_samples
FROM flagged WHERE ok
GROUP BY user_id, grp
HAVING max(ts_ms) - min(ts_ms) >= 43200000
ORDER BY user_id, start_ms
"""

QUERIES["ph_alert_intervals"] = ph_alert_intervals
ORACLES["ph_alert_intervals"] = PH_ALERT_INTERVALS_SQL


def ph_label_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL label_replace + label_join over a real MapType labels frame:
    series labels built from the events stream, shard extracted from the
    user id's first digit (full-match capture), uid_type joined from two
    labels — rolled up per shard (functions/labels.py:label_replace/
    label_join)."""
    from promhouse_spark.functions.labels import label_join, label_replace

    ev = load_table(spark, sf_dir, "events")
    series = ev.select(
        F.create_map(
            F.lit("__name__"), F.lit("events"),
            F.lit("user"), F.col("user_id").cast("string"),
            F.lit("type"), F.col("event_type"),
        ).alias("labels")
    )
    relabeled = series.select(
        label_join(
            label_replace("labels", "shard", "$1", "user", "([0-9])[0-9]*"),
            "uid_type", "-", "user", "type",
        ).alias("labels")
    )
    return (
        relabeled.select(
            F.element_at("labels", "shard").alias("shard"),
            F.element_at("labels", "uid_type").alias("uid_type"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_series"),
            F.countDistinct("uid_type").cast("long").alias("n_uid_types"),
        )
        .orderBy("shard")
    )


PH_LABEL_OPS_SQL = """
SELECT substring(CAST(user_id AS VARCHAR), 1, 1) AS shard,
       CAST(count(*) AS BIGINT) AS n_series,
       CAST(count(DISTINCT CAST(user_id AS VARCHAR) || '-' || event_type) AS BIGINT)
         AS n_uid_types
FROM events
GROUP BY 1
ORDER BY shard
"""

QUERIES["ph_label_ops"] = ph_label_ops
ORACLES["ph_label_ops"] = PH_LABEL_OPS_SQL


def ph_rate_extrapolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus's real rate()/increase() — boundary extrapolation with
    the 1.1×-average-interval guard and the zero-crossing clamp
    (operators/promql_lite.py:rate_extrapolated), per 6 h window.

    The rate is surfaced in exact fixed-point (1e-12/s units, BIGINT):
    rounding a float quotient proved engine-unstable at sf0.1 — the two
    engines' round(x, 6) emit nearest-doubles one ulp apart, and dividing
    those straddles an 8-dp rounding midpoint. Integer DIV on the micro
    increase is deterministic on both sides."""
    from promhouse_spark.operators.promql_lite import rate_extrapolated

    step = 6 * 3600 * 1000
    inc6 = F.round(F.col("increase_extrapolated") * 1_000_000).cast("long")
    return (
        rate_extrapolated(_samples(spark, sf_dir), step_ms=step)
        .withColumn("inc6", inc6)
        .select(
            F.col("fingerprint").alias("user_id"),
            "window_start_ms",
            "increase_extrapolated",
            F.expr("CAST((inc6 * 1000000) DIV 21600 AS BIGINT)").alias("rate_e12"),
            "n_samples",
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_RATE_EXTRAPOLATED_SQL = """
WITH base AS (
  SELECT user_id,
         (epoch_ms(ts) // 21600000) * 21600000 AS w,
         epoch_ms(ts) AS ts_ms, value,
         lag(value) OVER (PARTITION BY user_id, (epoch_ms(ts) // 21600000) * 21600000
                          ORDER BY epoch_ms(ts), value) AS prev
  FROM events
),
agg AS (
  SELECT user_id, w,
         sum(CASE WHEN prev IS NULL THEN 0.0
                  WHEN value >= prev THEN value - prev
                  ELSE value END) AS delta,
         min(ts_ms) AS first_ts, max(ts_ms) AS last_ts,
         (min({'t': ts_ms, 'v': value})).v AS first_v,
         count(*) AS n
  FROM base
  GROUP BY user_id, w
  HAVING count(*) >= 2 AND max(ts_ms) > min(ts_ms)
),
ext AS (
  SELECT user_id, w, delta, n,
         CAST(last_ts - first_ts AS DOUBLE) AS sampled,
         CAST(last_ts - first_ts AS DOUBLE) / (n - 1) AS avg_iv,
         CAST(first_ts - w AS DOUBLE) AS to_start,
         CAST(w + 21600000 - last_ts AS DOUBLE) AS to_end,
         first_v
  FROM agg
),
zeroed AS (
  -- Prometheus clamps durationToStart with durationToZero BEFORE the
  -- 1.1x-average-interval threshold check (promql/functions.go
  -- extrapolatedRate); mirror that ordering exactly
  SELECT user_id, w, delta, n, sampled, avg_iv, to_end,
         CASE WHEN delta > 0 AND first_v >= 0
               AND sampled * (first_v / nullif(delta, 0.0)) < to_start
              THEN sampled * (first_v / nullif(delta, 0.0))
              ELSE to_start
         END AS to_start_c
  FROM ext
),
capped AS (
  SELECT user_id, w, delta, n, sampled,
         CASE WHEN to_start_c >= avg_iv * 1.1 THEN avg_iv / 2 ELSE to_start_c END AS head,
         CASE WHEN to_end >= avg_iv * 1.1 THEN avg_iv / 2 ELSE to_end END AS tail
  FROM zeroed
)
SELECT user_id, window_start_ms, increase_extrapolated,
       (CAST(round(increase_extrapolated * 1000000) AS BIGINT) * 1000000) // 21600
         AS rate_e12,
       n_samples
FROM (
  SELECT user_id, w AS window_start_ms,
         round(delta * (sampled + head + tail) / sampled, 6) AS increase_extrapolated,
         CAST(n AS BIGINT) AS n_samples
  FROM capped
)
ORDER BY user_id, window_start_ms
"""

QUERIES["ph_rate_extrapolated"] = ph_rate_extrapolated
ORACLES["ph_rate_extrapolated"] = PH_RATE_EXTRAPOLATED_SQL


def ph_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average vs the plain mean per (series, 6 h
    window) (operators/promql_lite.py:time_weighted_avg) — the
    irregular-sampling average billing/SLO rollups need."""
    from promhouse_spark.operators.promql_lite import time_weighted_avg

    step = 6 * 3600 * 1000
    return (
        time_weighted_avg(_samples(spark, sf_dir), step_ms=step)
        .select(
            F.col("fingerprint").alias("user_id"),
            "window_start_ms",
            "twa",
            "plain_avg",
            "n_samples",
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_TWA_SQL = """
WITH base AS (
  SELECT user_id,
         (epoch_ms(ts) // 21600000) * 21600000 AS w,
         epoch_ms(ts) AS ts_ms, value,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id, (epoch_ms(ts) // 21600000) * 21600000
                                  ORDER BY epoch_ms(ts), value) AS next_ts
  FROM events
),
seg AS (
  SELECT user_id, w, value,
         CAST(coalesce(next_ts, w + 21600000) - ts_ms AS DOUBLE) AS dur
  FROM base
)
SELECT user_id, w AS window_start_ms,
       round(sum(value * dur) / sum(dur), 6) AS twa,
       round(avg(value), 6) AS plain_avg,
       CAST(count(*) AS BIGINT) AS n_samples
FROM seg
GROUP BY user_id, w
ORDER BY user_id, window_start_ms
"""

QUERIES["ph_time_weighted_avg"] = ph_time_weighted_avg
ORACLES["ph_time_weighted_avg"] = PH_TWA_SQL


def ph_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL count_values(), windowed per 6 h: the discrete value
    histogram, over integer-bucketed values (raw doubles are near-unique,
    so the wrapper rounds to whole units first — the build-info/version
    counting shape)."""
    from promhouse_spark.operators.promql_lite import count_values

    step = 6 * 3600 * 1000
    s = _samples(spark, sf_dir).withColumn("value", F.round("value", 0))
    return (
        count_values(s, step_ms=step)
        .select("window_start_ms", "value", "n")
        .orderBy("window_start_ms", "value")
    )


PH_COUNT_VALUES_SQL = """
SELECT (epoch_ms(ts) // 21600000) * 21600000 AS window_start_ms,
       round(value, 0) AS value,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
ORDER BY window_start_ms, value
"""


def ph_absent_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL absent_over_time over a 2-day hourly grid: (series, hour)
    pairs with NO sample — the scrape-loss report, as a grid anti-join."""
    from promhouse_spark.operators.promql_lite import absent_over_time

    return (
        absent_over_time(
            _samples(spark, sf_dir), _START_MS, _END_MS, _STEP_MS
        )
        .select(
            F.col("fingerprint").alias("user_id"), "window_start_ms", "absent"
        )
        .orderBy("user_id", "window_start_ms")
    )


PH_ABSENT_SQL = f"""
WITH grid AS (
  SELECT u.user_id, g.w
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (
    SELECT unnest(generate_series({_START_MS}, {_END_MS} - 1, {_STEP_MS})) AS w
  ) g
),
present AS (
  SELECT DISTINCT user_id, (epoch_ms(ts) // {_STEP_MS}) * {_STEP_MS} AS w
  FROM events
  WHERE epoch_ms(ts) >= {_START_MS} AND epoch_ms(ts) < {_END_MS}
)
SELECT g.user_id, g.w AS window_start_ms, CAST(1 AS BIGINT) AS absent
FROM grid g ANTI JOIN present p ON g.user_id = p.user_id AND g.w = p.w
ORDER BY g.user_id, window_start_ms
"""

QUERIES["ph_count_values"] = ph_count_values
QUERIES["ph_absent_over_time"] = ph_absent_over_time
ORACLES["ph_count_values"] = PH_COUNT_VALUES_SQL
ORACLES["ph_absent_over_time"] = PH_ABSENT_SQL
