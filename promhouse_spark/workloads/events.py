"""PromHouse operator inventory (SURVEY §2) exercised over the driver's
``events`` stream table.

``events`` plays the ``samples`` role (``ts``/``value`` with ``user_id`` as
the series key) and ``props``/``event_type`` play the label payload — so the
reference's matcher filters (F1), time-range predicates (F2), semi/anti join
strategies (J1-J5), group-into-series (A1), cardinality analytics (A4),
top-k (T5), downsampling (C4, the reference's #1 roadmap item,
``README.md:71``) and raw-SQL passthrough (O7) each get a DuckDB-checkable
incarnation at driver scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from promhouse_spark.session import load_table

def _ts_us():
    return F.unix_micros(F.col("ts"))


def ph_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: inclusive time-range scan (clickhouse.go:285-291 shape)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            _ts_us().alias("ts_us"),
            F.round("value", 2).alias("value"),
        )
        .orderBy("event_id")
    )


PH_TIME_RANGE_SQL = """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, round(value, 2) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
ORDER BY event_id
"""


def ph_matcher_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 equality matcher against the JSON label payload (the reference's
    ``visitParamExtractString(labels, k)`` analytics pattern,
    README.md:85-87), absent ≡ '' via coalesce."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k"), F.lit(""))
    return (
        ev.filter((k == "42") & (F.col("event_type") == "click"))
        .select("event_id", "user_id", k.alias("k"))
        .orderBy("event_id")
    )


PH_MATCHER_EQ_SQL = """
SELECT event_id, user_id, coalesce(json_extract_string(props, '$.k'), '') AS k
FROM events
WHERE coalesce(json_extract_string(props, '$.k'), '') = '42' AND event_type = 'click'
ORDER BY event_id
"""


def ph_matcher_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 fully-anchored regex matcher (base.go:103: ``^(?:v)$``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").rlike("^(?:(click|view))$"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_type")
    )


PH_MATCHER_REGEX_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
WHERE regexp_full_match(event_type, '(?:(click|view))')
GROUP BY event_type
ORDER BY event_type
"""


def ph_matcher_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3: matcher on an absent label — ``{missing=""}`` must select all
    rows (absent ≡ empty string, base.go:90), ``{missing!=""}`` none."""
    ev = load_table(spark, sf_dir, "events")
    missing = F.coalesce(F.get_json_object("props", "$.missing"), F.lit(""))
    return (
        ev.filter(missing == "")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


PH_MATCHER_ABSENT_SQL = """
SELECT event_type, count(*) AS n
FROM events
WHERE coalesce(json_extract_string(props, '$.missing'), '') = ''
GROUP BY event_type
ORDER BY event_type
"""


def ph_series_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (flat form): fold samples into per-series stats — count, time
    bounds, first/last value by time (the sort-based series cut of
    clickhouse.go:235-280, summarized SQL-comparably)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.min(_ts_us()).alias("min_ts_us"),
            F.max(_ts_us()).alias("max_ts_us"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min_by("value", F.col("ts")), 2).alias("first_value"),
            F.round(F.max_by("value", F.col("ts")), 2).alias("last_value"),
        )
        .orderBy("user_id")
    )


PH_SERIES_GROUP_SQL = """
SELECT user_id, count(*) AS n_samples,
       min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
       round(sum(value), 2) AS sum_value,
       round(min_by(value, ts), 2) AS first_value,
       round(max_by(value, ts), 2) AS last_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def ph_cardinality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/T5: cardinality analytics — the README's documented
    ``COUNT(*) GROUP BY label ORDER BY count DESC LIMIT 10``
    (README.md:79-99)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .limit(10)
    )


PH_CARDINALITY_SQL = """
SELECT event_type, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, event_type
LIMIT 10
"""


def ph_semijoin_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: tiny series set → IN-list literal pushdown
    (``WHERE fingerprint IN (...)``, clickhouse.go:288)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id").isin([1, 5, 7, 12, 42]))
        .select("event_id", "user_id", _ts_us().alias("ts_us"), F.round("value", 2).alias("value"))
        .orderBy("event_id")
    )


PH_SEMIJOIN_INLIST_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, round(value, 2) AS value
FROM events
WHERE user_id IN (1, 5, 7, 12, 42)
ORDER BY event_id
"""


def ph_semijoin_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3: large matched set → left-semi join against a derived key set
    (the temp-table ANY INNER JOIN, clickhouse.go:310-370). ``heavy`` scales
    linearly with SF, so no forced broadcast — AQE decides from runtime
    sizes (test_plans.py asserts the plan carries no hint)."""
    ev = load_table(spark, sf_dir, "events")
    heavy = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 10)
        .select("user_id")
    )
    return (
        ev.join(heavy, "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


PH_SEMIJOIN_SUBQUERY_SQL = """
SELECT user_id, count(*) AS n_events
FROM events
WHERE user_id IN (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  GROUP BY user_id HAVING count(*) >= 10
)
GROUP BY user_id
ORDER BY user_id
"""


def ph_top_series_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: the README's documented analytics join — top-10 series by sample
    count joined back to the registry (README.md:104-119)."""
    ev = load_table(spark, sf_dir, "events")
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(10)
    )
    return (
        ev.join(F.broadcast(top), "user_id")
        .groupBy("user_id", "n_events")
        .agg(F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy(F.desc("n_events"), "user_id")
    )


PH_TOP_SERIES_JOIN_SQL = """
WITH top AS (
  SELECT user_id, count(*) AS n_events
  FROM events GROUP BY user_id
  ORDER BY n_events DESC, user_id LIMIT 10
)
SELECT e.user_id AS user_id, t.n_events AS n_events, round(sum(e.value), 2) AS sum_value
FROM events e JOIN top t ON e.user_id = t.user_id
GROUP BY e.user_id, t.n_events
ORDER BY n_events DESC, user_id
"""


def ph_new_series_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: new-series set difference — series seen in the window that are
    absent from the "registry" built from an earlier window (the
    left-anti registry diff, clickhouse.go:437-447)."""
    ev = load_table(spark, sf_dir, "events")
    early = ev.filter(
        (F.col("event_type") == "signup")
        & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp"))
    ).select("user_id")
    return (
        ev.select("user_id")
        .distinct()
        .join(early, "user_id", "left_anti")
        .orderBy("user_id")
    )


PH_NEW_SERIES_ANTI_SQL = """
SELECT DISTINCT user_id
FROM events
WHERE user_id NOT IN (
  SELECT user_id FROM events
  WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-06 00:00:00'
)
ORDER BY user_id
"""


def ph_downsample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: tumbling-window downsampling (the reference's #1 roadmap item,
    README.md:71): 1 h buckets × event_type with count/avg/min/max."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00")
    return (
        ev.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # round(sum,2)/count: both engines collapse the sum to the same
            # double, so the division is bit-identical — no final rounding,
            # because round() implementations themselves disagree on exact
            # half-boundaries (BigDecimal-exact vs round(v*10^k)/10^k), and
            # 2-decimal inputs make avg hit .xxxx5 systematically
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("bucket", "event_type")
    )


PH_DOWNSAMPLE_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket,
       event_type,
       count(*) AS n,
       round(sum(value), 2) / count(*) AS avg_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
"""


def ph_delta_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series sample delta via a window function (the building block of
    PromQL-style rate/increase the reference leaves to Prometheus)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    return (
        ev.select("event_id", "user_id", F.round(delta, 2).alias("delta"))
        .filter(F.col("delta").isNotNull())
        .orderBy("event_id")
    )


PH_DELTA_WINDOW_SQL = """
SELECT event_id, user_id, delta FROM (
  SELECT event_id, user_id,
         round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
  FROM events
  WHERE event_type = 'click'
)
WHERE delta IS NOT NULL
ORDER BY event_id
"""


def ph_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: the raw-SQL escape hatch — SQL text executed verbatim against the
    registered views (clickhouse.go:372-388; spark.sql() here)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT cast(ts AS date) AS day, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY cast(ts AS date)
        ORDER BY day
        """
    )


PH_SQL_PASSTHROUGH_SQL = """
SELECT cast(ts AS date) AS day, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY cast(ts AS date)
ORDER BY day
"""


# one bucketed copy of the fact table per (Spark app, corpus dir): the
# bucket shuffle is paid once at write time, every query after is
# exchange-free on the bucket key
_BUCKETED_CACHE: dict[tuple[str, str], str] = {}


def ph_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A1 on a bucketed layout: the samples⋈series fingerprint join and
    the group-into-series aggregation with ZERO hash exchanges. The events
    fact table is written once per session via ``bucketBy(8, user_id)``
    (``storage/bucketed.py`` — the MergeTree-clustering analogue that also
    co-locates joins, which MergeTree cannot); both the per-user aggregate
    and the join of that aggregate back to the facts then reuse the on-disk
    hash layout. Two-pass above-the-user's-average counting — the classic
    shape that pays two fact shuffles unbucketed and none bucketed
    (plan-asserted in tests/test_bucketed.py)."""
    import os
    import re
    import tempfile

    from promhouse_spark.storage import bucketed as B

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    table = _BUCKETED_CACHE.get(key)
    if table is None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        suffix = re.sub(r"[^0-9a-z]+", "_", os.path.abspath(sf_dir).lower())
        table = f"phs_events_bucketed{suffix}"
        path = tempfile.mkdtemp(prefix="phs-bucketed-") + "/events"
        B.write_bucketed(
            ev, table, path, key="user_id", num_buckets=8,
            sort_cols=("user_id", "ts_us"),
        )
        _BUCKETED_CACHE[key] = table
    evb = spark.table(table)
    stats = evb.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count("*").cast("long").alias("n_events"),
    )
    above = (
        evb.select("user_id", "value")
        .join(stats.select("user_id", "avg_value"), "user_id")
        .filter(F.col("value") > F.col("avg_value"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_above"))
    )
    return (
        stats.join(above, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            F.coalesce("n_above", F.lit(0)).cast("long").alias("n_above_avg"),
            "avg_value",
        )
        .orderBy("user_id")
    )


PH_BUCKETED_JOIN_SQL = """
WITH stats AS (
  SELECT user_id, round(avg(value), 6) AS avg_value,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT s.user_id, s.n_events,
       CAST(coalesce(a.n_above, 0) AS BIGINT) AS n_above_avg,
       s.avg_value
FROM stats s
LEFT JOIN (
  SELECT e.user_id, count(*) AS n_above
  FROM events e JOIN stats st ON e.user_id = st.user_id
  WHERE e.value > st.avg_value
  GROUP BY e.user_id
) a ON s.user_id = a.user_id
ORDER BY s.user_id
"""


QUERIES = {
    "ph_bucketed_join": ph_bucketed_join,
    "ph_time_range": ph_time_range,
    "ph_matcher_eq": ph_matcher_eq,
    "ph_matcher_regex": ph_matcher_regex,
    "ph_matcher_absent": ph_matcher_absent,
    "ph_series_group": ph_series_group,
    "ph_cardinality_topk": ph_cardinality_topk,
    "ph_semijoin_inlist": ph_semijoin_inlist,
    "ph_semijoin_subquery": ph_semijoin_subquery,
    "ph_top_series_join": ph_top_series_join,
    "ph_new_series_anti": ph_new_series_anti,
    "ph_downsample_1h": ph_downsample_1h,
    "ph_delta_window": ph_delta_window,
    "ph_sql_passthrough": ph_sql_passthrough,
}

ORACLES = {
    "ph_bucketed_join": PH_BUCKETED_JOIN_SQL,
    "ph_time_range": PH_TIME_RANGE_SQL,
    "ph_matcher_eq": PH_MATCHER_EQ_SQL,
    "ph_matcher_regex": PH_MATCHER_REGEX_SQL,
    "ph_matcher_absent": PH_MATCHER_ABSENT_SQL,
    "ph_series_group": PH_SERIES_GROUP_SQL,
    "ph_cardinality_topk": PH_CARDINALITY_SQL,
    "ph_semijoin_inlist": PH_SEMIJOIN_INLIST_SQL,
    "ph_semijoin_subquery": PH_SEMIJOIN_SUBQUERY_SQL,
    "ph_top_series_join": PH_TOP_SERIES_JOIN_SQL,
    "ph_new_series_anti": PH_NEW_SERIES_ANTI_SQL,
    "ph_downsample_1h": PH_DOWNSAMPLE_SQL,
    "ph_delta_window": PH_DELTA_WINDOW_SQL,
    "ph_sql_passthrough": PH_SQL_PASSTHROUGH_SQL,
}
