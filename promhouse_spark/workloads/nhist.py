"""Native-histogram query family (operators/nativehist.py): exponential
bucket sketches BUILT from the raw events stream, merged across windows,
and queried for quantiles / fractions / moments — every step DuckDB-
oracle-paired because the schema-0-over-cents bucket index is exact
integer arithmetic (length(bin(cents-1))) in both engines.

At 100 TB this family is the pre-aggregation tier: daily histograms per
group are a keyed agg over raw observations (map-side combinable);
every later quantile query folds a few dozen bucket rows per group
instead of re-scanning the fact table — the same reason Prometheus
native histograms exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.operators.nativehist import (
    hist_build,
    hist_fraction,
    hist_merge,
    hist_quantile,
    hist_quantiles,
    hist_stats,
)
from promhouse_spark.session import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DAY = "strftime(date_trunc('day', ts), '%Y-%m-%d')"
_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"
_IDX_SQL = "CASE WHEN cents <= 1 THEN 0 ELSE length(bin(cents - 1)) END"


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hist_build(
        ev,
        "value",
        by=["event_type"],
        window_col=F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd"),
        window_name="day",
    )


def nhist_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily histogram tier itself, exploded to scalar rows for the
    hash compare: (event_type, day, idx, cnt) plus the per-histogram
    totals repeated on each row."""
    h = _daily(spark, sf_dir)
    return (
        h.select(
            "event_type",
            "day",
            "zero_count",
            F.col("count").alias("obs_count"),
            "sum_cents",
            F.explode("buckets").alias("b"),
        )
        .select(
            "event_type",
            "day",
            F.col("b.idx").alias("idx"),
            F.col("b.cnt").alias("cnt"),
            "zero_count",
            "obs_count",
            "sum_cents",
        )
        .orderBy("event_type", "day", "idx")
    )


NHIST_BUCKETS_SQL = f"""
WITH c AS (
  SELECT event_type, {_DAY} AS day, {_CENTS_SQL} AS cents FROM events
),
b AS (
  SELECT event_type, day, {_IDX_SQL} AS idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c WHERE cents > 0 GROUP BY 1, 2, 3
),
t AS (
  SELECT event_type, day,
         CAST(sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_count,
         CAST(count(*) AS BIGINT) AS obs_count,
         CAST(sum(CASE WHEN cents > 0 THEN cents ELSE 0 END) AS BIGINT)
           AS sum_cents
  FROM c GROUP BY 1, 2
)
SELECT b.event_type, b.day, CAST(b.idx AS INTEGER) AS idx, b.cnt,
       t.zero_count, t.obs_count, t.sum_cents
FROM b JOIN t ON b.event_type = t.event_type AND b.day = t.day
ORDER BY b.event_type, b.day, idx
"""


def nhist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per event type, computed from the
    MERGED daily histograms (never the raw observations — the sketch
    answers the quantile)."""
    # one pass for all three φ (hist_quantiles) over a localCheckpoint of
    # the daily sketch tier: the tier is tiny (types × days histogram
    # rows) but its lineage is the full events aggregation, which
    # hist_merge's two consumers (per-idx buckets + totals) would
    # otherwise each re-execute — 6 daily-tier executions per run before,
    # 1 after (r11; plan: 44 Exchange nodes → 8, results bit-identical)
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    merged = hist_merge(daily, by=["event_type"])
    return (
        hist_quantiles(merged, [0.5, 0.9, 0.99], by=["event_type"])
        .select(
            "event_type",
            "q",
            F.round("quantile_value", 4).alias("quantile_value"),
        )
        .orderBy("event_type", "q")
    )


NHIST_QUANTILE_SQL = f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS cents FROM events
),
b AS (
  SELECT event_type, {_IDX_SQL} AS idx, count(*) AS cnt
  FROM c WHERE cents > 0 GROUP BY 1, 2
),
t AS (
  SELECT event_type,
         sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS zero_count,
         count(*) AS total
  FROM c GROUP BY 1
),
qs AS (
  SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                 CAST(0.99 AS DOUBLE)]) AS q
),
cum AS (
  SELECT b.event_type, qs.q, b.idx, b.cnt,
         t.zero_count + sum(b.cnt) OVER (
           PARTITION BY b.event_type, qs.q ORDER BY b.idx
         ) AS cum,
         qs.q * t.total AS rank
  FROM b CROSS JOIN qs JOIN t ON b.event_type = t.event_type
),
hit AS (
  SELECT *, row_number() OVER (
           PARTITION BY event_type, q ORDER BY idx
         ) AS rn
  FROM cum WHERE cum >= rank
)
SELECT event_type, q,
       round(
         CASE WHEN rank <= cum - cnt THEN 0.0
              ELSE (CASE WHEN idx = 0 THEN 0.0 ELSE power(2, idx - 1) END
                    + (power(2, idx)
                       - CASE WHEN idx = 0 THEN 0.0 ELSE power(2, idx - 1) END)
                      * (rank - (cum - cnt)) / cnt)
         END / 100.0, 4) AS quantile_value
FROM hit WHERE rn = 1
ORDER BY event_type, q
"""


def nhist_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated fraction of event values in (10, 100] dollars per event
    type, interpolated within the boundary buckets of the merged
    histograms."""
    # checkpoint the tiny daily sketch tier so hist_merge's two consumers
    # (bucket merge + totals) don't each re-execute the events aggregation
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    merged = hist_merge(daily, by=["event_type"])
    return (
        hist_fraction(merged, 10.0, 100.0, by=["event_type"])
        .select("event_type", F.round("fraction", 4).alias("fraction"))
        .orderBy("event_type")
    )


NHIST_FRACTION_SQL = f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS cents FROM events
),
b AS (
  SELECT event_type, {_IDX_SQL} AS idx, count(*) AS cnt
  FROM c WHERE cents > 0 GROUP BY 1, 2
),
t AS (
  SELECT event_type,
         sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS zero_count,
         count(*) AS total
  FROM c GROUP BY 1
),
contrib AS (
  SELECT b.event_type,
         sum(b.cnt * least(greatest(
           (10000.0 - CASE WHEN b.idx = 0 THEN 0.0
                           ELSE power(2, b.idx - 1) END)
           / (power(2, b.idx) - CASE WHEN b.idx = 0 THEN 0.0
                                     ELSE power(2, b.idx - 1) END),
           0.0), 1.0)) AS fhi,
         sum(b.cnt * least(greatest(
           (1000.0 - CASE WHEN b.idx = 0 THEN 0.0
                          ELSE power(2, b.idx - 1) END)
           / (power(2, b.idx) - CASE WHEN b.idx = 0 THEN 0.0
                                     ELSE power(2, b.idx - 1) END),
           0.0), 1.0)) AS flo
  FROM b GROUP BY 1
)
SELECT t.event_type,
       round(((coalesce(c2.fhi, 0) + t.zero_count)
              - (coalesce(c2.flo, 0) + t.zero_count)) / t.total, 4)
         AS fraction
FROM t LEFT JOIN contrib c2 ON t.event_type = c2.event_type
WHERE t.total > 0
ORDER BY t.event_type
"""


def nhist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_count / histogram_sum / histogram_avg over the merged
    tier — avg as floored integer cents (exact in both engines)."""
    # checkpoint the tiny daily sketch tier so hist_merge's two consumers
    # (bucket merge + totals) don't each re-execute the events aggregation
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    merged = hist_merge(daily, by=["event_type"])
    return hist_stats(merged, by=["event_type"]).orderBy("event_type")


NHIST_STATS_SQL = f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS cents FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS obs_count,
       CAST(sum(CASE WHEN cents > 0 THEN cents ELSE 0 END) AS BIGINT)
         AS sum_cents,
       CAST(sum(CASE WHEN cents > 0 THEN cents ELSE 0 END)
            // count(*) AS BIGINT) AS avg_cents
FROM c GROUP BY 1
ORDER BY event_type
"""


QUERIES.update(
    {
        "nhist_buckets": nhist_buckets,
        "nhist_quantile": nhist_quantile,
        "nhist_fraction": nhist_fraction,
        "nhist_stats": nhist_stats,
    }
)
ORACLES.update(
    {
        "nhist_buckets": NHIST_BUCKETS_SQL,
        "nhist_quantile": NHIST_QUANTILE_SQL,
        "nhist_fraction": NHIST_FRACTION_SQL,
        "nhist_stats": NHIST_STATS_SQL,
    }
)
