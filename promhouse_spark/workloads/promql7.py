"""Round-8 query family (continuation): the TSDB-admin read shape.

``ph_tombstone_mask`` pins the tombstone-masking plan behind
``delete_series`` (storage/parquet.py: ``_apply_tombstones``;
plans/read.py: ``apply_tombstones`` — the SAME production function is
called here): pending delete intervals masked out of a fact scan by an
equi-keyed left-anti join with the interval test as the residual
condition. The DuckDB oracle replays it as NOT EXISTS.

The tombstone set is derived deterministically inside the query (top-3
series by sample count, the [25%, 50%] slice of the global time range)
so the oracle can re-derive it from the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.plans.read import apply_tombstones
from promhouse_spark.session import load_table


def ph_tombstone_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving per-series sample counts after a matcher+range delete —
    the read every query runs between ``delete_series`` and
    ``clean_tombstones``."""
    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        F.col("user_id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value"),
    )
    bounds = samples.agg(
        F.expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) div 4").alias("min_ms"),
        F.expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) div 2").alias("max_ms"),
    )
    top3 = (
        samples.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(3)
        .select("user_id")
    )
    tombstones = top3.crossJoin(bounds)
    surviving = apply_tombstones(
        samples, tombstones, key_col="user_id", ts_col="ts_ms"
    )
    return (
        surviving.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


PH_TOMBSTONE_MASK_SQL = """
WITH samples AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
),
bounds AS (
  SELECT min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 4 AS min_ms,
         min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 AS max_ms
  FROM samples
),
top3 AS (
  SELECT user_id FROM samples GROUP BY user_id
  ORDER BY count(*) DESC, user_id LIMIT 3
),
tomb AS (SELECT t.user_id, b.min_ms, b.max_ms FROM top3 t CROSS JOIN bounds b),
surv AS (
  SELECT s.user_id, s.value FROM samples s
  WHERE NOT EXISTS (
    SELECT 1 FROM tomb t
    WHERE t.user_id = s.user_id AND s.ts_ms BETWEEN t.min_ms AND t.max_ms
  )
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
       round(sum(value), 2) AS sum_value
FROM surv GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "ph_tombstone_mask": ph_tombstone_mask,
}

ORACLES = {
    "ph_tombstone_mask": PH_TOMBSTONE_MASK_SQL,
}
