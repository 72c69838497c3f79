"""Round-8 query family: the served-API read shapes added this round,
oracle-paired on the events table.

- ``ph_exemplar_topk``: exemplar-reservoir selection — per (series, day)
  keep the top-2 observations by value with their trace annotation, the
  retention policy behind the exemplar tier (edge/http.py
  query_exemplars; storage/parquet.py read_exemplars).
- ``ph_federate_latest``: the /federate read — latest sample per series
  within the staleness window at a fixed instant, ONE keyed max_by over
  the date-pruned scan (edge/http.py federate).
- ``nhist_wire_sum_quantile``: the native-histogram aggregation path —
  per-group cents histograms (hist_build) lifted to wire shape
  (hist_to_wire), merged across groups per day (wire_hist_sum: the
  ``sum(h)`` engine aggregation), then the wire quantile
  (wire_hist_quantile). The DuckDB oracle builds per-day histograms
  DIRECTLY from observations — a genuinely independent mechanism, so a
  hash match validates that merge-of-partials ≡ single-level build, the
  property the 100 TB rollup tier rests on.
- ``nhist_wire_moments``: wire_hist_moments (histogram_count/sum/avg/
  stddev engine functions) over the same merged frame, geometric-
  midpoint variance replayed in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.operators.nativehist import (
    hist_build,
    hist_to_wire,
    wire_hist_moments,
    wire_hist_quantile,
    wire_hist_sum,
)
from promhouse_spark.session import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DAY = "strftime(date_trunc('day', ts), '%Y-%m-%d')"
_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"
_IDX_SQL = "CASE WHEN cents <= 1 THEN 0 ELSE length(bin(cents - 1)) END"

# /federate evaluation instant + staleness window (events span Jan 2024)
_FED_T_MS = 1_705_000_000_000  # 2024-01-11T19:06:40Z
_FED_LOOKBACK_MS = 6 * 3600 * 1000


def ph_exemplar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 observations per (user, day) by value with trace ids — the
    exemplar-reservoir retention shape behind query_exemplars."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value"),
        F.lower(F.hex("event_id")).alias("trace_id"),
    )
    w = W.partitionBy("user_id", "day").orderBy(
        F.col("value").desc(), F.col("ts_ms").desc(), F.col("trace_id")
    )
    return (
        base.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 2)
        .select(
            "user_id", "day", "rn", "trace_id",
            F.round("value", 4).alias("value"), "ts_ms",
        )
        .orderBy("user_id", "day", "rn")
    )


PH_EXEMPLAR_TOPK_SQL = """
SELECT user_id, day, rn, trace_id, round(value, 4) AS value, ts_ms
FROM (
  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         epoch_ms(ts) AS ts_ms, value, lower(hex(event_id)) AS trace_id,
         CAST(row_number() OVER (
           PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY value DESC, epoch_ms(ts) DESC, lower(hex(event_id))
         ) AS BIGINT) AS rn
  FROM events
) WHERE rn <= 2
ORDER BY user_id, day, rn
"""


def ph_federate_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The /federate read: latest sample per series within the lookback
    at a fixed instant — one keyed max_by, no window over the facts."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "value"
    ).filter(
        (F.col("ts_ms") >= _FED_T_MS - _FED_LOOKBACK_MS)
        & (F.col("ts_ms") <= _FED_T_MS)
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts_ms", "value"),
                # ties on ts resolve to the larger value, deterministically
                F.struct("ts_ms", "value"),
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.ts_ms").alias("ts_ms"),
            F.round("s.value", 6).alias("value"),
        )
        .orderBy("user_id")
    )


PH_FEDERATE_LATEST_SQL = f"""
SELECT user_id, ts_ms, round(value, 6) AS value
FROM (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, value DESC
         ) AS rn
  FROM events
  WHERE epoch_ms(ts) >= {_FED_T_MS - _FED_LOOKBACK_MS}
    AND epoch_ms(ts) <= {_FED_T_MS}
) WHERE rn = 1
ORDER BY user_id
"""


def _merged_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type daily cents histograms → wire shape → merged across
    event types per day (the sum(h) engine path)."""
    ev = load_table(spark, sf_dir, "events")
    daily = hist_build(
        ev,
        "value",
        by=["event_type"],
        window_col=F.unix_millis(F.date_trunc("day", F.col("ts"))),
        window_name="day_ms",
    )
    # the wire-shape daily tier is tiny (types × days rows) but its
    # lineage is the full events aggregation; wire_hist_sum consumes its
    # input twice (group targets + bucket regroup, joined) — checkpoint
    # so the events scan+agg runs once per query, not twice (r11)
    wire = hist_to_wire(daily, {}, F.col("day_ms")).localCheckpoint(eager=True)
    return wire_hist_sum(wire)


def nhist_wire_sum_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = _merged_wire(spark, sf_dir)
    q = wire_hist_quantile(merged, 0.5)
    return q.select(
        F.date_format(
            F.timestamp_millis(F.col("timestamp_ms")), "yyyy-MM-dd"
        ).alias("day"),
        F.round(F.col("quantile_value") / 100.0, 4).alias("p50_dollars"),
    ).orderBy("day")


NHIST_WIRE_SUM_QUANTILE_SQL = f"""
WITH c AS (
  SELECT {_DAY} AS day, {_CENTS_SQL} AS cents FROM events
),
b AS (
  SELECT day, {_IDX_SQL} AS idx, CAST(count(*) AS DOUBLE) AS cnt
  FROM c WHERE cents > 0 GROUP BY 1, 2
),
t AS (
  SELECT day, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS DOUBLE) AS z
  FROM c GROUP BY 1
),
segs AS (
  -- value-order segments: the zero bucket [-0.5, 0.5] first (ord 0),
  -- then positive buckets (2^(idx-1), 2^idx] ascending (ord 1)
  SELECT day, 0 AS ord, 0 AS idx, z AS cnt, -0.5 AS lo, 0.5 AS hi FROM t
  UNION ALL
  SELECT day, 1 AS ord, idx, cnt,
         power(2.0, idx - 1) AS lo, power(2.0, idx) AS hi
  FROM b
),
cum AS (
  SELECT s.*, t.n, 0.5 * t.n AS rank,
         sum(s.cnt) OVER (
           PARTITION BY s.day ORDER BY s.ord, s.idx
         ) AS cum
  FROM segs s JOIN t USING (day)
),
hit AS (
  SELECT *, row_number() OVER (
           PARTITION BY day ORDER BY ord, idx
         ) AS rn
  FROM cum WHERE cum >= rank AND n > 0
)
SELECT day,
       round((lo + (hi - lo) * (rank - (cum - cnt)) / cnt) / 100.0, 4)
         AS p50_dollars
FROM hit WHERE rn = 1
ORDER BY day
"""


def nhist_wire_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = _merged_wire(spark, sf_dir)
    m = wire_hist_moments(merged)
    return m.select(
        F.date_format(
            F.timestamp_millis(F.col("timestamp_ms")), "yyyy-MM-dd"
        ).alias("day"),
        F.col("count_value").cast("long").alias("obs"),
        F.round(F.col("avg_value") / 100.0, 4).alias("avg_dollars"),
        F.round(F.col("stddev_value") / 100.0, 4).alias("stddev_dollars"),
    ).orderBy("day")


NHIST_WIRE_MOMENTS_SQL = f"""
WITH c AS (
  SELECT {_DAY} AS day, {_CENTS_SQL} AS cents FROM events
),
b AS (
  SELECT day, {_IDX_SQL} AS idx, CAST(count(*) AS DOUBLE) AS cnt
  FROM c WHERE cents > 0 GROUP BY 1, 2
),
t AS (
  SELECT day, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS DOUBLE) AS z,
         CAST(sum(CASE WHEN cents > 0 THEN cents ELSE 0 END) AS DOUBLE)
           AS sum_cents
  FROM c GROUP BY 1
),
-- geometric-midpoint variance: bucket mass at 2^(idx-1/2) cents, the
-- zero bucket's at 0, against the exact mean sum/count
v AS (
  SELECT b.day,
         sum(b.cnt * power(power(2.0, b.idx - 0.5) - t.sum_cents / t.n, 2))
           AS acc
  FROM b JOIN t USING (day) GROUP BY 1
)
SELECT t.day, CAST(t.n AS BIGINT) AS obs,
       round(t.sum_cents / t.n / 100.0, 4) AS avg_dollars,
       round(
         sqrt((coalesce(v.acc, 0) + t.z * power(0 - t.sum_cents / t.n, 2))
              / t.n) / 100.0, 4) AS stddev_dollars
FROM t LEFT JOIN v USING (day)
ORDER BY day
"""


QUERIES["ph_exemplar_topk"] = ph_exemplar_topk
ORACLES["ph_exemplar_topk"] = PH_EXEMPLAR_TOPK_SQL
QUERIES["ph_federate_latest"] = ph_federate_latest
ORACLES["ph_federate_latest"] = PH_FEDERATE_LATEST_SQL
QUERIES["nhist_wire_sum_quantile"] = nhist_wire_sum_quantile
ORACLES["nhist_wire_sum_quantile"] = NHIST_WIRE_SUM_QUANTILE_SQL
QUERIES["nhist_wire_moments"] = nhist_wire_moments
ORACLES["nhist_wire_moments"] = NHIST_WIRE_MOMENTS_SQL


def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher rule-set signal vector per document
    (operators/text.gopher_signals) — every signal hash-compared, plus
    the composite verdict. One projection over the corpus; at 100 TB
    this is a scan-time filter, no shuffle."""
    from promhouse_spark.operators.text import gopher_signals

    docs = load_table(spark, sf_dir, "documents")
    return gopher_signals(docs).orderBy("doc_id")


DOC_GOPHER_QUALITY_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'),
                     x -> length(x) > 0) AS words,
         list_filter(string_split(text, chr(10)),
                     l -> length(trim(l)) > 0) AS lines,
         list_filter(string_split_regex(text, '\n\n+'),
                     p -> length(trim(p)) > 0) AS paras
  FROM documents
),
s AS (
  SELECT doc_id,
    len(words) AS n_words,
    round(list_aggregate(list_transform(words, x -> length(x)), 'sum')
          * 1.0 / len(words), 6) AS mean_word_len,
    round(((length(text) - length(replace(text, '#', '')))
           + CAST(floor((length(text) - length(replace(text, '...', '')))
                        / 3.0) AS INT))
          * 1.0 / len(words), 6) AS symbol_ratio,
    round(len(list_filter(lines, l ->
            starts_with(trim(l), '- ') OR starts_with(trim(l), '* ')
            OR starts_with(trim(l), '•')))
          * 1.0 / len(lines), 6) AS bullet_line_frac,
    round(len(list_filter(lines, l -> ends_with(trim(l), '...')))
          * 1.0 / len(lines), 6) AS ellipsis_line_frac,
    round(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
          * 1.0 / len(words), 6) AS alpha_word_frac,
    len(list_filter(['the','be','to','of','and','that','have','with'],
        s -> list_contains(list_transform(words, x -> lower(x)), s)))
      AS stop_hits,
    round((len(lines) - len(list_distinct(lines))) * 1.0 / len(lines), 6)
      AS dup_line_frac,
    round((len(paras) - len(list_distinct(paras))) * 1.0 / len(paras), 6)
      AS dup_para_frac,
    round((list_aggregate(list_transform(lines, l -> length(l)), 'sum')
           - list_aggregate(list_transform(list_distinct(lines),
                                           l -> length(l)), 'sum'))
          * 1.0
          / list_aggregate(list_transform(lines, l -> length(l)), 'sum'), 6)
      AS dup_line_char_frac
  FROM w
)
SELECT *,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3 AND 10
        AND symbol_ratio <= 0.1
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8
        AND stop_hits >= 2
        AND dup_line_frac <= 0.3
        AND dup_para_frac <= 0.3
        AND dup_line_char_frac <= 0.2) AS gopher_pass
FROM s
ORDER BY doc_id
"""


QUERIES["doc_gopher_quality"] = doc_gopher_quality
ORACLES["doc_gopher_quality"] = DOC_GOPHER_QUALITY_SQL


def doc_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split assignment (operators/sampling.py
    cluster_safe_split): exact-duplicate clusters (star edges to the
    text-group minimum) run through the REAL iterative
    connected-components operator, then every document buckets by its
    cluster representative. The DuckDB oracle computes the representative
    as a window MIN over the text hash — an independent, non-iterative
    mechanism — so the hash match validates the component fixpoint AND
    the split algebra."""
    from promhouse_spark.operators.sampling import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents")
    groups = docs.select(
        "doc_id", F.md5("text").alias("__h")
    )
    star = (
        groups.groupBy("__h")
        .agg(F.min("doc_id").alias("doc_a"), F.collect_list("doc_id").alias("all"))
        .select("doc_a", F.explode("all").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    out = cluster_safe_split(docs.select("doc_id"), star)
    return out.select("doc_id", "rep", "split").orderBy("doc_id")


DOC_CLUSTER_SAFE_SPLIT_SQL = """
WITH g AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
  FROM documents
),
b AS (
  SELECT doc_id, rep,
         ((rep * 1103515245 + 12345) % 2147483648) / 2147483648.0 AS bucket
  FROM g
)
SELECT doc_id, rep,
       CASE WHEN bucket < 0.8 THEN 'train'
            WHEN bucket < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id
"""


QUERIES["doc_cluster_safe_split"] = doc_cluster_safe_split
ORACLES["doc_cluster_safe_split"] = DOC_CLUSTER_SAFE_SPLIT_SQL
