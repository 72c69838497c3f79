"""PromQL-lite range functions over the samples model (beyond-reference).

The reference deliberately leaves PromQL evaluation to Prometheus (SURVEY
§"What PromHouse is"); these operators bring the core *range-vector*
functions server-side so rollup pipelines and the raw-SQL surface can compute
them at 100 TB without shipping raw samples out:

- ``delta_over_time``:  last - first per (series, window) — gauges;
- ``increase``:         counter-aware growth — a sample lower than its
  predecessor is a counter reset, contributing its own value (Prometheus
  semantics);
- ``rate``:             increase / window seconds.

All built-in expressions: one window function pass (lag per series) + one
keyed aggregation — map-side combinable, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from promhouse_spark.operators.downsample import window_start_ms
from promhouse_spark.schemas import FINGERPRINT, TIMESTAMP_MS, VALUE


def _per_series_window() -> W:
    return W.partitionBy(FINGERPRINT).orderBy(TIMESTAMP_MS)


def increase(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Counter increase per (fingerprint, window): sum of positive
    sample-to-sample deltas, where a drop (reset) contributes the new value.

    The lag runs over the full per-series sequence first, so a window's
    first sample correctly diffs against the previous window's last sample
    (PromQL's extrapolation is deliberately not replicated — this is the
    exact-sum variant rollup pipelines want)."""
    prev = F.lag(VALUE).over(_per_series_window())
    inc = (
        F.when(prev.isNull(), F.lit(0.0))
        .when(F.col(VALUE) >= prev, F.col(VALUE) - prev)
        .otherwise(F.col(VALUE))  # counter reset
    )
    return (
        samples_df.withColumn("inc", inc)
        .groupBy(FINGERPRINT, window_start_ms(step_ms))
        .agg(
            F.round(F.sum("inc"), 6).alias("increase"),
            F.count("*").alias("n_samples"),
        )
    )


def rate(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Per-second rate: increase / window length."""
    return increase(samples_df, step_ms).withColumn(
        "rate", F.col("increase") / F.lit(step_ms / 1000.0)
    )


def histogram_quantile(
    buckets_df: DataFrame,
    q: float,
    group_cols: tuple[str, ...] = (FINGERPRINT,),
    le_col: str = "le",
    count_col: str = "cum_count",
) -> DataFrame:
    """PromQL ``histogram_quantile(q, ...)`` over cumulative buckets.

    Input: one row per (group, bucket upper bound ``le``) carrying the
    CUMULATIVE count ≤ le (the Prometheus ``_bucket`` series shape). Per
    group: rank = q × total; the answer is linearly interpolated inside the
    first bucket whose cumulative count reaches the rank, from the previous
    bucket bound (0 below the first bucket — Prometheus semantics).

    One lag-window pass over the le order + a rank filter — no Python, no
    per-group iteration; the window partitions by the group key, so at
    100 TB this shuffles each group's ≤ few-dozen bucket rows once (the raw
    samples never move — bucket counts are the pre-aggregated input)."""
    wg = W.partitionBy(*group_cols)
    w = wg.orderBy(le_col)
    rank = F.lit(q) * F.max(count_col).over(wg)
    prev_le = F.lag(le_col).over(w)
    prev_cnt = F.coalesce(F.lag(count_col).over(w), F.lit(0.0))
    lo = F.coalesce(prev_le, F.lit(0.0))
    # materialize every window value BEFORE the rank filter — a window
    # expression evaluated after the filter would re-run over the filtered
    # frame and lag against the wrong neighbor
    interp = F.col("_lo") + (F.col(le_col) - F.col("_lo")) * (
        F.col("_rank") - F.col("_pcnt")
    ) / (F.col(count_col) - F.col("_pcnt"))
    return (
        buckets_df.withColumn("_rank", rank)
        .withColumn("_pcnt", prev_cnt)
        .withColumn("_lo", lo)
        .filter((F.col(count_col) >= F.col("_rank")) & (F.col("_pcnt") < F.col("_rank")))
        .select(
            *group_cols,
            F.round(interp, 6).alias("quantile"),
            F.col("_rank").alias("rank"),
        )
    )


def delta_over_time(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Gauge delta per (fingerprint, window): last - first by time."""
    return (
        samples_df.groupBy(FINGERPRINT, window_start_ms(step_ms))
        .agg(
            F.round(
                F.max_by(VALUE, F.col(TIMESTAMP_MS))
                - F.min_by(VALUE, F.col(TIMESTAMP_MS)),
                6,
            ).alias("delta"),
            F.count("*").alias("n_samples"),
        )
    )


def reset_marker() -> "Column":
    """PromQL ``resets()``-style marker column: 1 where a counter's value
    drops below its predecessor within the series, else 0 (first: 0)."""
    prev = F.lag(VALUE).over(_per_series_window())
    return (prev.isNotNull() & (F.col(VALUE) < prev)).cast("int")


def change_marker() -> "Column":
    """PromQL ``changes()``-style marker column: 1 where the value differs
    from its predecessor within the series, else 0 (first: 0)."""
    prev = F.lag(VALUE).over(_per_series_window())
    return (prev.isNotNull() & (F.col(VALUE) != prev)).cast("int")


def series_stability(samples_df: DataFrame) -> DataFrame:
    """Per-series ``resets``/``changes`` totals — the flap/restart counters
    an alerting pipeline reads. One window pass computes both markers, one
    keyed aggregate folds them (no join between the two stats)."""
    marked = samples_df.select(
        FINGERPRINT,
        reset_marker().alias("is_reset"),
        change_marker().alias("is_change"),
    )
    return marked.groupBy(FINGERPRINT).agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum("is_reset").cast("long").alias("n_resets"),
        F.sum("is_change").cast("long").alias("n_changes"),
    )


def deriv(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """PromQL ``deriv()``: per-(series, window) least-squares slope of the
    gauge in value-per-SECOND (prometheus/promql/functions.go linearRegression
    — same simple-regression fit, windowed instead of range-vector).

    One keyed aggregation: ``regr_slope`` is algebraic (sums of x, y, xy,
    x²), so Spark computes it with map-side partial aggregation — no window
    pass, no per-series sort. x is seconds from the window start, keeping
    the sums small and both engines' float paths in agreement."""
    ws = window_start_ms(step_ms)
    x = (F.col(TIMESTAMP_MS) - F.col("window_start_ms")) / F.lit(1000.0)
    return (
        samples_df.select(FINGERPRINT, ws, F.col(VALUE), F.col(TIMESTAMP_MS))
        .select(FINGERPRINT, "window_start_ms", x.alias("x"), F.col(VALUE).alias("y"))
        .groupBy(FINGERPRINT, "window_start_ms")
        .agg(
            F.round(F.regr_slope("y", "x"), 6).alias("slope_per_sec"),
            F.count("*").cast("long").alias("n_samples"),
        )
        .filter(F.col("n_samples") >= 2)
    )


def predict_linear(
    samples_df: DataFrame, step_ms: int = 300_000, horizon_s: int = 3600
) -> DataFrame:
    """PromQL ``predict_linear()``: the windowed regression above
    extrapolated ``horizon_s`` seconds past the window END — the
    disk-will-fill-in-an-hour alerting primitive."""
    ws = window_start_ms(step_ms)
    x = (F.col(TIMESTAMP_MS) - F.col("window_start_ms")) / F.lit(1000.0)
    horizon_x = F.lit(step_ms / 1000.0 + horizon_s)
    return (
        samples_df.select(FINGERPRINT, ws, F.col(VALUE), F.col(TIMESTAMP_MS))
        .select(FINGERPRINT, "window_start_ms", x.alias("x"), F.col(VALUE).alias("y"))
        .groupBy(FINGERPRINT, "window_start_ms")
        .agg(
            F.round(
                F.regr_intercept("y", "x") + F.regr_slope("y", "x") * horizon_x, 4
            ).alias("predicted"),
            F.count("*").cast("long").alias("n_samples"),
        )
        .filter(F.col("n_samples") >= 2)
    )


def quantile_over_time(
    samples_df: DataFrame, q: float, step_ms: int = 300_000
) -> DataFrame:
    """PromQL ``quantile_over_time(q, …)``: the exact linear-interpolated
    q-quantile of the values per (series, window) — ``percentile`` is
    Spark's exact interpolating aggregate (same definition DuckDB calls
    ``quantile_cont``), so the result is engine-checkable, unlike
    ``approx_percentile``. Exact percentile buffers each group's values —
    fine for bounded windows; unbounded-cardinality rollups should use the
    sketch-based ``approx_percentile`` variant instead."""
    return (
        samples_df.groupBy(FINGERPRINT, window_start_ms(step_ms))
        .agg(
            F.round(F.percentile(VALUE, F.lit(q)), 6).alias("quantile"),
            F.count("*").cast("long").alias("n_samples"),
        )
    )


def holt_winters(
    samples_df: DataFrame,
    sf: float = 0.3,
    tf: float = 0.1,
    step_ms: int = 300_000,
) -> DataFrame:
    """PromQL ``holt_winters(v, sf, tf)`` (double exponential smoothing,
    prometheus/promql/functions.go funcHoltWinters), windowed: per
    (series, window) the smoothed value after folding the time-ordered
    samples through  s' = sf·x + (1−sf)(s+b),  b' = tf·(s'−s) + (1−tf)·b,
    seeded s=x₂, b=x₂−x₁ as Prometheus does. Windows with < 2 samples drop.

    A sequential recurrence has no algebraic (mergeable) form, so this is
    the collect-fold shape: one keyed aggregation gathers each window's
    samples into a sorted array (bounded by the window — NOT a whole-series
    collect), then a single JVM-side ``aggregate`` lambda runs the
    recurrence. Ties on the timestamp order deterministically by value, so
    the fold is engine-reproducible."""
    omf, omtf = 1.0 - sf, 1.0 - tf
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(TIMESTAMP_MS).alias("t"),
                F.col(VALUE).cast("double").alias("v"),
            )
        )
    )
    g = (
        samples_df.groupBy(FINGERPRINT, window_start_ms(step_ms))
        .agg(arr.alias("a"), F.count("*").cast("long").alias("n_samples"))
        .filter(F.col("n_samples") >= 2)
    )
    a = F.col("a")
    init = F.struct(
        a[1]["v"].alias("s"), (a[1]["v"] - a[0]["v"]).alias("b")
    )
    rest = F.slice(a, 3, F.greatest(F.size(a) - 2, F.lit(0)))

    def smooth(acc, x):
        s_new = F.lit(sf) * x["v"] + F.lit(omf) * (acc["s"] + acc["b"])
        return F.struct(
            s_new.alias("s"),
            (F.lit(tf) * (s_new - acc["s"]) + F.lit(omtf) * acc["b"]).alias("b"),
        )

    res = F.aggregate(rest, init, smooth)
    return g.select(
        FINGERPRINT,
        "window_start_ms",
        F.round(res["s"], 6).alias("smoothed"),
        "n_samples",
    )


def alert_intervals(
    samples_df: DataFrame, threshold: float, for_ms: int = 0
) -> DataFrame:
    """Prometheus alerting-rule evaluation over stored samples: the maximal
    intervals where a series holds ``value > threshold`` continuously, kept
    only if they last at least ``for_ms`` — the batch replay of
    ``expr > threshold FOR <duration>`` (prometheus/rules/alerting.go
    semantics: pending until the condition has held for the duration).

    Gaps-and-islands: one per-series window pass numbers each violation run
    by the cumulative count of non-violating samples before it, then one
    keyed aggregation collapses runs to (start, end, n). Same
    one-shuffle-per-series-window shape as every promql_lite range op.

    Output: (fingerprint, start_ms, end_ms, n_samples), only firing runs.
    """
    # tie-break equal timestamps by value so the run numbering is total and
    # engine-reproducible
    w = W.partitionBy(FINGERPRINT).orderBy(TIMESTAMP_MS, VALUE)
    ok = F.col(VALUE) > F.lit(threshold)
    grp = F.sum((~ok).cast("long")).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = samples_df.select(
        FINGERPRINT, TIMESTAMP_MS, ok.alias("__ok"), grp.alias("__grp")
    ).filter("__ok")
    return (
        runs.groupBy(FINGERPRINT, "__grp")
        .agg(
            F.min(TIMESTAMP_MS).alias("start_ms"),
            F.max(TIMESTAMP_MS).alias("end_ms"),
            F.count("*").cast("long").alias("n_samples"),
        )
        .filter(F.col("end_ms") - F.col("start_ms") >= F.lit(for_ms))
        .drop("__grp")
    )


def rate_extrapolated(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Prometheus's ACTUAL ``rate()``/``increase()`` semantics
    (promql/functions.go ``extrapolatedRate``), windowed: unlike the
    exact-sum ``increase`` above, Prometheus extrapolates the observed
    counter growth to the full range — unless the first/last samples sit
    further from the range edge than 1.1× the average sample spacing, in
    which case it extends by only half an average interval; and a counter
    that would extrapolate below zero is clamped to start at zero.

    Per (series, window), with samples strictly inside the window:
      delta   = reset-aware growth from first to last in-window sample
      factor  = (sampledInterval + headExt + tailExt) / sampledInterval
      rate    = delta · factor / range-seconds
    Windows with < 2 samples produce nothing (as in Prometheus).

    One in-window lag pass + one keyed aggregation — same shape as
    ``increase``; the extrapolation is pure post-aggregation arithmetic.
    """
    ws = window_start_ms(step_ms)
    base = samples_df.select(
        FINGERPRINT, ws, F.col(TIMESTAMP_MS), F.col(VALUE).cast("double").alias("v")
    )
    w_in = W.partitionBy(FINGERPRINT, "window_start_ms").orderBy(TIMESTAMP_MS, "v")
    prev = F.lag("v").over(w_in)
    inc = (
        F.when(prev.isNull(), F.lit(0.0))
        .when(F.col("v") >= prev, F.col("v") - prev)
        .otherwise(F.col("v"))
    )
    agg = (
        base.withColumn("inc", inc)
        .groupBy(FINGERPRINT, "window_start_ms")
        .agg(
            F.sum("inc").alias("delta"),
            F.min(TIMESTAMP_MS).alias("first_ts"),
            F.max(TIMESTAMP_MS).alias("last_ts"),
            F.min_by("v", F.struct(TIMESTAMP_MS, "v")).alias("first_v"),
            F.count("*").cast("long").alias("n_samples"),
        )
        .filter((F.col("n_samples") >= 2) & (F.col("last_ts") > F.col("first_ts")))
    )
    sampled = (F.col("last_ts") - F.col("first_ts")).cast("double")
    avg_iv = sampled / (F.col("n_samples") - 1)
    to_start = (F.col("first_ts") - F.col("window_start_ms")).cast("double")
    to_end = (F.col("window_start_ms") + F.lit(step_ms) - F.col("last_ts")).cast("double")
    # counter can't have been below zero: cap durationToStart at the time it
    # would take the observed rate to climb from 0 to first_v — BEFORE the
    # 1.1×-average-interval threshold check, exactly as Prometheus's
    # extrapolatedRate clamps durationToStart with durationToZero first
    to_zero = sampled * (F.col("first_v") / F.nullif(F.col("delta"), F.lit(0.0)))
    to_start_c = F.when(
        (F.col("delta") > 0) & (F.col("first_v") >= 0) & (to_zero < to_start),
        to_zero,
    ).otherwise(to_start)
    head = F.when(to_start_c >= avg_iv * 1.1, avg_iv / 2).otherwise(to_start_c)
    tail = F.when(to_end >= avg_iv * 1.1, avg_iv / 2).otherwise(to_end)
    factor = (sampled + head + tail) / sampled
    # the rate divides the ROUNDED increase: dividing the raw product lets
    # last-ulp differences between engines flip an 8-dp rounding tie
    inc = F.round(F.col("delta") * factor, 6)
    return agg.select(
        FINGERPRINT,
        "window_start_ms",
        inc.alias("increase_extrapolated"),
        F.round(inc / F.lit(step_ms / 1000.0), 8).alias("rate_extrapolated"),
        "n_samples",
    )


def last_two(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """The last two samples per (series, window) — the shared scaffold of
    PromQL's instant-variant functions ``irate``/``idelta``
    (promql/functions.go instantValue): one in-window window pass ordered
    newest-first (ties newest-first by value, engine-reproducible), keeping
    only the newest row with its predecessor attached. Windows with < 2
    samples drop, as in Prometheus.

    Output: (fingerprint, window_start_ms, timestamp_ms, v, prev_ts,
    prev_v)."""
    ws = window_start_ms(step_ms)
    base = samples_df.select(
        FINGERPRINT, ws, F.col(TIMESTAMP_MS), F.col(VALUE).cast("double").alias("v")
    )
    w = W.partitionBy(FINGERPRINT, "window_start_ms").orderBy(
        F.desc(TIMESTAMP_MS), F.desc("v")
    )
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .withColumn("prev_ts", F.lead(TIMESTAMP_MS).over(w))
        .withColumn("prev_v", F.lead("v").over(w))
        .filter((F.col("__rn") == 1) & F.col("prev_ts").isNotNull())
        .drop("__rn")
    )


def irate(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """PromQL ``irate()``: per-second rate between the LAST TWO samples of
    each (series, window), counter-reset aware (a drop contributes the new
    value, as instantValue does). NULL rate when the two samples share a
    timestamp (Prometheus can't produce that pair; stored data can).

    Output adds ``increase`` (the reset-aware last-step delta), ``dt_ms``,
    and ``irate`` (increase / dt seconds)."""
    lt = last_two(samples_df, step_ms)
    inc = F.when(
        F.col("v") >= F.col("prev_v"), F.col("v") - F.col("prev_v")
    ).otherwise(F.col("v"))
    dt = (F.col(TIMESTAMP_MS) - F.col("prev_ts")).cast("long")
    return lt.select(
        FINGERPRINT,
        "window_start_ms",
        inc.alias("increase"),
        dt.alias("dt_ms"),
        (inc / F.nullif(dt.cast("double"), F.lit(0.0)) * 1000.0).alias("irate"),
    )


def idelta(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """PromQL ``idelta()``: the plain (gauge) difference between the last
    two samples of each (series, window) — no reset handling, may be
    negative."""
    lt = last_two(samples_df, step_ms)
    return lt.select(
        FINGERPRINT,
        "window_start_ms",
        (F.col("v") - F.col("prev_v")).alias("idelta"),
        (F.col(TIMESTAMP_MS) - F.col("prev_ts")).cast("long").alias("dt_ms"),
    )


def clamp(c: "Column", mn: float, mx: float) -> "Column":
    """PromQL ``clamp(v, min, max)``; min > max yields NaN (Prometheus
    funcClamp)."""
    if mn > mx:
        return F.lit(float("nan"))
    return F.least(F.greatest(c, F.lit(float(mn))), F.lit(float(mx)))


def clamp_min(c: "Column", mn: float) -> "Column":
    """PromQL ``clamp_min(v, min)``."""
    return F.greatest(c, F.lit(float(mn)))


def clamp_max(c: "Column", mx: float) -> "Column":
    """PromQL ``clamp_max(v, max)``."""
    return F.least(c, F.lit(float(mx)))


def time_weighted_avg(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Time-weighted average per (series, window) over IRREGULARLY spaced
    samples — the TimescaleDB ``time_weight('LOCF')`` shape: each sample's
    value holds until the next sample (last one holds to the window end),
    and the average is the integral of that step function divided by the
    covered duration (first sample → window end). The arithmetic mean
    over-weights burst periods; billing/SLO math wants this one.

    One in-window ``lead`` pass + one keyed aggregation."""
    ws = window_start_ms(step_ms)
    base = samples_df.select(
        FINGERPRINT, ws, F.col(TIMESTAMP_MS), F.col(VALUE).cast("double").alias("v")
    )
    w_in = W.partitionBy(FINGERPRINT, "window_start_ms").orderBy(TIMESTAMP_MS, "v")
    wend = F.col("window_start_ms") + F.lit(step_ms)
    nxt = F.coalesce(F.lead(TIMESTAMP_MS).over(w_in), wend)
    seg = (nxt - F.col(TIMESTAMP_MS)).cast("double")
    return (
        base.withColumn("wsum", F.col("v") * seg)
        .withColumn("dur", seg)
        .groupBy(FINGERPRINT, "window_start_ms")
        .agg(
            F.round(F.sum("wsum") / F.sum("dur"), 6).alias("twa"),
            F.round(F.avg("v"), 6).alias("plain_avg"),
            F.count("*").cast("long").alias("n_samples"),
        )
    )


def count_values(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """PromQL ``count_values("value", v)``, windowed: how many samples took
    each distinct value per window, across all series — the discrete value
    histogram (build-info/version counting in Prometheus practice). One
    keyed aggregation."""
    return (
        samples_df.groupBy(window_start_ms(step_ms), F.col(VALUE).alias("value"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def absent_over_time(
    samples_df: DataFrame, start_ms: int, end_ms: int, step_ms: int
) -> DataFrame:
    """PromQL ``absent_over_time``: for every known series and every window
    on the grid, 1 when the series has NO sample in the window — the
    scrape-loss indicator. Grid = distinct series × window sequence (both
    tiny next to the fact table); presence is one keyed aggregation,
    absence the left anti side of the grid join."""
    grid = (
        samples_df.select(FINGERPRINT)
        .distinct()
        .select(
            FINGERPRINT,
            F.explode(
                F.sequence(F.lit(start_ms), F.lit(end_ms - 1), F.lit(step_ms))
            ).alias("window_start_ms"),
        )
    )
    present = (
        samples_df.filter(
            (F.col(TIMESTAMP_MS) >= start_ms) & (F.col(TIMESTAMP_MS) < end_ms)
        )
        .groupBy(FINGERPRINT, window_start_ms(step_ms))
        .agg(F.count("*").alias("_n"))
    )
    return grid.join(
        present, [FINGERPRINT, "window_start_ms"], "left_anti"
    ).withColumn("absent", F.lit(1).cast("long"))
