"""Native-histogram operators: exponential-bucket (Prometheus
native-histogram style) sketches BUILT FROM raw observations, merged,
and queried — the pre-aggregation a 100 TB metrics store runs so that
quantiles over billions of raw samples become folds over a few dozen
buckets per group.

Model — exponential buckets at schema 0 over integer CENTS:

    bucket(i) covers amounts in (2^(i-1), 2^i] cents, i ≥ 0
    zero bucket counts observations ≤ 0

(Prometheus native histograms use base 2^(2^-schema); schema 0 is base
2 — the resolution ladder's anchor. Working over integer cents makes the
bucket index EXACT integer arithmetic: i = bit_length(cents − 1) via
``length(bin(…))``, identical in Spark and DuckDB, where a float
``ceil(log2(x))`` could land either side of a power-of-two boundary
depending on the engine's libm.)

The histogram frame is (group…, schema, zero_count, count, sum_cents,
buckets sorted array<struct<idx,cnt>>). Build and merge are single keyed
aggregations (map-side combinable — the sketch property); quantile and
fraction run on the EXPLODED bucket rows with a window cumsum whose
partitions are bounded by the bucket count (≤ ~40 for cent amounts up to
$10^10), so they never touch the raw observations again.

Reference: the quantile follows promql/quantile.go's classic
bucketQuantile shape (cumulative counts, linear interpolation within the
located bucket, rank = q·count); the zero bucket reports 0.0 exactly,
like a native histogram whose zero threshold is 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# amounts are 2-dp currency: exact integer cents
_CENTS = lambda c: F.round(c * 100).cast("long")  # noqa: E731


def bucket_idx(cents: Column) -> Column:
    """Exponential bucket index at schema 0: i such that
    2^(i-1) < cents ≤ 2^i — exact via bit_length(cents − 1)."""
    return (
        F.when(cents <= 1, F.lit(0))
        .otherwise(F.length(F.bin(cents - 1)))
        .cast("int")
    )


def hist_build(
    df: DataFrame,
    value_col: str,
    by: list[str],
    window_col: Column | None = None,
    window_name: str = "window_ms",
) -> DataFrame:
    """Aggregate raw observations into one histogram row per group (and
    optional time window): two keyed aggregations — (group, idx) counts,
    then bucket collection — both map-side combinable."""
    cents = _CENTS(F.col(value_col))
    keys = list(by)
    sel = [F.col(k) for k in keys]
    if window_col is not None:
        sel.append(window_col.alias(window_name))
        keys.append(window_name)
    base = df.select(
        *sel,
        cents.alias("__c"),
        F.when(cents <= 0, 1).otherwise(0).alias("__zero"),
        bucket_idx(cents).alias("__idx"),
    )
    per_bucket = (
        base.filter(F.col("__zero") == 0)
        .groupBy(*keys, "__idx")
        .agg(F.count("*").cast("long").alias("__cnt"))
    )
    buckets = per_bucket.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__idx").alias("idx"), F.col("__cnt").alias("cnt")))
        ).alias("buckets")
    )
    totals = base.groupBy(*keys).agg(
        F.sum("__zero").cast("long").alias("zero_count"),
        F.count("*").cast("long").alias("count"),
        F.sum(F.when(F.col("__zero") == 0, F.col("__c")).otherwise(0))
        .cast("long")
        .alias("sum_cents"),
    )
    return totals.join(buckets, keys, "left").select(
        *keys,
        F.lit(0).alias("schema"),
        "zero_count",
        "count",
        "sum_cents",
        F.coalesce(
            "buckets", F.expr("cast(array() as array<struct<idx:int,cnt:bigint>>)")
        ).alias("buckets"),
    )


def hist_merge(hists: DataFrame, by: list[str]) -> DataFrame:
    """Merge histogram rows down to one per ``by`` group: bucket counts
    add index-wise (explode → keyed sum → re-collect), totals add. The
    mergeability IS the point of the sketch — a 1000-executor cluster
    merges partial histograms instead of re-scanning observations."""
    exploded = hists.select(
        *by, "zero_count", "count", "sum_cents", F.explode_outer("buckets").alias("b")
    )
    per_idx = (
        exploded.filter(F.col("b").isNotNull())
        .groupBy(*by, F.col("b.idx").alias("idx"))
        .agg(F.sum("b.cnt").cast("long").alias("cnt"))
    )
    buckets = per_idx.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct("idx", "cnt"))).alias("buckets")
    )
    totals = hists.groupBy(*by).agg(
        F.sum("zero_count").cast("long").alias("zero_count"),
        F.sum("count").cast("long").alias("count"),
        F.sum("sum_cents").cast("long").alias("sum_cents"),
    )
    return totals.join(buckets, by, "left").select(
        *by,
        F.lit(0).alias("schema"),
        "zero_count",
        "count",
        "sum_cents",
        F.coalesce(
            "buckets", F.expr("cast(array() as array<struct<idx:int,cnt:bigint>>)")
        ).alias("buckets"),
    )


def hist_quantile(hists: DataFrame, q: float, by: list[str]) -> DataFrame:
    """φ-quantile per histogram row: explode buckets, window cumsum in
    index order (partitions bounded by the bucket count), locate the
    first bucket whose cumulative count reaches rank = q·count, linear
    interpolation within (2^(i-1), 2^i] cents. rank inside the zero
    bucket → 0.0; empty histogram → no row (PromQL drops the series)."""
    ex = hists.select(
        *by,
        "zero_count",
        "count",
        F.explode_outer("buckets").alias("b"),
    )
    wcum = W.partitionBy(*by).orderBy(F.col("b.idx"))
    staged = ex.withColumn(
        "__cum", F.col("zero_count") + F.sum("b.cnt").over(wcum)
    ).withColumn("__rank", F.lit(q) * F.col("count"))
    # the located bucket: minimal idx with cum >= rank
    hit = (
        staged.filter(F.col("b").isNotNull() & (F.col("__cum") >= F.col("__rank")))
        .withColumn(
            "__rn",
            F.row_number().over(W.partitionBy(*by).orderBy(F.col("b.idx"))),
        )
        .filter(F.col("__rn") == 1)
    )
    lower = F.when(F.col("b.idx") == 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.col("b.idx") - 1)
    )
    upper = F.pow(F.lit(2.0), F.col("b.idx"))
    prev_cum = F.col("__cum") - F.col("b.cnt")
    interp = lower + (upper - lower) * (F.col("__rank") - prev_cum) / F.col("b.cnt")
    in_zero = F.col("__rank") <= prev_cum  # rank at/below the zero bucket
    value_cents = F.when(in_zero, F.lit(0.0)).otherwise(interp)
    return hit.select(
        *by, (value_cents / 100.0).alias("quantile_value")
    )


def hist_quantiles(
    hists: DataFrame, qs: list[float], by: list[str]
) -> DataFrame:
    """Several φ-quantiles in ONE pass over the histograms — the cumsum
    window runs once and the q fan-out happens on the (tiny, bounded by
    the bucket count) cumulated rows, instead of re-executing the whole
    upstream pipeline per q as a union of :func:`hist_quantile` calls
    did (r11: nhist_quantile's plan held 3 copies of the daily-tier
    aggregation, 44 Exchange nodes → 8). Per q the arithmetic is
    identical to :func:`hist_quantile` — same rank = q·count double,
    same interpolation — so results match bit-for-bit; the extra
    row_number window partitions by (*by, q), which the cumsum window's
    hash partitioning on *by already satisfies (no new exchange, one
    local sort). Output: one row per (*by, q) with ``q`` as a column."""
    ex = hists.select(
        *by,
        "zero_count",
        "count",
        F.explode_outer("buckets").alias("b"),
    )
    wcum = W.partitionBy(*by).orderBy(F.col("b.idx"))
    cum = ex.withColumn(
        "__cum", F.col("zero_count") + F.sum("b.cnt").over(wcum)
    )
    fan = cum.select(
        *by,
        "count",
        "b",
        "__cum",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("__rank", F.col("q") * F.col("count"))
    hit = (
        fan.filter(F.col("b").isNotNull() & (F.col("__cum") >= F.col("__rank")))
        .withColumn(
            "__rn",
            F.row_number().over(W.partitionBy(*by, "q").orderBy(F.col("b.idx"))),
        )
        .filter(F.col("__rn") == 1)
    )
    lower = F.when(F.col("b.idx") == 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.col("b.idx") - 1)
    )
    upper = F.pow(F.lit(2.0), F.col("b.idx"))
    prev_cum = F.col("__cum") - F.col("b.cnt")
    interp = lower + (upper - lower) * (F.col("__rank") - prev_cum) / F.col("b.cnt")
    in_zero = F.col("__rank") <= prev_cum
    value_cents = F.when(in_zero, F.lit(0.0)).otherwise(interp)
    return hit.select(
        *by, "q", (value_cents / 100.0).alias("quantile_value")
    )


def hist_fraction(
    hists: DataFrame, lo: float, hi: float, by: list[str]
) -> DataFrame:
    """histogram_fraction(lo, hi]: the estimated fraction of observations
    with lo < value ≤ hi (dollars), by linear interpolation within the
    boundary buckets — F(hi) − F(lo) over count, where F(x) is the
    interpolated cumulative count at x cents."""
    lo_c, hi_c = float(lo) * 100.0, float(hi) * 100.0

    def cum_at(bound_cents: float) -> Column:
        # per exploded bucket: this bucket's contribution to F(bound)
        lower = F.when(F.col("b.idx") == 0, F.lit(0.0)).otherwise(
            F.pow(F.lit(2.0), F.col("b.idx") - 1)
        )
        upper = F.pow(F.lit(2.0), F.col("b.idx"))
        frac = (F.lit(bound_cents) - lower) / (upper - lower)
        clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
        return F.col("b.cnt") * clamped

    ex = hists.select(
        *by, "zero_count", "count", F.explode_outer("buckets").alias("b")
    )
    per = ex.groupBy(*by).agg(
        F.first("zero_count").alias("__z"),
        F.first("count").alias("__n"),
        F.sum(F.when(F.col("b").isNotNull(), cum_at(hi_c)).otherwise(0.0)).alias("__fhi"),
        F.sum(F.when(F.col("b").isNotNull(), cum_at(lo_c)).otherwise(0.0)).alias("__flo"),
    )
    f_hi = F.col("__fhi") + F.when(F.lit(hi_c) >= 0, F.col("__z")).otherwise(0)
    f_lo = F.col("__flo") + F.when(F.lit(lo_c) >= 0, F.col("__z")).otherwise(0)
    return per.filter(F.col("__n") > 0).select(
        *by, ((f_hi - f_lo) / F.col("__n")).alias("fraction")
    )


def hist_stats(hists: DataFrame, by: list[str]) -> DataFrame:
    """histogram_count / histogram_sum / histogram_avg — avg in exact
    integer cents (floored), so both engines agree bit-for-bit."""
    g = hists.groupBy(*by).agg(
        F.sum("count").cast("long").alias("obs_count"),
        F.sum("sum_cents").cast("long").alias("sum_cents"),
    )
    avg_cents = (
        (F.col("sum_cents") - F.col("sum_cents") % F.col("obs_count"))
        / F.col("obs_count")
    ).cast("long")
    return g.select(
        *by,
        "obs_count",
        "sum_cents",
        F.when(F.col("obs_count") > 0, avg_cents).alias("avg_cents"),
    )


# ---------------------------------------------------- wire-format bridge


def native_histogram_frame(spark, series) -> DataFrame:
    """Flatten decoded remote-write native histograms
    (models.TimeSeries.histograms via edge/prompb.decode_write_request)
    into the columnar analytics shape: one row per histogram sample with
    explicit positive/negative bucket arrays."""
    rows = [
        (
            ts.labels_map(),
            int(h.timestamp_ms),
            int(h.schema),
            float(h.zero_threshold),
            float(h.zero_count),
            float(h.count),
            float(h.sum),
            [(int(i), float(c)) for i, c in sorted(h.positive)],
            [(int(i), float(c)) for i, c in sorted(h.negative)],
        )
        for ts in series
        for h in getattr(ts, "histograms", ()) or ()
    ]
    schema = (
        "labels map<string,string>, timestamp_ms long, schema int, "
        "zero_threshold double, zero_count double, count double, "
        "sum double, positive array<struct<idx:int,cnt:double>>, "
        "negative array<struct<idx:int,cnt:double>>"
    )
    df = spark.createDataFrame(rows or [], schema)
    return df if rows else df.filter("1=0")


def wire_hist_quantile(frame: DataFrame, q: float) -> DataFrame:
    """histogram_quantile over wire-ingested native histograms, honoring
    each row's own schema: bucket i at schema s bounds
    (2^((i-1)·2^-s), 2^(i·2^-s)] (mirrored for negative buckets), the
    zero bucket [-zt, zt]. One row per (labels, timestamp_ms): explode
    buckets in VALUE order (negatives by descending index, zero,
    positives ascending), window cumsum, locate rank = q·count, linear
    interpolation within the located bucket. Empty histograms drop."""
    key = F.to_json("labels").alias("__k")
    base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -F.col("schema").cast("double")))
    b = frame.select(
        key,
        "labels",
        "timestamp_ms",
        "count",
        "zero_count",
        "zero_threshold",
        base.alias("__base"),
        F.explode(
            F.concat(
                F.expr(
                    "transform(reverse(negative), x -> named_struct("
                    "'ord', 0, 'idx', x.idx, 'cnt', x.cnt))"
                ),
                F.expr(
                    "array(named_struct('ord', 1, 'idx', 0, "
                    "'cnt', cast(zero_count as double)))"
                ),
                F.expr(
                    "transform(positive, x -> named_struct("
                    "'ord', 2, 'idx', x.idx, 'cnt', x.cnt))"
                ),
            )
        ).alias("b"),
    )
    # value-order key: negatives descend by idx (ord 0 uses -idx), then
    # zero, then positives ascend
    order = F.when(F.col("b.ord") == 0, -F.col("b.idx")).otherwise(F.col("b.idx"))
    w = W.partitionBy("__k", "timestamp_ms").orderBy("b.ord", order)
    staged = b.withColumn("__cum", F.sum("b.cnt").over(w)).withColumn(
        "__rank", F.lit(q) * F.col("count")
    )
    hit = (
        staged.filter((F.col("__cum") >= F.col("__rank")) & (F.col("count") > 0))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("__k", "timestamp_ms").orderBy("b.ord", order)
            ),
        )
        .filter(F.col("__rn") == 1)
    )
    pw = lambda e: F.pow(F.col("__base"), e)  # noqa: E731
    # native buckets have EXACT exponential bounds at every index (idx 0
    # covers (base^-1, 1]; negative indexes reach below 1) — no classic
    # first-bucket zero-start convention here
    lower = (
        F.when(F.col("b.ord") == 0, -pw(F.col("b.idx").cast("double")))
        .when(F.col("b.ord") == 1, -F.col("zero_threshold"))
        .otherwise(pw(F.col("b.idx").cast("double") - 1))
    )
    upper = (
        F.when(F.col("b.ord") == 0, -pw(F.col("b.idx").cast("double") - 1))
        .when(F.col("b.ord") == 1, F.col("zero_threshold"))
        .otherwise(pw(F.col("b.idx").cast("double")))
    )
    prev_cum = F.col("__cum") - F.col("b.cnt")
    interp = lower + (upper - lower) * (F.col("__rank") - prev_cum) / F.col("b.cnt")
    value = F.when(F.col("b.cnt") == 0, lower).otherwise(interp)
    return hit.select(
        "labels", "timestamp_ms", value.alias("quantile_value")
    )


def hist_increase(
    frame: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    range_ms: int,
    rate: bool = False,
) -> DataFrame:
    """increase()/rate() over CUMULATIVE native-histogram series on an
    evaluation grid — the histogram counterpart of extrapolatedRate.

    Same execution shape as the engine's float range functions: each
    histogram sample explodes map-side to the grid evaluations whose
    (t-range, t] window contains it (bounded range/step fan-out), then
    ONE keyed aggregation takes the window's first/last histogram
    (min_by/max_by on timestamp). The increase is the bucket-wise
    difference via a map lookup on the first histogram's buckets; a
    counter RESET inside the window (count or any bucket decreasing)
    makes the last histogram itself the increase, like Prometheus's
    detectReset. Prometheus's boundary extrapolation applies as a scalar
    factor on every component (the 1.1×-average-interval guard and the
    counter zero clamp on `count`), divided by the range for rate=True.

    Output: a histogram-shaped frame (labels, timestamp_ms=eval, schema,
    zero_threshold, zero_count, count, sum, positive, negative) that
    wire_hist_quantile consumes directly — so
    histogram_quantile(q, rate(h[5m])) is
    ``wire_hist_quantile(hist_increase(frame, ..., rate=True), q)``.
    Evaluations with fewer than two samples in the window drop."""
    ts = F.col("timestamp_ms")
    k_min = F.greatest(
        F.ceil((ts - F.lit(start_ms)) / F.lit(step_ms)).cast("long"), F.lit(0)
    )
    k_max = F.floor(
        (ts + F.lit(range_ms - 1) - F.lit(start_ms)) / F.lit(step_ms)
    ).cast("long")
    k_cap = (end_ms - start_ms) // step_ms
    e_lo = F.lit(start_ms) + k_min * F.lit(step_ms)
    e_hi = F.lit(start_ms) + F.least(k_max, F.lit(k_cap)) * F.lit(step_ms)
    evs = F.when(e_lo <= e_hi, F.sequence(e_lo, e_hi, F.lit(step_ms)))
    h_struct = F.struct(
        "timestamp_ms", "schema", "zero_threshold", "zero_count",
        "count", "sum", "positive", "negative",
    )
    exploded = frame.select(
        F.to_json("labels").alias("__k"),
        "labels",
        h_struct.alias("__h"),
        F.explode(evs).alias("eval_ms"),
    )
    g = exploded.groupBy("__k", "eval_ms").agg(
        F.first("labels").alias("labels"),
        F.count("*").alias("__n"),
        F.min_by("__h", F.col("__h.timestamp_ms")).alias("f"),
        F.max_by("__h", F.col("__h.timestamp_ms")).alias("l"),
    ).filter(F.col("__n") >= 2)

    def diff_buckets(side: str) -> Column:
        # last bucket counts minus the first histogram's (map lookup; a
        # bucket absent from the first histogram starts at 0)
        return F.expr(
            f"transform(l.{side}, x -> named_struct('idx', x.idx, 'cnt', "
            f"x.cnt - coalesce(map_from_entries(f.{side})[x.idx], "
            f"cast(0.0 as double))))"
        )

    reset = (
        (F.col("l.count") < F.col("f.count"))
        | F.expr(
            "exists(f.positive, x -> "
            "coalesce(map_from_entries(l.positive)[x.idx], "
            "cast(0.0 as double)) < x.cnt)"
        )
        | F.expr(
            "exists(f.negative, x -> "
            "coalesce(map_from_entries(l.negative)[x.idx], "
            "cast(0.0 as double)) < x.cnt)"
        )
    )
    d_count = F.when(reset, F.col("l.count")).otherwise(
        F.col("l.count") - F.col("f.count")
    )
    d_sum = F.when(reset, F.col("l.sum")).otherwise(
        F.col("l.sum") - F.col("f.sum")
    )
    d_zero = F.when(reset, F.col("l.zero_count")).otherwise(
        F.col("l.zero_count") - F.col("f.zero_count")
    )
    d_pos = F.when(reset, F.col("l.positive")).otherwise(diff_buckets("positive"))
    d_neg = F.when(reset, F.col("l.negative")).otherwise(diff_buckets("negative"))

    # extrapolatedRate's boundary factor, on the count component
    range_s = range_ms / 1000.0
    dur_start = (F.col("f.timestamp_ms") - (F.col("eval_ms") - range_ms)) / 1000.0
    dur_end = (F.col("eval_ms") - F.col("l.timestamp_ms")) / 1000.0
    sampled = (F.col("l.timestamp_ms") - F.col("f.timestamp_ms")) / 1000.0
    avg_between = sampled / (F.col("__n") - 1)
    dur_zero = sampled * (F.col("f.count") / d_count)
    dur_start = F.when(
        (d_count > 0) & (F.col("f.count") >= 0) & (dur_zero < dur_start),
        dur_zero,
    ).otherwise(dur_start)
    threshold = avg_between * 1.1
    extrap = (
        sampled
        + F.when(dur_start < threshold, dur_start).otherwise(avg_between / 2)
        + F.when(dur_end < threshold, dur_end).otherwise(avg_between / 2)
    )
    factor = extrap / sampled
    if rate:
        factor = factor / F.lit(range_s)
    scale = lambda c: (c * factor).cast("double")  # noqa: E731
    scale_buckets = lambda col: F.transform(  # noqa: E731
        col,
        lambda x: F.struct(
            x["idx"].alias("idx"), (x["cnt"] * factor).alias("cnt")
        ),
    )
    return g.filter(sampled > 0).select(
        "labels",
        F.col("eval_ms").alias("timestamp_ms"),
        F.col("l.schema").alias("schema"),
        F.col("l.zero_threshold").alias("zero_threshold"),
        scale(d_zero).alias("zero_count"),
        scale(d_count).alias("count"),
        scale(d_sum).alias("sum"),
        scale_buckets(d_pos).alias("positive"),
        scale_buckets(d_neg).alias("negative"),
    )


def _wire_segments() -> Column:
    """Per-row value segments of a wire-shape histogram, in value order:
    negative buckets as [-base^idx, -base^(idx-1)), the zero bucket
    [-zt, zt], positive buckets (base^(idx-1), base^idx] — each as a
    struct(l, u, cnt). Pure column expression; no explode, no shuffle."""
    base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -F.col("schema").cast("double")))

    def pw(e: Column) -> Column:
        return F.pow(base, e)

    neg = F.transform(
        F.col("negative"),
        lambda x: F.struct(
            (-pw(x["idx"].cast("double"))).alias("l"),
            (-pw(x["idx"].cast("double") - 1)).alias("u"),
            x["cnt"].alias("cnt"),
        ),
    )
    zero = F.array(
        F.struct(
            (-F.col("zero_threshold")).alias("l"),
            F.col("zero_threshold").alias("u"),
            F.col("zero_count").cast("double").alias("cnt"),
        )
    )
    pos = F.transform(
        F.col("positive"),
        lambda x: F.struct(
            pw(x["idx"].cast("double") - 1).alias("l"),
            pw(x["idx"].cast("double")).alias("u"),
            x["cnt"].alias("cnt"),
        ),
    )
    return F.concat(neg, zero, pos)


def wire_hist_cum_le(bound: Column) -> Column:
    """Estimated count of observations ≤ ``bound`` in a wire-shape
    histogram row: full buckets below, linear interpolation inside the
    boundary bucket (promql histogramFraction's interpolation)."""
    b = bound.cast("double")
    return F.aggregate(
        _wire_segments(),
        F.lit(0.0),
        lambda acc, s: acc
        + F.when(b >= s["u"], s["cnt"])
        .when(b <= s["l"], F.lit(0.0))
        .otherwise(s["cnt"] * (b - s["l"]) / (s["u"] - s["l"])),
    )


def wire_hist_fraction(frame: DataFrame, lo: float, hi: float) -> DataFrame:
    """histogram_fraction(lo, hi, h) over wire-ingested native
    histograms: (F(hi) − F(lo)) / count with linear interpolation at both
    bounds (promql/functions.go funcHistogramFraction). count == 0 → NaN,
    matching Prometheus (0/0). Row-local arithmetic only."""
    f_hi = wire_hist_cum_le(F.lit(float(hi)))
    f_lo = wire_hist_cum_le(F.lit(float(lo)))
    frac = F.when(
        F.col("count") > 0, (f_hi - f_lo) / F.col("count")
    ).otherwise(F.lit(float("nan")))
    return frame.select("labels", "timestamp_ms", frac.alias("fraction_value"))


def wire_hist_moments(frame: DataFrame) -> DataFrame:
    """histogram_count / _sum / _avg / _stddev / _stdvar over wire-shape
    native histograms, one output row per input histogram. The variance
    estimate places each bucket's mass at its GEOMETRIC midpoint
    ±base^(idx−½) (√(l·u), promql/functions.go funcHistogramStdDev) and
    the zero bucket's at 0, against the exact mean sum/count. Row-local
    column arithmetic — no explode, no shuffle."""
    base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -F.col("schema").cast("double")))
    mean = F.col("sum") / F.col("count")

    def sq_dev(mid: Column, cnt: Column) -> Column:
        return cnt * (mid - mean) * (mid - mean)

    acc = (
        F.aggregate(
            F.col("positive"),
            F.lit(0.0),
            lambda a, x: a + sq_dev(F.pow(base, x["idx"].cast("double") - 0.5), x["cnt"]),
        )
        + F.aggregate(
            F.col("negative"),
            F.lit(0.0),
            lambda a, x: a + sq_dev(-F.pow(base, x["idx"].cast("double") - 0.5), x["cnt"]),
        )
        + sq_dev(F.lit(0.0), F.col("zero_count"))
    )
    stdvar = F.when(F.col("count") > 0, acc / F.col("count")).otherwise(
        F.lit(float("nan"))
    )
    return frame.select(
        "labels",
        "timestamp_ms",
        F.col("count").alias("count_value"),
        F.col("sum").alias("sum_value"),
        F.when(F.col("count") > 0, F.col("sum") / F.col("count"))
        .otherwise(F.lit(float("nan")))
        .alias("avg_value"),
        stdvar.alias("stdvar_value"),
        F.sqrt(stdvar).alias("stddev_value"),
    )


def wire_hist_sum(frame: DataFrame, avg: bool = False) -> DataFrame:
    """sum() / avg() aggregation of wire-shape native histograms per
    (labels, timestamp_ms) group — the native twin of
    ``sum by (le) (rate(h_bucket[5m]))``. Callers pre-project ``labels``
    to the grouping subset; rows sharing (labels, timestamp_ms) merge.

    Mixed resolutions reconcile to the group's COARSEST schema
    (Prometheus FloatHistogram.Add): bucket idx at schema s maps to
    ``ceil(idx / 2^(s−s_t))`` at target schema s_t, a lossless regroup
    because coarser buckets are exact unions of finer ones. The zero
    bucket takes the group's widest threshold; rescaled buckets whose
    whole interval falls inside it fold into zero_count (Prometheus
    additionally WIDENS the threshold to swallow partially-overlapping
    buckets — with uniform thresholds, the overwhelmingly common case,
    the two behaviors coincide).

    Shape (r12, guide §2.4): ONE shuffle keyed on (labels-json,
    timestamp_ms). The bucket regroup needs the group's target schema
    (min) and zero threshold (max), which are only known after the
    aggregation — the previous form computed them in a first pass and
    joined them back onto an exploded second scan of the input (two scans
    of the — possibly checkpointed — wire tier + a join). Instead the
    same groupBy now also collect_lists each member's (schema, positive,
    negative), and the rescale/zero-fold runs as row-local array
    expressions post-aggregation. Memory per group is unchanged: the old
    form's collect_list already gathered every member bucket of the group
    into one row before the final fold."""
    key = F.to_json("labels").alias("__k")
    f = frame.select(
        key, "labels", "timestamp_ms", "schema", "zero_threshold",
        "zero_count", "count", "sum", "positive", "negative",
    )
    g = f.groupBy("__k", "timestamp_ms").agg(
        F.first("labels").alias("labels"),
        F.min("schema").alias("__st"),
        F.max("zero_threshold").alias("__zt"),
        F.sum("count").alias("count"),
        F.sum("sum").alias("sum"),
        F.sum("zero_count").alias("__z0"),
        F.count("*").alias("__n"),
        F.collect_list(F.struct("schema", "positive", "negative")).alias(
            "__rows"
        ),
    )
    # row-local regroup: rescale every member bucket to the group's
    # coarsest schema, tag the ones whose whole interval falls inside the
    # group's zero threshold — identical arithmetic to the exploded form
    def member_sides(e):
        factor = F.pow(F.lit(2.0), (e["schema"] - F.col("__st")).cast("double"))
        mk = lambda sgn, arr: F.transform(  # noqa: E731
            arr,
            lambda x: F.struct(
                F.lit(sgn).alias("sgn"),
                F.ceil(x["idx"] / factor).cast("int").alias("idx"),
                x["cnt"].alias("cnt"),
            ),
        )
        return F.concat(mk(1, e["positive"]), mk(-1, e["negative"]))

    base_t = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -F.col("__st").cast("double")))
    in_zero = lambda x: F.pow(base_t, x["idx"].cast("double")) <= F.col("__zt")  # noqa: E731
    fl = F.flatten(F.transform("__rows", member_sides))
    # the zero-fold sums in SORTED bucket order (deterministic; the
    # exploded form's F.sum order was partition-arbitrary)
    zfold = F.aggregate(
        F.sort_array(F.filter(fl, in_zero)),
        F.lit(0.0),
        lambda a, x: a + x["cnt"],
    )
    out = g.select(
        "__k", "timestamp_ms", "labels", "__st", "__zt", "count", "sum",
        "__z0", "__n",
        zfold.alias("__zfold"),
        F.sort_array(F.filter(fl, lambda x: ~in_zero(x))).alias("__bs"),
    )
    # regrouped buckets may collide on idx after rescaling — fold equal
    # indexes together, per side, in one row-local pass
    def side(sgn: int) -> Column:
        picked = F.filter(
            F.coalesce(
                F.col("__bs"),
                F.expr(
                    "cast(array() as array<struct<sgn:int,idx:int,cnt:double>>)"
                ),
            ),
            lambda x: x["sgn"] == sgn,
        )
        return F.aggregate(
            picked,
            F.expr("cast(array() as array<struct<idx:int,cnt:double>>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1)["idx"] == x["idx"]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            x["idx"].alias("idx"),
                            (F.element_at(acc, -1)["cnt"] + x["cnt"]).alias("cnt"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(x["idx"].alias("idx"), x["cnt"].alias("cnt"))
                    ),
                )
            ),
        )

    n = F.col("__n").cast("double")
    div = n if avg else F.lit(1.0)
    scale_b = lambda c: F.transform(  # noqa: E731
        c,
        lambda x: F.struct(x["idx"].alias("idx"), (x["cnt"] / div).alias("cnt")),
    )
    return out.select(
        "labels",
        "timestamp_ms",
        F.col("__st").alias("schema"),
        F.col("__zt").alias("zero_threshold"),
        ((F.col("__z0") + F.coalesce(F.col("__zfold"), F.lit(0.0))) / div).alias(
            "zero_count"
        ),
        (F.col("count") / div).alias("count"),
        (F.col("sum") / div).alias("sum"),
        scale_b(side(1)).alias("positive"),
        scale_b(side(-1)).alias("negative"),
    )


def hist_to_wire(
    hists: DataFrame, label_cols: dict[str, Column], ts_col: Column
) -> DataFrame:
    """Cents-tier histogram rows (:func:`hist_build` / :func:`hist_merge`
    output, schema 0 over integer cents) → the wire-shape frame the
    wire_* operators and the PromQL engine consume. ``label_cols`` maps
    label names to columns; values stay in CENTS (sum = sum_cents as a
    double) — divide by 100 at presentation. The cents-tier zero bucket
    (cents ≤ 0) becomes the wire zero bucket at threshold 0.5, which
    covers exactly cents = 0; the idx-0 bucket (0.5, 1] is cents = 1 in
    both conventions, so the conversion is lossless."""
    pairs = []
    for k, v in label_cols.items():
        pairs += [F.lit(k), v.cast("string")]
    return hists.select(
        F.create_map(*pairs).alias("labels") if pairs
        else F.create_map().cast("map<string,string>").alias("labels"),
        ts_col.cast("long").alias("timestamp_ms"),
        F.col("schema").cast("int").alias("schema"),
        F.lit(0.5).alias("zero_threshold"),
        F.col("zero_count").cast("double").alias("zero_count"),
        F.col("count").cast("double").alias("count"),
        F.col("sum_cents").cast("double").alias("sum"),
        F.transform(
            "buckets",
            lambda x: F.struct(
                x["idx"].cast("int").alias("idx"),
                x["cnt"].cast("double").alias("cnt"),
            ),
        ).alias("positive"),
        F.expr("cast(array() as array<struct<idx:int,cnt:double>>)").alias(
            "negative"
        ),
    )
