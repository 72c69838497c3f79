"""As-of (point-in-time) join and PromQL instant-vector evaluation
(beyond-reference).

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the naive rendering —
a range-condition theta join + per-left-row max — degenerates to a
broadcast-nested-loop O(|L|·|R|) plan. The scalable shape used here is the
classic union-merge: tag both sides, union, then one window per key ordered
by time where ``last(payload, ignorenulls=True)`` carries the most recent
right-side row forward onto every left row. Cost: ONE shuffle on the join
key + a sort within partitions — the same price as a regular join, no
quadratic blow-up, no range-join heuristics. Skewed keys can reuse
operators/skew.py salting upstream.

PromQL's instant-vector semantics (reference behavior: PromHouse delegates
evaluation to Prometheus, which resolves each evaluation timestamp to the
most recent sample within a 5-minute staleness window — see
prometheus/promql/engine.go) is exactly an as-of join of the evaluation
grid against the sample stream with a lookback tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``payload`` columns
    of the latest ``right`` row with the same key and ``right_ts`` ≤
    ``left_ts`` (ties: the right row at exactly ``left_ts`` matches).
    Rows with no match inside ``tolerance_ms`` keep NULL payloads.

    Output: all left columns + payload columns + ``matched_ts`` (the
    matched right timestamp, NULL when unmatched).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = payload or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    pay = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in payload]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        pay.alias("__pay"),
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r = r.withColumn(
        "__lrow", F.lit(None).cast(l.schema["__lrow"].dataType)
    ).select("__lrow", *keys, "__t", "__side", "__pay")
    merged = l.select("__lrow", *keys, "__t", "__side", "__pay").unionByName(r)
    # right rows sort before a left row at the same timestamp (__side 0 < 1)
    w = (
        W.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "__match", F.last("__pay", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    match: Column = F.col("__match")
    if tolerance_ms is not None:
        match = F.when(
            F.col("__match.__ts") >= F.col("__t") - F.lit(tolerance_ms), match
        )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [match[c].alias(c) for c in payload]
    out_cols.append(match["__ts"].alias("matched_ts"))
    return carried.select(*out_cols)


def instant_vector(
    samples_df: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = 300_000,
) -> DataFrame:
    """PromQL range-query evaluation: for every series and every evaluation
    timestamp on the [start, end] step grid, the most recent sample within
    the staleness ``lookback_ms`` — (fingerprint, eval_ms, value,
    sample_ts_ms); grid points where the series is stale are dropped.

    The grid is |series| × |steps| rows built from a ``sequence`` literal
    crossed with the distinct-series frame — both tiny next to the sample
    stream, and the distinct is the only extra exchange; the as-of itself
    is the one-shuffle union-merge above.

    Expects the (fingerprint, timestamp_ms, value) sample shape used across
    promql_lite."""
    grid_ts = F.explode(
        F.sequence(
            F.lit(start_ms), F.lit(end_ms), F.lit(step_ms)
        )
    ).alias("eval_ms")
    grid = samples_df.select("fingerprint").distinct().select(
        "fingerprint", grid_ts
    )
    joined = asof_join(
        grid,
        samples_df,
        on="fingerprint",
        left_ts="eval_ms",
        right_ts="timestamp_ms",
        payload=["value"],
        tolerance_ms=lookback_ms,
    )
    return joined.filter(F.col("value").isNotNull()).select(
        "fingerprint",
        "eval_ms",
        "value",
        F.col("matched_ts").alias("sample_ts_ms"),
    )
