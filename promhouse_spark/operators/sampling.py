"""Deterministic dataset splitting for training-data pipelines
(beyond-reference).

A split must be (a) reproducible across runs and engines, (b) a pure
per-row map — no shuffle, no global state — so it composes with any scan at
any scale, and (c) independent of row order and partitioning. Both paths
here are single-expression column maps over the id:

- ``lcg`` (default for oracle-paired tests): bucket =
  (id * 1103515245 + 12345) mod 2^31 — plain integer arithmetic any SQL
  engine reproduces bit-for-bit. Overflow-safe for |id| < ~8.3e9
  (2^63 / 1103515245); guarded with ``raise_error`` beyond that bound, not
  truncated, so Spark's silent non-ANSI wraparound can never diverge from
  engines (DuckDB) that error on BIGINT overflow.
- ``xxhash64``: Spark's JVM hash for production scale (no arithmetic
  bound, better avalanche) — not reproducible outside Spark, so tests pin
  the LCG path and the production path is plan-shape-tested only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 1 << 31
# ids at or beyond this magnitude would overflow id * _LCG_A in 64-bit
# arithmetic; the lcg path raises instead of silently wrapping
_LCG_ID_BOUND = (1 << 63) // _LCG_A


def split_bucket(id_col: Column | str, method: str = "lcg") -> Column:
    """Uniform [0, 1) bucket for a 64-bit id column, order/partition
    independent."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if method == "lcg":
        safe = F.when(F.abs(c) < F.lit(_LCG_ID_BOUND), c).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "lcg split id would overflow 64-bit multiply "
                        f"(|id| >= {_LCG_ID_BOUND}): "
                    ),
                    c.cast("string"),
                )
            )
        )
        return (
            F.pmod(safe * F.lit(_LCG_A) + F.lit(_LCG_C), F.lit(_LCG_M))
            / F.lit(float(_LCG_M))
        )
    if method == "xxhash64":
        # map signed long to [0, 1): shift the sign bit out first
        return F.shiftrightunsigned(F.xxhash64(c), 11) / F.lit(float(1 << 53))
    raise ValueError(f"unknown split method: {method}")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    method: str = "lcg",
) -> DataFrame:
    """Assign every row a deterministic split label from cumulative weight
    ranges over the id bucket. Adds a ``split`` column; never shuffles."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    bucket = split_bucket(id_col, method)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        expr = (
            F.when(bucket < acc, name)
            if expr is None
            else expr.when(bucket < acc, name)
        )
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def domain_rates(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-rebalancing keep-rates per domain: target share ∝
    count^alpha (the multinomial temperature mix of GPT-3/The Pile/XLM-R;
    alpha < 1 flattens the domain distribution toward uniform). The
    per-domain Bernoulli keep rate is

        rate_g = (n_g ^ alpha / n_g) / max_h(n_h ^ alpha / n_h)

    — normalized so the most-upweighted (smallest) domain keeps everything
    and no rate exceeds 1; larger domains are downsampled toward the
    tempered share. Rates are rounded to 6 dp so engine libm pow()
    differences can never flip a keep decision at a bucket boundary.

    One tiny aggregation (|domains| rows) + one scalar max — broadcastable
    by construction."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    raw = F.pow(F.col("n").cast("double"), F.lit(alpha)) / F.col("n")
    rated = counts.select(group_col, F.col("n").cast("long").alias("n"), raw.alias("raw"))
    mx = rated.agg(F.max("raw").alias("mx"))
    return rated.crossJoin(mx).select(
        group_col, "n", F.round(F.col("raw") / F.col("mx"), 6).alias("rate")
    )


def domain_resample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.7,
    method: str = "lcg",
) -> DataFrame:
    """Deterministic domain-temperature resampling: keep a row iff its
    reproducible id bucket falls under its domain's tempered keep rate.

    The rate frame is |domains| rows — Catalyst broadcast-joins it, so the
    scan side never shuffles; the keep decision itself is the same pure
    per-row bucket map as ``hash_split`` (order/partition independent,
    reproducible across engines on the ``lcg`` path)."""
    rates = domain_rates(df, group_col, alpha)
    return (
        df.join(F.broadcast(rates.select(group_col, "rate")), group_col)
        .filter(split_bucket(id_col, method) < F.col("rate"))
        .drop("rate")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    seq_len: int = 2048,
    num_shards: int = 8,
) -> DataFrame:
    """Greedy contiguous sequence packing — the documents → fixed-length
    training-sample step of a pretraining pipeline. Documents are packed in
    deterministic ``id`` order WITHIN hash shards: a global order would need
    a global sort (one reducer at 100 TB), so production packing shards
    first and packs within shards — each shard's window sorts independently
    in its own partition. A document lands in the bin where its span starts
    (bin = floor(preceding-tokens / seq_len)); bins therefore straddle
    document boundaries exactly like causal-LM sample packing does.

    Output: (shard, bin, n_docs, n_tokens, fill_ratio) — fill_ratio > 1 on
    bins whose last document overflows into the next bin.
    """
    from pyspark.sql import Window as W

    shard = F.pmod(F.col(id_col), F.lit(num_shards))
    w = W.partitionBy("shard").orderBy(id_col)
    cum = F.sum(token_count_col).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    binned = df.select(
        shard.alias("shard"), F.col(id_col), F.col(token_count_col)
    ).select(
        "shard",
        id_col,
        token_count_col,
        F.floor((cum - F.col(token_count_col)) / F.lit(seq_len)).alias("bin"),
    )
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(token_count_col).cast("long").alias("n_tokens"),
            F.round(F.sum(token_count_col) / F.lit(seq_len), 4).alias("fill_ratio"),
        )
    )


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    weights: dict[str, float] | None = None,
    method: str = "lcg",
    max_iter: int = 20,
) -> DataFrame:
    """Leakage-free train/eval split: documents connected by a near-dup
    pair NEVER straddle splits (a test document with a training-set
    near-duplicate silently inflates eval scores — the reason production
    pipelines split by CLUSTER, not by document).

    Connected components over the pair graph
    (:func:`promhouse_spark.operators.dedup.connected_components`) pick
    each document's representative (component-minimum id); every document
    then buckets by its REPRESENTATIVE's id, so whole clusters land in
    one split atomically. Documents with no pairs keep their own id —
    identical to :func:`hash_split` on a clean corpus. Adds ``rep`` and
    ``split`` columns; one component fixpoint + one broadcast-sized join
    (components exist only for paired docs, a small fraction of the
    corpus)."""
    from promhouse_spark.operators.dedup import connected_components

    comp = connected_components(pairs, src_col, dst_col, max_iter)
    lab = (
        df.join(
            comp.withColumnRenamed("node", id_col).withColumnRenamed(
                "component", "rep"
            ),
            id_col,
            "left",
        )
        .withColumn("rep", F.coalesce(F.col("rep"), F.col(id_col)))
    )
    out = hash_split(lab, id_col="rep", weights=weights, method=method)
    return out
