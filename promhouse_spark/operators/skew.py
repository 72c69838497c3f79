"""Skew-mitigation operators: deterministic salting for hot keys.

AQE's skew-join splitting (enabled session-wide, ``session.py``) handles
sort-merge join skew at runtime, but two shapes still need explicit salting
at 100 TB:

- **hot-key distinct aggregation** — ``count_distinct`` per key shuffles
  every (key, value) pair to one reducer per key; a hot key (the ``__name__
  = "up"`` of a billion-series registry, the stopword token of a web corpus)
  serializes on one task. Salting splits the key's value space into ``n``
  deterministic sub-keys, distincts within each, and merges counts — two
  small exchanges instead of one giant skewed one.
- **hot-key join against a small side** — when the big side's key histogram
  is a power law and the small side fits in memory ×``n``, replicating the
  small side over ``n`` salt values spreads the hot key across ``n`` tasks.
  (AQE can split sort-merge skew, but a replicated salt join avoids the
  sort entirely and keeps the hot key's probe local.)

Salts are DETERMINISTIC (hash of the value / row, never ``rand()``): plans
stay replayable, retried tasks produce identical partitions (no shuffle
non-determinism on speculative re-execution), and tests can pin results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Per-key exact distinct count that survives hot keys.

    Phase 1 groups by (keys…, salt = hash(value) mod n): each hot key's
    value space splits across ``n_salts`` reducers, each computing a
    partial distinct. Because the salt is a pure function OF THE VALUE,
    the same value always lands in the same sub-group — partial distinct
    counts are disjoint and their sum is the exact global distinct count.
    Phase 2 sums the partials per key (tiny exchange: n_salts rows/key)."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.groupBy(*[F.col(k) for k in keys], salt)
        .agg(F.count_distinct(F.col(value_col)).alias("__partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__partial").cast("long").alias(out_col))
    )


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """Per-key collect_set via value-salted sub-groups + flatten — bounds
    the per-task buffer for hot keys to ~1/n of the key's value set."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.groupBy(*[F.col(k) for k in keys], salt)
        .agg(F.collect_set(F.col(value_col)).alias("__part"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.array_sort(F.flatten(F.collect_list("__part"))).alias(out_col)
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicated-salt equi-join: big side gets a deterministic salt from
    its whole row; the small side is exploded ×``n_salts`` (one copy per
    salt value) so every (key, salt) combination exists. The hot key's
    probe work spreads over ``n_salts`` tasks; the small side must afford
    ×``n_salts`` replication (use for dimension-table joins, not
    fact-fact). Result is row-identical to ``big.join(small, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salt_col = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(n_salts)
    )
    b = big.withColumn("__salt", salt_col)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = b.join(s, on + ["__salt"], how)
    return out.drop("__salt")


def key_histogram(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Skew diagnosis: per-key row counts, heaviest first — the thing to
    look at before choosing n_salts."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top)
    )
