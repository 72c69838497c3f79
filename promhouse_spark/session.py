"""SparkSession factory + testdata loaders.

Tuned for the harness environment (single-JVM ``local[N]``) while keeping the
settings that matter on a real multi-executor cluster: AQE on (runtime
re-planning, skew-join splitting), shuffle partitions sized to parallelism
instead of the 200 default, Arrow for the Python edge, UTC session time so
results compare bit-for-bit against UTC-naive oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "promhouse-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver's synthetic `events` table stores TIMESTAMP(NANOS) which
        # the vanilla parquet reader rejects; read as long and convert in
        # load_table().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Driver testdata timestamps carry isAdjustedToUTC=false; read them as
        # session-TZ (UTC) instants, not TIMESTAMP_NTZ, so unix_micros() et al
        # apply and semantics match the UTC-naive DuckDB oracle.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# DataFrame-handle memo for load_table: repeated query builds re-resolve the
# same parquet sources, and every spark.read.parquet() pays driver-side file
# listing + footer schema read (~0.15-0.2 s each — guide §6 file-listing
# cost; measured r11: q5 built 6 scans = ~0.6 s of pure metadata per bench
# run). The memo stores the resolved DataFrame PLAN only — no rows, no
# results; every execution still scans parquet. Keyed by (application, path,
# mtime) so a rewritten table (or a new session) re-resolves.
_TABLE_MEMO: dict[tuple[str, str, float, int], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table, normalizing physical quirks.

    ``events.ts`` is TIMESTAMP(NANOS) on disk; with ``nanosAsLong`` it scans
    as a long which we convert to a proper timestamp column (microsecond
    truncation — same instant the oracle sees).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        mtime, fsize = st.st_mtime, st.st_size
    except OSError:
        mtime, fsize = -1.0, -1
    app = spark.sparkContext.applicationId
    # size is in the key alongside mtime (a rewrite within one mtime tick
    # would otherwise serve a stale file listing — r11 ADVICE), and
    # entries of stopped sessions / superseded (path, mtime, size) keys
    # are evicted on insert so the memo cannot grow without bound
    key = (app, os.path.abspath(path), mtime, fsize)
    cached = _TABLE_MEMO.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Belt-and-braces for sessions we didn't build: if the scan still came
    # back TIMESTAMP_NTZ, cast to session-TZ timestamp (UTC ⇒ same instant).
    for fname, ftype in df.dtypes:
        if ftype == "timestamp_ntz":
            df = df.withColumn(fname, F.col(fname).cast("timestamp"))
    for k in [
        k
        for k in _TABLE_MEMO
        if k[0] != app or (k[1] == key[1] and k != key)
    ]:
        del _TABLE_MEMO[k]
    _TABLE_MEMO[key] = df
    return df


def materialize_tier(
    df: DataFrame, durable: bool = False, site: str = ""
) -> DataFrame:
    """Eagerly materialize a multiply-consumed intermediate tier, truncating
    its lineage so each consumer reuses ONE execution (optimization guide
    §3.3/§5). Always computed inside the calling query's run — every run
    recomputes and rewrites; no result ever survives into the next run
    (unlike ``persist``, whose CacheManager would silently serve a second
    identical run from the first run's cache).

    ``durable=False`` (default, for decision-sized tiers: candidate pairs,
    signatures, sketches) uses ``localCheckpoint`` — executor-local
    storage, cheapest, but the data dies with an executor.

    ``durable=True`` is for CORPUS-SIZED tiers (a cleaned/filtered copy of
    the input corpus): ``localCheckpoint`` would pin the whole corpus to
    executor-local storage with NO lineage, so at 100 TB any executor loss
    kills the job. The tier instead stages as parquet under
    ``$SPARK_GRAFT_CHECKPOINT_DIR`` (durable storage — HDFS/object store —
    in production; a per-app temp dir locally) and is read back, so every
    consumer scans a durable columnar copy with pruning/pushdown intact.
    This is deliberately write+read-back rather than ``df.checkpoint``:
    a reliable RDD checkpoint runs a SECOND job to write the checkpoint
    files, recomputing the whole chain (measured 1.5-3x slower at sf0.1,
    r12), while the parquet stage computes once. ``site`` names the call
    site so repeated runs overwrite one fixed path per tier instead of
    accumulating."""
    if df.isStreaming:
        return df
    if not durable:
        return df.localCheckpoint(eager=True)
    spark = df.sparkSession
    import tempfile
    import uuid

    base = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or os.path.join(
        tempfile.gettempdir(),
        f"phs_tiers_{spark.sparkContext.applicationId}",
    )
    path = os.path.join(base, site or f"tier_{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    from promhouse_spark.schemas import TESTDATA_TABLES

    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
