"""Registry-cardinality stress gate.

The sf ladder scales SAMPLE volume ~linearly but keeps series cardinality
small; the untested 100×-at-scale edge is the driver-side registry dict
(reference parity, clickhouse.go:51-52) and everything downstream of
matcher resolution. This tool generates synthetic registries at rising
cardinalities (distributed generation — labels + pandas-UDF fingerprints,
never a driver loop), plus a thin samples tier, and measures BOTH
resolution paths at each size:

  - reload  driver-dict build: parquet scan → collect → dict (the cached
            path's fixed cost), plus the driver RSS it pins
  - match_c cached matcher resolution (_resolve_fingerprints: a Python
            loop over the dict)
  - match_d distributed matcher resolution (plans.read.select_series →
            collect only the matched fingerprints)
  - read_c / read_d  one end-to-end read() (resolution + restricted scan
            + group-into-series) under each mode

The artifact (one JSON line) is recorded as tools/cardinality_gate_r11.json
and summarized in BASELINE.md; DEFAULT_REGISTRY_CACHE_MAX_SERIES in
storage/parquet.py is set from these numbers.

Usage: python3 tools/cardinality_gate.py [cardinality ...]
       default: 100_000 1_000_000 5_000_000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from promhouse_spark.functions.fingerprint import fingerprint_map_udf  # noqa: E402
from promhouse_spark.models import Query, make_matchers  # noqa: E402
from promhouse_spark.session import get_spark  # noqa: E402
from promhouse_spark.storage.parquet import SparkParquetStorage  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_CARD_DIR", "/tmp/phs-card")
T0 = 1_700_000_000_000


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def build_store(spark, n: int) -> str:
    """Registry of n series (instance drives cardinality; __name__/job/zone
    give matchers realistic selectivities) + samples for the first 1000
    series, generated fully distributed."""
    root = os.path.join(BASE, str(n))
    if os.path.exists(os.path.join(root, "time_series", "_SUCCESS")):
        return root
    shutil.rmtree(root, ignore_errors=True)
    ids = spark.range(n)
    labels = F.create_map(
        F.lit("__name__"), F.concat(F.lit("m"), (F.col("id") % 200).cast("string")),
        F.lit("job"), F.concat(F.lit("job-"), (F.col("id") % 50).cast("string")),
        F.lit("zone"), F.concat(F.lit("z"), (F.col("id") % 10).cast("string")),
        F.lit("instance"), F.concat(F.lit("i-"), F.col("id").cast("string")),
    )
    reg = (
        ids.withColumn("labels", labels)
        .withColumn("fingerprint", fingerprint_map_udf("labels"))
        .withColumn("date", F.to_date(F.timestamp_millis(F.lit(T0))))
        .select("date", "fingerprint", "labels")
    )
    reg.write.mode("overwrite").parquet(os.path.join(root, "time_series"))
    # thin fact tier: 100 samples for each of the first 1000 series
    fps = (
        spark.read.parquet(os.path.join(root, "time_series"))
        .withColumn("iid", F.split(F.col("labels")["instance"], "-")[1].cast("long"))
        .filter(F.col("iid") < 1000)
        .select("fingerprint")
    )
    samples = (
        fps.crossJoin(spark.range(100).withColumnRenamed("id", "k"))
        .select(
            "fingerprint",
            (F.lit(T0) + F.col("k") * 15_000).alias("timestamp_ms"),
            (F.col("k") * 1.5).alias("value"),
        )
        .withColumn("date", F.to_date(F.timestamp_millis(F.col("timestamp_ms"))))
    )
    samples.write.partitionBy("date").mode("overwrite").parquet(
        os.path.join(root, "samples")
    )
    return root


def measure(spark, n: int) -> dict:
    root = build_store(spark, n)
    q = Query(
        T0,
        T0 + 3_600_000,
        make_matchers(("__name__", "=", "m7"), ("job", "=", "job-7")),
    )
    out: dict = {"n_series": n}

    # --- cached path (cutover disabled so the dict really builds) ---
    rss0 = _rss_mb()
    t0 = time.time()
    store_c = SparkParquetStorage(spark, root, registry_cache_max_series=None)
    out["reload_sec"] = round(time.time() - t0, 2)
    out["registry_rss_mb"] = round(_rss_mb() - rss0, 1)
    t0 = time.time()
    fps = store_c._resolve_fingerprints(q)
    out["match_cached_sec"] = round(time.time() - t0, 3)
    out["matched_series"] = len(fps)
    t0 = time.time()
    res = store_c.read([q])
    out["read_cached_sec"] = round(time.time() - t0, 2)
    out["read_series"] = len(res[0])

    # --- distributed path ---
    from promhouse_spark.plans.read import select_series

    store_d = SparkParquetStorage(spark, root, cache_registry=False)
    t0 = time.time()
    n_m = select_series(store_d.registry_df(), q.matchers).select("fingerprint").count()
    out["match_distributed_sec"] = round(time.time() - t0, 2)
    assert n_m == len(fps), (n_m, len(fps))
    t0 = time.time()
    res_d = store_d.read([q])
    out["read_distributed_sec"] = round(time.time() - t0, 2)
    assert len(res_d[0]) == len(res[0])

    # --- streamed remote read end-to-end under each mode (the serve path
    # the cutover protects: cached → iter_series fast path; distributed →
    # materialized read, labels joined distributed, frames streamed) ---
    try:
        from promhouse_spark.edge import prompb, snappy_codec
        from promhouse_spark.edge.http import create_app

        rq = snappy_codec.compress(
            prompb.encode_read_request_full(
                [q], [prompb.RESPONSE_TYPE_STREAMED_XOR_CHUNKS]
            )
        )
        for key, st in (("cached", store_c), ("distributed", store_d)):
            app = create_app(st)
            app.testing = True
            client = app.test_client()
            t0 = time.time()
            resp = client.post("/read", data=rq)
            body = resp.data  # drain the frame generator
            out[f"streamed_read_{key}_sec"] = round(time.time() - t0, 2)
            out[f"streamed_read_{key}_bytes"] = len(body)
            assert resp.status_code == 200
    except ImportError:
        pass  # no flask in this environment: skip the HTTP layer

    # --- the auto-cutover itself: count-only reload, no collect ---
    t0 = time.time()
    store_auto = SparkParquetStorage(spark, root)  # default cutover
    out["auto_reload_sec"] = round(time.time() - t0, 2)
    out["auto_cache_on"] = store_auto.cache_registry
    del store_c, store_d, store_auto
    return out


def main() -> None:
    ns = [int(a.replace("_", "")) for a in sys.argv[1:]] or [
        100_000,
        1_000_000,
        5_000_000,
    ]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from bench import _loadavg

    spark = get_spark(app_name="promhouse-cardinality-gate")
    result = {
        "metric": "cardinality_gate",
        "loadavg_before": _loadavg(),
        "sizes": [],
    }
    for n in ns:
        row = measure(spark, n)
        row["loadavg"] = _loadavg()
        print(f"  {json.dumps(row)}", file=sys.stderr, flush=True)
        result["sizes"].append(row)
    result["loadavg_after"] = _loadavg()
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
