"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full execution, no driver
collect cost). First query pays JVM/session warm-up; a warmup pass on a
trivial action reduces that noise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from promhouse_spark.session import get_spark, load_table  # noqa: E402
from promhouse_spark.workloads import QUERIES  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "orders_semijoin_bigqty",
    "ph_series_group",
    "ph_downsample_1h",
    "ph_semijoin_subquery",
    "ph_delta_window",
    "ph_sessionize",
    "doc_shingle_jaccard_lsh",
    "doc_minhash_lsh",
    "emb_cosine_topk",
]

# Extended tier (r12, additions-only per the r11 verdict): one representative
# each of the curation / streaming / k-means / native-histogram surfaces the
# r11 optimizations landed on, so cross-round PERF sees that surface. They are
# timed with the identical methodology and ADDED to the `queries` map;
# `value` stays the sum of the original 13-query HEADLINE so the headline
# total remains comparable across every prior round, and `value_extended`
# reports the headline+extended total.
EXTENDED = [
    "doc_curation_pipeline2",
    "ph_stream_dedup",
    "emb_kmeans_topics",
    "nhist_quantile",
]


def _loadavg() -> list[float] | None:
    """1/5/15-minute load averages, None where /proc is unavailable."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # Quiet-run protocol (r8: the same code measured 9.3 s at loadavg 2.9
    # vs 5.85 s at loadavg 0.1 — a busy machine fakes a regression against
    # the 2x gate). Spin-wait for the 1-min loadavg to settle below the
    # threshold before timing; if it never does within the budget, run
    # anyway but stamp the artifact "quiet": false so cross-round
    # comparisons know the number is polluted.
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "1.0"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_SEC", "600"))
    # ncpu is the EFFECTIVE parallelism ($SPARK_GRAFT_CPUS, the local[N] the
    # session really runs with) — r11 reported os.cpu_count() here, which made
    # the driver's low-core scaling run look like the env var was ignored.
    from promhouse_spark.session import default_parallelism

    ncpu = default_parallelism()
    host_cpus = os.cpu_count() or 1
    waited = 0.0
    load_before = _loadavg()
    while (
        load_before
        and load_before[0] > load_max
        and waited < wait_budget
    ):
        print(
            f"loadavg {load_before[0]:.2f} > {load_max} — waiting for a quiet "
            f"machine ({waited:.0f}/{wait_budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(30)
        waited += 30
        load_before = _loadavg()
    quiet = not load_before or load_before[0] <= load_max
    if not quiet:
        print(
            f"WARNING: loadavg {load_before[0]:.1f} before bench on {ncpu} CPUs "
            "— machine is busy; timings will overstate engine cost",
            file=sys.stderr,
        )
    spark = get_spark(app_name="promhouse-bench")

    # warm up the session (JVM classload, parquet footer reads)
    load_table(spark, sf_dir, "lineitem").count()

    # Steady-state methodology: one warm-up run (absorbs Catalyst plan
    # compile + codegen/JIT, which on local mode can exceed the execution
    # itself), then 3 timed runs, report the MEDIAN. r2 showed single
    # measurements wobble ±25-50% on untouched queries (VERDICT r2 #5);
    # the median of 3 is stable run-to-run. (On a long-lived server the
    # plans are warm — this matches the deployment model.)
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    timings_max: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE + EXTENDED:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            runs: list[float] = []
            for attempt in range(4):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                if attempt > 0:  # attempt 0 is the warm-up
                    runs.append(time.time() - t0)
            runs.sort()
            timings[name] = round(runs[len(runs) // 2], 3)
            timings_min[name] = round(runs[0], 3)
            timings_max[name] = round(runs[-1], 3)
        except Exception as e:  # noqa: BLE001 — a failed query must not kill the JSON line
            timings[name] = round(time.time() - t0, 3)
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    # value = the original 13-query HEADLINE total (comparable to every
    # prior round's artifact); the extended tier is reported alongside.
    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    total_ext = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_extended": total_ext,
        # spread across the 3 timed runs per query — sub-second queries
        # wobble ±25-50% run-to-run on local mode, so cross-round deltas
        # smaller than (value - value_min) are measurement noise, not a
        # plan change (r10 verdict: a ±0.3 s wobble must not read as a
        # regression)
        "value_min": round(sum(v for n, v in timings_min.items() if n in HEADLINE), 3)
        if timings_min
        else None,
        "value_max": round(sum(v for n, v in timings_max.items() if n in HEADLINE), 3)
        if timings_max
        else None,
        "queries_min": timings_min,
        "queries_max": timings_max,
        "sf": sf,
        "loadavg_before": load_before,
        "loadavg_after": _loadavg(),
        "ncpu": ncpu,
        "host_cpus": host_cpus,
        "master": spark.sparkContext.master,
        "quiet": quiet,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
