"""Measured scaling curve: the headline queries at several scale factors.

Runs each HEADLINE query (bench.py list) at each given sf directory —
1 warm-up + 2 timed runs, keeping the min (ratios across sf are the
point here, not cross-round absolute comparability) — and prints one JSON
object with per-sf per-query seconds plus load annotations.

sf1 comes from tools/gen_sf.py (the shipped testdata stops at sf0.1).

Usage: python3 tools/bench_scaling.py [sf_dir ...]
       default: /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/phs-sf1
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _loadavg  # noqa: E402
from promhouse_spark.session import get_spark, load_table  # noqa: E402
from promhouse_spark.workloads import QUERIES  # noqa: E402


def run_sf(spark, sf_dir: str) -> dict[str, float]:
    load_table(spark, sf_dir, "lineitem").count()
    out: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for attempt in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            if attempt > 0:
                runs.append(time.time() - t0)
        out[name] = round(min(runs), 3)
        print(f"  {sf_dir} {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/tmp/phs-sf1",
    ]
    spark = get_spark(app_name="promhouse-bench-scaling")
    result = {"metric": "scaling_curve", "loadavg_before": _loadavg(), "sfs": {}}
    for d in dirs:
        m = re.search(r"sf([0-9.]+)", d)
        sf = m.group(1) if m else d
        timings = run_sf(spark, d)
        result["sfs"][sf] = {
            "dir": d,
            "queries": timings,
            "total": round(sum(timings.values()), 3),
        }
    result["loadavg_after"] = _loadavg()
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
