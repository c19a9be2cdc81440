#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from radmapper_spark.session import get_spark

WARMUP_QUERY = "pricing_summary"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("radmapper-bench")
    qs = entrymod.queries()

    # Warm the JVM/codegen path once so per-query numbers measure the plan,
    # not first-touch classloading.
    try:
        qs[WARMUP_QUERY](spark, sf_dir).collect()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            timings[name] = round(time.monotonic() - t0, 4)
        except Exception as exc:  # keep the bench line parseable on failures
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    ok = [v for v in timings.values() if v >= 0]
    total = round(sum(ok), 4)
    print(
        json.dumps(
            {
                "metric": "total_sec_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "n_failed": len(timings) - len(ok),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
