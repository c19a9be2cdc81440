#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing design (rounds 2/3/5 each recorded phantom per-query regressions
from sandbox load spikes, so this is deliberately spike-robust):
- one untimed warm-up query first (JVM/codegen/classloader warm-up);
- then TWO full interleaved PASSES over all queries (not back-to-back
  repeats of each query: a multi-second external load spike then pollutes
  at most one pass for any given query, whereas back-to-back best-of-2
  landed both samples inside the same spike);
- per-query result = min across passes, plus ONE adaptive extra sample
  when the passes disagree by more than 1.5x.
Any operator cache the entry attached via `rm_release_cache` is released
after each run so persisted frames don't accumulate across the session.
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
RUNS_PER_QUERY = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def _stat_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — this sandbox sees
    15-40% CPU-steal waves, so every sample carries its own noise
    evidence (r17 verdict item 6). Returns (0, 1) where unreadable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return vals[7] if len(vals) > 7 else 0, max(1, sum(vals))
    except Exception:
        return 0, 1


def _run_once(fn, spark, sf_dir) -> tuple[float, float]:
    s0, t0j = _stat_jiffies()
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.collect()
    elapsed = time.monotonic() - t0
    s1, t1j = _stat_jiffies()
    release = getattr(df, "rm_release_cache", None)
    if release is not None:
        release()
    steal_pct = 100.0 * (s1 - s0) / max(1, t1j - t0j)
    return elapsed, steal_pct


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("radmapper-bench")
    qs = entrymod.queries()

    # Warm the JVM/codegen path once so per-query numbers measure the plan,
    # not first-touch classloading.
    try:
        _run_once(qs[WARMUP_QUERY], spark, sf_dir)
    except Exception:
        pass
    # Warm the Python/Arrow worker pool too (fork + Arrow init is paid by
    # whichever pandas-UDF query runs first — with worker reuse on, one
    # untimed touch moves that cost out of the timed section uniformly).
    try:
        def _noop(batches):
            for pdf in batches:
                yield pdf

        spark.range(32).repartition(32).mapInPandas(
            _noop, schema="id long").count()
    except Exception:
        pass

    samples: dict[str, list[tuple[float, float]]] = {name: [] for name in qs}
    failed: set[str] = set()
    for _ in range(max(1, RUNS_PER_QUERY)):
        for name, fn in qs.items():
            if name in failed:
                continue
            try:
                samples[name].append(_run_once(fn, spark, sf_dir))
            except Exception as exc:  # keep the bench line parseable on failures
                print(f"bench error in {name}: {exc}", file=sys.stderr)
                failed.add(name)
    for name, fn in qs.items():
        runs = samples[name]
        if name not in failed and len(runs) >= 2 \
                and max(r[0] for r in runs) > 1.5 * min(r[0] for r in runs):
            # the passes disagree: at least one hit an external load
            # spike — take one more sample so best-of reflects the plan
            try:
                runs.append(_run_once(fn, spark, sf_dir))
            except Exception as exc:
                print(f"bench error in {name}: {exc}", file=sys.stderr)

    timings = {name: (round(min(r[0] for r in runs), 4)
                      if runs and name not in failed else -1.0)
               for name, runs in samples.items()}
    # steal jiffies observed AROUND the chosen (min) run — sidecar-only
    # noise evidence (r17 verdict item 6: cold driver runs carry no way
    # to tell a regression from a co-tenant wave). stdout line unchanged.
    steal = {name: round(min(runs, key=lambda r: r[0])[1], 2)
             for name, runs in samples.items() if runs and name not in failed}

    ok = [v for v in timings.values() if v >= 0]
    total = round(sum(ok), 4)
    # The full 90-query map overflowed the driver's stdout tail capture in
    # round 6 (BENCH_r06.json "parsed": null), so the per-query timings go
    # to a sidecar file and the stdout line keeps only summary fields plus
    # the 10 slowest queries (the ones a reader acts on).
    # The tracked BENCH_QUERIES.json is only rewritten under --record
    # (or RM_BENCH_RECORD=1): the driver's own per-round run otherwise
    # left a modified tracked file at every judge checkout (r14 verdict
    # item #7). Non-record runs write the sidecar next to the committed
    # one with a .last suffix (gitignored) so the full map is still
    # inspectable.
    record = ("--record" in sys.argv
              or os.environ.get("RM_BENCH_RECORD") == "1")
    qname = "BENCH_QUERIES.json" if record else "BENCH_QUERIES.last.json"
    qfile = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         qname)
    with open(qfile, "w") as f:
        json.dump({"sf": sf, "queries": timings, "steal_pct_min_run": steal},
                  f, indent=1, sort_keys=True)
    slowest = dict(sorted(((n, v) for n, v in timings.items() if v >= 0),
                          key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "total_sec_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "queries_file": qname,
                "record": record,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "n_failed": len(timings) - len(ok),
                "failed": sorted(failed)[:5],
                # environmental context: rounds 2/3/5 recorded phantom
                # per-query regressions under sandbox load spikes —
                # the load average makes cross-round drift attributable
                "load_avg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    # release the per-(session, sf_dir) derived-table caches so repeated
    # in-process bench invocations don't accumulate persisted frames
    from radmapper_spark.entrypoints import release_edge_cache

    release_edge_cache()
    spark.stop()


if __name__ == "__main__":
    main()
