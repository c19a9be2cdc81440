#!/usr/bin/env python
"""Round-17 measurement harness (guide §1: measure first).

Usage:
  python scripts/profile_r17.py QUERY [QUERY...] [--runs N] [--explain DIR]
      [--noop] [--sf DIR]

Per query: builds the entry DataFrame, optionally dumps
.explain("formatted") to DIR/<query>.txt, then times `--runs`
executions with the bench's action (collect; --noop switches to the
noop sink per guide §1.4) and prints per-run seconds plus the
/proc/stat steal delta around each run (this sandbox sees 15-40%
CPU-steal waves; a run with material steal is not evidence).

Interleaved A/B: pass several queries and --interleave — runs cycle
through the list so a steal wave pollutes at most one sample per
query (the OPTIMIZATION_r17.md methodology).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from radmapper_spark.session import get_spark


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8])


def total_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return sum(int(x) for x in parts[1:])


def run_once(fn, spark, sf_dir, noop: bool) -> tuple:
    s0, t0 = steal_jiffies(), total_jiffies()
    w0 = time.monotonic()
    df = fn(spark, sf_dir)
    if noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()
    elapsed = time.monotonic() - w0
    s1, t1 = steal_jiffies(), total_jiffies()
    steal_pct = 100.0 * (s1 - s0) / max(1, (t1 - t0))
    release = getattr(df, "rm_release_cache", None)
    if release is not None:
        release()
    return elapsed, steal_pct


def main() -> None:
    # argparse instead of hand-rolled sys.argv scanning (ADVICE r17: the
    # remove-by-value form silently dropped a query whose name equalled a
    # flag's value, e.g. --runs 3 plus a query literally named '3')
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", metavar="DIR", default=None)
    ap.add_argument("--sf", metavar="DIR", default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--interleave", action="store_true")
    ap.add_argument("--split", action="store_true")
    ns = ap.parse_args()
    args, runs, explain_dir = ns.queries, ns.runs, ns.explain
    noop, interleave = ns.noop, ns.interleave
    if ns.sf:
        os.environ["SPARK_GRAFT_SF_DIR"] = ns.sf

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17-profile")
    qs = entrymod.queries()
    names = args or list(qs)
    for n in names:
        if n not in qs:
            print(f"unknown query: {n}", file=sys.stderr)
            sys.exit(2)

    # untimed warm-up (JVM/codegen/Arrow pool), bench parity
    try:
        qs["pricing_summary"](spark, sf_dir).collect()

        def _noop_pd(batches):
            for pdf in batches:
                yield pdf

        spark.range(32).repartition(32).mapInPandas(
            _noop_pd, schema="id long").count()
    except Exception as exc:
        print(f"warmup failed: {exc}", file=sys.stderr)

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for n in names:
            df = qs[n](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(explain_dir, f"{n}.txt"), "w") as f:
                f.write(txt)
            release = getattr(df, "rm_release_cache", None)
            if release is not None:
                release()
            print(f"explain written: {explain_dir}/{n}.txt")

    if ns.split:
        # breakdown: python plan construction / JVM optimize (explain) /
        # execution — tells whether a slow bench entry is driver-bound
        # (plan size) or executor-bound at this SF
        for n in names:
            for r in range(runs):
                t0 = time.monotonic()
                df = qs[n](spark, sf_dir)
                t1 = time.monotonic()
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "cost")
                t2 = time.monotonic()
                df.collect()
                t3 = time.monotonic()
                release = getattr(df, "rm_release_cache", None)
                if release is not None:
                    release()
                print(f"{n}: build {t1-t0:6.3f}  optimize {t2-t1:6.3f}  "
                      f"exec {t3-t2:6.3f}  total {t3-t0:6.3f}", flush=True)
        spark.stop()
        return

    results: dict[str, list] = {n: [] for n in names}
    order = (names * runs if interleave
             else [n for n in names for _ in range(runs)])
    for n in order:
        spark.sparkContext.setJobDescription(f"profile:{n}")
        el, st = run_once(qs[n], spark, sf_dir, noop)
        results[n].append((el, st))
        print(f"{n}: {el:7.3f} s  (steal {st:4.1f}%)", flush=True)
    print("--- summary (min / all) ---")
    for n in names:
        rs = results[n]
        clean = [e for e, s in rs if s < 2.0]
        best = min(e for e, _ in rs)
        tag = "" if clean and min(clean) == best else " [steal-tainted]"
        print(f"{n}: min {best:.3f} s{tag}  "
              f"runs {['%.2f@%.0f%%' % (e, s) for e, s in rs]}")
    spark.stop()


if __name__ == "__main__":
    main()
