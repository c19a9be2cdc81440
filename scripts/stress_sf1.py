"""Run the 10 slowest bench entries at /tmp/sf1 (10x sf0.1) and at
sf0.1 in the same session/protocol (warm-up + 2 passes, min), printing
per-entry linearity ratios."""
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from radmapper_spark.session import get_spark

import __spark_entry__ as m

TOP = ["dedup_keep_best", "graph_communities", "graph_pagerank",
       "substring_scrub", "bpe_chunks", "moore_lewis_select",
       "curriculum_order", "dedup_rate_report", "ann_opq_topk",
       "substring_removal_spans"]

spark = get_spark("sf1-stress")
qs = m.queries()


def run(name, sf):
    t0 = time.monotonic()
    df = qs[name](spark, sf)
    n = df.count() if hasattr(df, "count") else len(df.collect())
    el = time.monotonic() - t0
    rel = getattr(df, "rm_release_cache", None)
    rel and rel()
    return el, n


# untimed warm-up (JVM + arrow pool)
run("graph_pagerank", "/root/testdata/sf0.1")

results = {}
for sf, tag in [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")]:
    for name in TOP:
        best, rows = None, None
        for _ in range(2):
            el, n = run(name, sf)
            best = el if best is None else min(best, el)
            rows = n
        results[(name, tag)] = (best, rows)
        print(f"{tag} {name} {best:.2f}s rows={rows}", flush=True)

print("\n=== linearity (sf1 time / sf0.1 time; 10x data => ~<=13x linear)")
for name in TOP:
    a, _ = results[(name, "sf0.1")]
    b, _ = results[(name, "sf1")]
    print(f"{name}: {a:.2f}s -> {b:.2f}s  ratio {b / a:.1f}x")
print("STRESS DONE")
