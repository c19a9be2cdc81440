"""SparkSession construction tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); the conf below is nevertheless written for a real multi-executor
cluster at ~100 TB:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  so the same logical plans survive a 1000x scale-up without hand-tuning.
- ``spark.sql.shuffle.partitions`` sized from the env (small local default;
  a cluster deployment overrides via ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` or
  relies on AQE coalescing from a high initial value).
- Arrow enabled for every pandas-UDF boundary (the only places Python
  touches row data).
- Broadcast threshold left at default; plans additionally use explicit
  ``F.broadcast`` hints for dimension tables (region/nation/supplier) so the
  intent survives even where stats are missing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "radmapper-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(int(cpus), 8)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Driver parquet writes TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read as epoch-nanos longs and rebuild timestamps
        # in load_tables (truncation to micros matches DuckDB's view).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


# Columns stored as TIMESTAMP(NANOS) in the driver parquet; surfaced to
# Spark as epoch-nano longs (see nanosAsLong conf) and rebuilt here.
TS_NANO_COLS = {
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
    "events": ("ts",),
}


# (session_key(session), sf_dir) -> (sf_fingerprint, table-name ->
# DataFrame). DataFrames are immutable logical plans, so handing every
# caller the same dict is safe; what this saves is the 10 parquet footer
# reads + schema resolutions a fresh load pays (~0.3 s per call —
# measurable x90 queries x2 bench passes). No persisted data is held, so
# there is nothing to release; stale sessions are evicted on the next
# different-key call. The fingerprint recorded at memo-build time is
# revalidated on EVERY hit (file stats only — no jobs), so no caller can
# read through a pinned file listing after an external rewrite — in
# particular a derived-frame cache's FIRST build (cache miss) no longer
# needs its own invalidate call to avoid stamping a fresh fingerprint
# onto frames built from stale scans (r11 advice, medium).
_TABLE_CACHE: dict = {}


def sf_fingerprint(sf_dir: str):
    """(name, mtime_ns, size) of every parquet file under sf_dir — the
    staleness witness for the table memo above and the derived-frame
    caches in entrypoints. mtime_ns (not seconds) so same-tick rewrites
    are distinguishable (the persisted-index sidecar lesson,
    index_meta.py). One os.stat per file: separate stat calls for mtime
    and size could interleave with a rewrite and yield a chimeric
    (old-mtime, new-size) witness (r11 advice)."""
    try:
        out = []
        for n in sorted(os.listdir(sf_dir)):
            if n.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, n))
                out.append((n, st.st_mtime_ns, st.st_size))
        return tuple(out)
    except OSError:
        return None


def session_key(spark: SparkSession) -> tuple:
    """Stable identity for a live SparkSession, safe to key caches by.

    ``id(spark)`` is NOT safe: CPython reuses freed object addresses, so
    a new session can alias a stopped one's id and a cache would hand
    back DataFrames bound to the dead session. (applicationId,
    startTime) is unique per SparkContext — a restarted context gets a
    fresh appId (and, pathologically, at least a fresh startTime)."""
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict:
    """Load the driver-provided parquet tables as DataFrames.

    Reads are plain ``spark.read.parquet`` so Catalyst gets predicate
    pushdown + column pruning into the scan for free. The nano-timestamp
    rebuild is a cheap projection; pushdown on the rebuilt column becomes a
    filter on the underlying long, which still prunes row groups.
    """
    from pyspark.sql import functions as F

    cache_key = (session_key(spark), sf_dir)
    fp = sf_fingerprint(sf_dir)
    hit = _TABLE_CACHE.get(cache_key)
    if hit is not None:
        # None (fingerprinting failed, e.g. listdir EACCES while the
        # reads themselves would work) must compare UNEQUAL even to a
        # None stamp: treating None == None as fresh would silently
        # revert to never-validating exactly when the witness is blind
        # (r12 review). The conservative direction is a spurious
        # rebuild per call — plans only, no data re-read until action.
        if hit[0] is not None and hit[0] == fp:
            return dict(hit[1])
        # External rewrite since the memo was built: the memoized
        # DataFrames pin the old file listing and Spark's FileIndex
        # caches the old split offsets — drop both before re-reading.
        invalidate_tables(spark, sf_dir)
    # The driver may hand us a session built without our configs; this conf
    # is runtime-settable and required to read the TIMESTAMP(NANOS) parquet.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->LTZ cast below is wall-clock-identical only when the session
    # timezone is UTC; pin it so driver-provided sessions match the
    # bigint epoch-micros path exactly.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in TS_NANO_COLS.get(name, ()):
            dt = dict(df.dtypes).get(c)
            if dt == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            elif dt == "timestamp_ntz":
                # Newer driver parquet stores TIMESTAMP(MICROS) without UTC
                # adjustment, which Spark surfaces as TIMESTAMP_NTZ. The
                # session runs in UTC, so the cast is wall-clock-identical;
                # LTZ is required by withWatermark and the datetime builtins.
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        out[name] = df
    for k in [k for k in _TABLE_CACHE if k[0] != cache_key[0]]:
        del _TABLE_CACHE[k]  # dead sessions: plans only, no data held
    # fp was computed BEFORE the reads: if a rewrite raced the load, the
    # stamp is older than the data and the next call rebuilds — the
    # conservative direction (never a fresh stamp over stale scans).
    _TABLE_CACHE[cache_key] = (fp, out)
    return dict(out)


def invalidate_tables(spark: SparkSession, sf_dir: str) -> None:
    """Drop the table memo for (session, sf_dir) AND Spark's own cached
    file listings under the directory. A memoized DataFrame pins the
    FileStatus listing (file lengths, split offsets) captured at first
    load, so after an external rewrite a re-executed plan can read the
    new file with stale offsets (EOF / corrupt-footer failures) —
    load_tables calls this itself whenever its memo's fingerprint goes
    stale (r11 review finding #1 + the r11-advice first-build gap), so
    every consumer inherits the staleness contract."""
    _TABLE_CACHE.pop((session_key(spark), sf_dir), None)
    for name in TABLES:
        try:
            spark.catalog.refreshByPath(f"{sf_dir}/{name}.parquet")
        except Exception:
            pass  # table absent under a partial/custom dir: nothing cached
