"""Build-parameter metadata for persisted indexes.

A persisted LSH/IVF index is only meaningful to a probe that uses the
SAME hash-family parameters (bands, planes, seed, ...): a mismatched
probe computes signatures in a different family and the candidate
equi-join silently returns plausible-but-wrong results. Matching the
reference's fail-loudly posture (reference src/lib/query.cljc:11-23
raises on heterogeneous types rather than coercing), every index build
writes a one-row ``_meta`` text dataset of its parameters next to the
data, and every probe asserts its own parameters against it — a
mismatch RAISES instead of returning garbage.

The sidecar is written/read through Spark itself (``createDataFrame``
.. ``write.text`` / ``read.text``), so it works on any Hadoop-visible
filesystem, not just the local disk. Reads are memoized per path and
VALIDATED against a metadata-only fingerprint of the sidecar directory
(mtime + each child file's name/length/mtime — cheap namenode calls,
no job): an index rebuilt or compacted by ANOTHER process rewrites the
sidecar with fresh UUID part-file names, so a long-lived session's
next probe re-reads the new parameters instead of validating against a
stale cached dict — without the fingerprint check, the mismatch guard
itself would pass on cached-but-wrong metadata, returning exactly the
wrong-family garbage the sidecar exists to prevent; with mtime ALONE,
two rewrites within one coarse-granularity tick would still sneak by.
A deleted index evicts its cache entry on the next read.
"""

from __future__ import annotations

import json


class IndexParamMismatch(ValueError):
    """Probe parameters disagree with the persisted index's build
    parameters — the probe would return wrong candidates, so it must
    not run."""


# path -> (sidecar fingerprint | None, parsed meta dict). Entries are
# trusted only while the sidecar's current fingerprint matches.
_META_CACHE: dict = {}


# sentinel: the stat call itself failed (transient filesystem error) —
# distinct from "the path does not exist", which is None. A failed stat
# must NOT disable the mismatch guard: the cached meta (or a re-read)
# still applies.
_STAT_ERROR = object()


def _meta_fingerprint(spark, key: str):
    """Identity fingerprint of the ``_meta`` sidecar directory via the
    Hadoop FS API (metadata-only, no Spark job): the directory mtime
    PLUS every child file's (name, length, mtime). Directory mtime
    alone is not enough on filesystems with coarse mtime granularity —
    two rewrites inside one tick would be indistinguishable and a stale
    cached meta would pass validation (the r9 advisory finding). The
    child names close that hole structurally: Spark names part files
    with a fresh per-write UUID, so any rewrite changes the fingerprint
    regardless of timestamp resolution. Returns None when the path
    provably does not exist; _STAT_ERROR when the filesystem call
    itself failed (the sidecar may well exist)."""
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(key)
        fs = p.getFileSystem(conf)
        if not fs.exists(p):
            return None
        top = fs.getFileStatus(p)
        children = tuple(sorted(
            (str(st.getPath().getName()), int(st.getLen()),
             int(st.getModificationTime()))
            for st in fs.listStatus(p)))
        return (int(top.getModificationTime()), children)
    except Exception:
        return _STAT_ERROR


def invalidate_index_meta(path: str) -> None:
    """Drop any cached sidecar for ``path`` (call after deleting or
    rebuilding an index outside write_index_meta)."""
    _META_CACHE.pop(f"{path}/_meta", None)


def write_index_meta(spark, path: str, kind: str, params: dict) -> None:
    """Persist ``{kind, **params}`` as ``<path>/_meta`` (one text row)."""
    meta = {"kind": kind, **params}
    key = f"{path}/_meta"
    (spark.createDataFrame([(json.dumps(meta, sort_keys=True),)],
                           "meta string")
     .coalesce(1).write.mode("overwrite").text(key))
    _META_CACHE[key] = (_meta_fingerprint(spark, key), meta)


def read_index_meta(spark, path: str):
    """The persisted meta dict, or None for a pre-metadata index."""
    key = f"{path}/_meta"
    fp = _meta_fingerprint(spark, key)
    if key in _META_CACHE:
        cached_fp, cached = _META_CACHE[key]
        if fp is not None and fp is not _STAT_ERROR \
                and fp == cached_fp:
            return cached
        if fp is _STAT_ERROR:
            # transient stat failure: the sidecar's state is UNKNOWN, so
            # keep enforcing the last-known meta rather than silently
            # dropping the mismatch guard (the guard regressing to
            # "pass vacuously" on a namenode hiccup is exactly the
            # wrong-family-garbage failure the sidecar exists to stop)
            return cached
        # sidecar rewritten by another process (fingerprint moved) or
        # deleted (None): drop the stale entry and re-resolve below
        _META_CACHE.pop(key, None)
    if fp is None:
        # no sidecar: an index built before metadata existed, or a
        # deleted index. Tolerated (the docstring contract still
        # applies); mismatch checks below only fire on a present sidecar.
        return None
    try:
        rows = spark.read.text(key).collect()
    except Exception as exc:
        # only a provably-absent path downgrades to "no sidecar"; any
        # other read failure propagates (fail loudly, never skip the
        # guard on a transient error)
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "does not exist" in msg:
            return None
        raise
    # a sidecar that EXISTS but does not parse is corruption, not
    # legacy — fail loudly rather than skipping the guard
    meta = json.loads(rows[0]["value"]) if rows else None
    if meta is not None and fp is not _STAT_ERROR:
        _META_CACHE[key] = (fp, meta)
    return meta


def check_index_meta(spark, path: str, kind: str, params: dict,
                     who: str) -> None:
    """Raise IndexParamMismatch unless the probe's (kind, params) match
    the persisted sidecar. Missing sidecar (legacy index) passes."""
    meta = read_index_meta(spark, path)
    if meta is None:
        return
    want = {"kind": kind, **params}
    diffs = {k: (meta.get(k), v) for k, v in want.items()
             if meta.get(k) != v}
    if diffs:
        detail = ", ".join(f"{k}: index={a!r} probe={b!r}"
                           for k, (a, b) in sorted(diffs.items()))
        raise IndexParamMismatch(
            f"{who}: probe parameters do not match the index built at "
            f"{path} ({detail}). Probing with mismatched parameters "
            f"would return wrong candidates; rebuild the index or probe "
            f"with the recorded parameters.")
