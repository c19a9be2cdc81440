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
filesystem, not just the local disk. Reads are memoized per path: a
probe's second construction against the same index costs zero jobs.
"""

from __future__ import annotations

import json


class IndexParamMismatch(ValueError):
    """Probe parameters disagree with the persisted index's build
    parameters — the probe would return wrong candidates, so it must
    not run."""


# path -> parsed meta dict; plain plans/values only, nothing persisted.
_META_CACHE: dict = {}


def write_index_meta(spark, path: str, kind: str, params: dict) -> None:
    """Persist ``{kind, **params}`` as ``<path>/_meta`` (one text row)."""
    meta = {"kind": kind, **params}
    (spark.createDataFrame([(json.dumps(meta, sort_keys=True),)],
                           "meta string")
     .coalesce(1).write.mode("overwrite").text(f"{path}/_meta"))
    _META_CACHE[f"{path}/_meta"] = meta


def read_index_meta(spark, path: str):
    """The persisted meta dict, or None for a pre-metadata index."""
    key = f"{path}/_meta"
    if key in _META_CACHE:
        return _META_CACHE[key]
    try:
        rows = spark.read.text(key).collect()
    except Exception:
        # no sidecar: an index built before metadata existed. Tolerated
        # (the docstring contract still applies); mismatch checks below
        # only fire when a sidecar is present.
        return None
    # a sidecar that EXISTS but does not parse is corruption, not
    # legacy — fail loudly rather than skipping the guard
    meta = json.loads(rows[0]["value"]) if rows else None
    if meta is not None:
        _META_CACHE[key] = meta
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
