"""Catalyst plan-statistics helpers.

``est_plan_bytes`` surfaces the optimizer's own sizeInBytes estimate for
a DataFrame WITHOUT running a job — the right input for "should this
side be broadcast / can ranks live on every executor" decisions made at
plan-construction time. It is an upper-bound-ish heuristic (derived from
scan sizes through Catalyst's propagation rules), exactly the number
Spark itself compares against autoBroadcastJoinThreshold, so decisions
made from it agree with what the engine would do for a plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def est_plan_bytes(df: DataFrame):
    """Optimizer-estimated size of ``df`` in bytes, or None when the
    estimate is unavailable (e.g. local relations with no stats)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return None
