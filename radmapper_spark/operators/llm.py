"""LLM-assisted operators (`$llmExtract`, `$llmMatch`) — SURVEY.md §2.10.

The reference posts to an OpenAI endpoint (builtin.cljc:2489-2738). No
network access exists in this environment, so the LLM call itself is a
clearly-marked stub behind ``RM_LLM_ENDPOINT``; the Spark-side plumbing
(batched pandas UDF over a text column — the shape that matters at scale)
is real and tested with a deterministic fake.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional


def _call_llm(prompt: str) -> str:
    endpoint = os.environ.get("RM_LLM_ENDPOINT")
    if not endpoint:
        raise NotImplementedError(
            "LLM endpoint not configured (set RM_LLM_ENDPOINT); "
            "use llm_extract_column for the deterministic Spark path"
        )
    raise NotImplementedError("remote LLM calls are not available in this environment")


def _heuristic_extract(src: str, seek: str) -> Optional[str]:
    """Deterministic fallback used for tests: pull the value following the
    sought label, or the first number/email-ish token matching the ask."""
    m = re.search(rf"{re.escape(seek)}\s*[:=]?\s*([^\s,;]+)", src, re.IGNORECASE)
    if m:
        return m.group(1)
    if "number" in seek.lower() or "amount" in seek.lower():
        m = re.search(r"-?\d+(\.\d+)?", src)
        return m.group(0) if m else None
    return None


def llm_extract(src: str, seek: str):
    out = _heuristic_extract(src, seek)
    return out if out is not None else None


def llm_match(src, tar, opts=None):
    """Schema shape-matching: driver-level operation on two schemas. The
    reference asks an LLM for a mapping function; the deterministic
    fallback aligns attributes by normalized-name equality."""
    def names(obj, prefix=""):
        out = {}
        if isinstance(obj, dict):
            for k, v in obj.items():
                p = f"{prefix}.{k}" if prefix else str(k)
                out[_norm(k)] = p
                out.update(names(v, p))
        return out

    def _norm(s: str) -> str:
        return re.sub(r"[^a-z0-9]", "", str(s).lower())

    src_names = names(src)
    tar_names = names(tar)
    mapping = {sp: tar_names[n] for n, sp in src_names.items() if n in tar_names}
    return {"mapping": mapping, "method": "name-alignment-fallback"}


def llm_extract_column(df, text_col: str, seek: str, out_col: str = "extracted"):
    """Batched extraction over a DataFrame text column: Arrow-batched
    pandas UDF (the 100 TB path — one LLM/heuristic call per row inside a
    vectorized batch, never a driver loop)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    # NB: the extraction logic is inlined (not a module-global reference) so
    # cloudpickle ships it BY VALUE — executor Python workers must not need
    # `radmapper_spark` importable (the driver may run from any cwd).
    def extract(batch):
        import re as _re

        def one(src):
            m = _re.search(rf"{_re.escape(seek)}\s*[:=]?\s*([^\s,;]+)", src,
                           _re.IGNORECASE)
            if m:
                return m.group(1)
            if "number" in seek.lower() or "amount" in seek.lower():
                m = _re.search(r"-?\d+(\.\d+)?", src)
                return m.group(0) if m else None
            return None

        return batch.map(lambda s: one(s or ""))

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf inspector can't resolve — set them as real objects
    extract.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    extract_udf = pandas_udf(extract, "string")

    return df.withColumn(out_col, extract_udf(F.col(text_col)))
