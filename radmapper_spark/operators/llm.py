"""LLM-assisted operators (`$llmExtract`, `$llmMatch`) — SURVEY.md §2.10.

The reference posts to an OpenAI-style chat endpoint (builtin.cljc:
2489-2738, the POST itself at 2626-2642). Here the HTTP client is real
(stdlib urllib, chat-completions request/response shape) and activates
when ``RM_LLM_ENDPOINT`` is set — a deployment needs only the env var
(+ optional ``RM_LLM_API_KEY`` / ``RM_LLM_MODEL``). Without it, a
deterministic heuristic keeps the operators testable offline; the
Spark-side plumbing (batched pandas UDF over a text column — the shape
that matters at scale) is identical in both modes.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional


def _call_llm(prompt: str, system: str = "You are a data extraction assistant. Reply with ONLY the extracted value.") -> str:
    """POST one chat-completions request to RM_LLM_ENDPOINT and return the
    assistant message content (reference builtin.cljc:2626-2642 — query-llm
    posts {model, messages} and reads choices[0].message.content)."""
    endpoint = os.environ.get("RM_LLM_ENDPOINT")
    if not endpoint:
        raise NotImplementedError(
            "LLM endpoint not configured (set RM_LLM_ENDPOINT); "
            "use llm_extract_column for the deterministic Spark path"
        )
    import json as _json
    import urllib.request as _rq

    body = _json.dumps({
        "model": os.environ.get("RM_LLM_MODEL", "gpt-4o-mini"),
        "messages": [{"role": "system", "content": system},
                     {"role": "user", "content": prompt}],
        "temperature": 0,
    }).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    key = os.environ.get("RM_LLM_API_KEY")
    if key:
        headers["Authorization"] = f"Bearer {key}"
    req = _rq.Request(endpoint, data=body, headers=headers, method="POST")
    with _rq.urlopen(req, timeout=float(os.environ.get("RM_LLM_TIMEOUT", "30"))) as resp:
        payload = _json.loads(resp.read().decode("utf-8"))
    return payload["choices"][0]["message"]["content"]


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
    if os.environ.get("RM_LLM_ENDPOINT"):
        return _call_llm(f"Extract the {seek} from the following text:\n\n{src}")
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
    # `radmapper_spark` importable (the driver may run from any cwd). The
    # endpoint config is captured at plan build so executors don't depend on
    # their own env propagation.
    endpoint = os.environ.get("RM_LLM_ENDPOINT")
    model = os.environ.get("RM_LLM_MODEL", "gpt-4o-mini")
    api_key = os.environ.get("RM_LLM_API_KEY")
    timeout = float(os.environ.get("RM_LLM_TIMEOUT", "30"))

    def extract(batch):
        import re as _re

        def live(src):
            import json as _json
            import urllib.request as _rq
            body = _json.dumps({
                "model": model,
                "messages": [
                    {"role": "system",
                     "content": "You are a data extraction assistant. "
                                "Reply with ONLY the extracted value."},
                    {"role": "user",
                     "content": f"Extract the {seek} from the following "
                                f"text:\n\n{src}"}],
                "temperature": 0,
            }).encode("utf-8")
            headers = {"Content-Type": "application/json"}
            if api_key:
                headers["Authorization"] = f"Bearer {api_key}"
            req = _rq.Request(endpoint, data=body, headers=headers,
                              method="POST")
            with _rq.urlopen(req, timeout=timeout) as resp:
                payload = _json.loads(resp.read().decode("utf-8"))
            return payload["choices"][0]["message"]["content"]

        def one(src):
            m = _re.search(rf"{_re.escape(seek)}\s*[:=]?\s*([^\s,;]+)", src,
                           _re.IGNORECASE)
            if m:
                return m.group(1)
            if "number" in seek.lower() or "amount" in seek.lower():
                m = _re.search(r"-?\d+(\.\d+)?", src)
                return m.group(0) if m else None
            return None

        fn = live if endpoint else (lambda s: one(s))
        return batch.map(lambda s: fn(s or ""))

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf inspector can't resolve — set them as real objects
    extract.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    extract_udf = pandas_udf(extract, "string")

    return df.withColumn(out_col, extract_udf(F.col(text_col)))
