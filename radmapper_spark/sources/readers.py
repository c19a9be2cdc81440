"""`$get` / `$put` / `$getSpreadsheet` sources (SURVEY.md §2.1).

`$get` forms supported:
- path string ending .json/.edn-like  -> parsed JSON document (driver side)
- path ending .xml                    -> simplified XML -> nested maps
- path ending .parquet / 'table://x'  -> SparkDB over spark.read.parquet
- [ident, val] pair                   -> catalog lookup (library table)

The reference reads local JSON/XML/EDN (builtin.cljc:1528-1596) and a
codelib DB via pathom resolvers; here the codelib is a JSON catalog file
(driver) — a Delta/parquet table on a real deployment.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from ..lang.values import JSeq, NOMATCH

CATALOG_PATH = os.environ.get("RM_CATALOG_PATH", "/tmp/rm_catalog.json")


def rm_get(ip, target, opts=None):
    from ..operators.spark_bridge import SparkDB
    if isinstance(target, str):
        if target.startswith("table://"):
            name = target[len("table://"):]
            if ip.spark is None:
                raise ValueError("$get(table://) needs a SparkSession")
            from ..session import DEFAULT_SF_DIR, load_tables
            return SparkDB(load_tables(ip.spark, DEFAULT_SF_DIR)[name], name)
        if target.endswith(".parquet"):
            if ip.spark is None:
                raise ValueError("$get(.parquet) needs a SparkSession")
            ip.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return SparkDB(ip.spark.read.parquet(target))
        if target.endswith(".json"):
            with open(target) as f:
                return json.load(f)
        if target.endswith(".xml"):
            return read_xml(target)
        if target.endswith(".edn"):
            from .edn import load_file
            return load_file(target)
        raise ValueError(f"$get: unsupported source {target!r}")
    if isinstance(target, (list, JSeq)):
        return catalog_get(list(target), opts)
    raise ValueError(f"$get: unsupported target {target!r}")


def read_xml(path: str):
    """XML -> simplified nested maps (reference util.cljc:206-217
    simplify-xml: tag -> key, attrs merged, repeated children -> arrays)."""
    import xml.etree.ElementTree as ET
    root = ET.parse(path).getroot()
    return {_tag(root): _simplify(root)}


def _tag(el) -> str:
    t = el.tag
    return t.split("}", 1)[1] if "}" in t else t


def _simplify(el):
    children = list(el)
    if not children and not el.attrib:
        return (el.text or "").strip()
    out: dict = {}
    for k, v in el.attrib.items():
        out[k] = v
    for c in children:
        key = _tag(c)
        v = _simplify(c)
        if key in out:
            if not isinstance(out[key], list):
                out[key] = [out[key]]
            out[key].append(v)
        else:
            out[key] = v
    text = (el.text or "").strip()
    if text and not children:
        out["_text"] = text
    return out


# ------------------------------------------------------------- catalog

def _load_catalog() -> dict:
    if os.path.exists(CATALOG_PATH):
        with open(CATALOG_PATH) as f:
            return json.load(f)
    return {}


def catalog_get(ident: list, props=None):
    cat = _load_catalog()
    key = f"{ident[0]}={ident[1]}" if len(ident) > 1 else str(ident[0])
    obj = cat.get(key)
    if obj is None:
        return NOMATCH
    if props:
        return {k: v for k, v in obj.items() if k in props}
    return obj


def rm_put(ip, target, obj):
    cat = _load_catalog()
    key = f"{target[0]}={target[1]}" if len(target) > 1 else str(target[0])
    cat[key] = obj
    with open(CATALOG_PATH, "w") as f:
        json.dump(cat, f)
    return obj


# ------------------------------------------------------------- spreadsheet

def read_spreadsheet(path: str, sheet=None, invert: bool = False):
    """.xlsx rows -> maps keyed by header names (reference
    builtin.cljc:1626-1675). Falls back to csv for .csv files."""
    try:
        import pandas as pd
    except ImportError as exc:  # pragma: no cover
        raise ValueError("$getSpreadsheet needs pandas") from exc
    if path.endswith(".csv"):
        df = pd.read_csv(path)
    else:
        df = pd.read_excel(path, sheet_name=sheet or 0)
    if invert:
        df = df.T.reset_index()
        df.columns = [str(c) for c in df.iloc[0]]
        df = df.iloc[1:]
    return [
        {str(k): (v.item() if hasattr(v, "item") else v) for k, v in row.items()
         if not (isinstance(v, float) and v != v)}
        for row in df.to_dict(orient="records")
    ]
