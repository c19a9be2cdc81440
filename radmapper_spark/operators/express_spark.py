"""`express{}` + `$reduce` over a binding-set DataFrame: groupBy cascade.

SURVEY.md §2.6: the express template is a nesting spec. Each `key(?q)` /
qvar-in-key-position level becomes one groupBy on the concatenated ancestor
keys (the reference's concatenated :redex/express-key, query.cljc:244-266);
children aggregate with sort_array(collect_list(struct(...))), qvar-keyed
maps with map_from_entries. The whole document is ONE Spark job of chained
aggregations — no driver-side merge loop. Partial aggregation is map-side,
and each successive level shrinks the data, so the cascade scales with the
number of distinct key paths, not binding sets.

`$map(bsets, express)` is the shuffle-free variant: a single select() of a
nested struct per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lang import ast as A
from .spark_bridge import SparkBindingSets


# ---------------------------------------------------------------- spec

@dataclass
class Field:
    qvar: str
    is_key: bool = False


@dataclass
class Const:
    value: Any


@dataclass
class StaticObj:
    entries: list  # list[(name, spec)]


@dataclass
class KeyedArray:
    key_var: str
    elem: "StaticObj"


@dataclass
class QvarMap:
    key_var: str
    val: Any


def analyze(node: A.Node):
    """Express body AST -> nesting spec."""
    if isinstance(node, A.ObjLit):
        qvar_keys = [k for k, _ in node.pairs if isinstance(k, A.QVar)]
        if qvar_keys:
            if len(node.pairs) != 1:
                raise ValueError("qvar-in-key-position object must have one entry")
            k, v = node.pairs[0]
            return QvarMap(k.name[1:], analyze(v))
        return StaticObj([(k.value if isinstance(k, A.Lit) else str(k), analyze(v))
                          for k, v in node.pairs])
    if isinstance(node, A.ArrayLit):
        if len(node.items) == 1 and isinstance(node.items[0], A.ObjLit):
            elem = analyze(node.items[0])
            if isinstance(elem, StaticObj):
                kv = _find_key(elem)
                if kv is not None:
                    return KeyedArray(kv, elem)
        return Const([analyze(i) for i in node.items])
    if isinstance(node, A.KeyCall):
        if not isinstance(node.expr, A.QVar):
            raise ValueError("key() must wrap a query variable")
        return Field(node.expr.name[1:], is_key=True)
    if isinstance(node, A.QVar):
        return Field(node.name[1:])
    if isinstance(node, A.Lit):
        return Const(node.value)
    raise ValueError(f"unsupported express template node {type(node).__name__}")


def _find_key(obj: StaticObj) -> Optional[str]:
    for _name, spec in obj.entries:
        if isinstance(spec, Field) and spec.is_key:
            return spec.qvar
    return None


def _qvars_of(spec) -> set:
    if isinstance(spec, Field):
        return {spec.qvar}
    if isinstance(spec, StaticObj):
        out = set()
        for _n, s in spec.entries:
            out |= _qvars_of(s)
        return out
    if isinstance(spec, KeyedArray):
        return {spec.key_var} | _qvars_of(spec.elem)
    if isinstance(spec, QvarMap):
        return {spec.key_var} | _qvars_of(spec.val)
    return set()


def _has_group(spec) -> bool:
    if isinstance(spec, (KeyedArray, QvarMap)):
        return True
    if isinstance(spec, StaticObj):
        return any(_has_group(s) for _n, s in spec.entries)
    return False


# ---------------------------------------------------------------- compile

class _Builder:
    def __init__(self, base: DataFrame):
        self.base = base
        self.n = 0

    def fresh(self) -> str:
        self.n += 1
        return f"_v{self.n}"

    def build(self, spec, parent_keys: list) -> tuple[DataFrame, str]:
        """Return (frame keyed by parent_keys, value column name)."""
        if isinstance(spec, KeyedArray):
            child, vcol = self.build(spec.elem, parent_keys + [spec.key_var])
            out = self.fresh()
            g = child.groupBy(*parent_keys) if parent_keys else child.groupBy()
            # collect_SET + sort_array: dedupe (b-set semantics) happens in
            # the same aggregation as the collect — one shuffle per level
            # instead of distinct + collect_list's two
            agg = g.agg(
                F.transform(
                    F.sort_array(F.collect_set(F.struct(
                        F.col(spec.key_var).alias("k"), F.col(vcol).alias("v")))),
                    lambda x: x.v,
                ).alias(out)
            )
            return agg, out
        if isinstance(spec, QvarMap):
            child, vcol = self.build(spec.val, parent_keys + [spec.key_var])
            out = self.fresh()
            g = child.groupBy(*parent_keys) if parent_keys else child.groupBy()
            agg = g.agg(
                F.map_from_entries(
                    F.sort_array(F.collect_set(F.struct(
                        F.col(spec.key_var).alias("k"), F.col(vcol).alias("v"))))
                ).alias(out)
            )
            return agg, out
        if isinstance(spec, StaticObj):
            scalar_entries = [(n, s) for n, s in spec.entries if not _has_group(s)]
            group_entries = [(n, s) for n, s in spec.entries if _has_group(s)]
            scalar_qvars = sorted({q for _n, s in scalar_entries for q in _qvars_of(s)})
            need = sorted(set(parent_keys) | set(scalar_qvars))
            if not group_entries:
                # leaf level: no distinct here — the parent's collect_set
                # dedupes in the same shuffle (the leaf is the big frame;
                # a distinct would add a full extra exchange)
                frame = self.base.select(*need) if need else self.base.limit(1)
                out = self.fresh()
                fields = [self.scalar_col(s).alias(str(nm)) for nm, s in spec.entries]
                return frame.withColumn(out, F.struct(*fields)), out
            frame = self.base.select(*need).distinct() if need else None
            for _name, s in group_entries:
                child, vcol = self.build(s, parent_keys)
                if frame is None:
                    frame = child
                elif parent_keys:
                    frame = frame.join(child, on=parent_keys, how="left")
                else:
                    frame = frame.crossJoin(child)
                # remember the value column on the spec for assembly
                s._vcol = vcol  # type: ignore[attr-defined]
            out = self.fresh()
            fields = []
            for name, s in spec.entries:
                if _has_group(s):
                    fields.append(F.col(s._vcol).alias(str(name)))  # type: ignore[attr-defined]
                else:
                    fields.append(self.scalar_col(s).alias(str(name)))
            if frame is None:
                frame = self.base.limit(1)
            return frame.withColumn(out, F.struct(*fields)), out
        if isinstance(spec, Field):
            need = sorted(set(parent_keys) | {spec.qvar})
            frame = self.base.select(*need)  # deduped by parent collect_set
            return frame, spec.qvar
        if isinstance(spec, Const):
            frame = (self.base.select(*parent_keys).distinct()
                     if parent_keys else self.base.limit(1))
            out = self.fresh()
            return frame.withColumn(out, self.scalar_col(spec)), out
        raise ValueError(f"cannot compile spec {spec}")

    def scalar_col(self, spec):
        if isinstance(spec, Field):
            return F.col(spec.qvar)
        if isinstance(spec, Const):
            if isinstance(spec.value, list):
                return F.array(*[self.scalar_col(s) for s in spec.value])
            return F.lit(spec.value)
        if isinstance(spec, StaticObj):
            return F.struct(*[self.scalar_col(s).alias(str(n)) for n, s in spec.entries])
        raise ValueError(f"not a scalar spec {spec}")


def _top_keys(spec) -> list:
    """Key qvars of a TOP-LEVEL Type-1 body (direct key() marks)."""
    if not isinstance(spec, StaticObj):
        return []
    return [s.qvar for _n, s in spec.entries
            if isinstance(s, Field) and s.is_key]


def reduce_express_frame(ip, bsets: SparkBindingSets, e) -> DataFrame:
    """The $reduce groupBy-cascade plan WITHOUT collecting: a DataFrame
    holding the assembled document(s) — one row per top-level key group
    for a Type-1 keyed body (mirrors express_local.reduce_express), one
    row otherwise."""
    spec = analyze(e.body)
    b = _Builder(bsets.df)
    frame, vcol = b.build(spec, [])
    keys = _top_keys(spec)
    if keys:
        return (frame.select(*keys, vcol).distinct().orderBy(*keys)
                .select(F.col(vcol).alias("doc")))
    return frame.select(F.col(vcol).alias("doc"))


import os as _os

# reduce_express_spark assembles the reference's document-shaped result on
# the DRIVER (that IS the semantics: $reduce returns a document, not a
# table). The collect is bounded by the number of distinct top-key groups,
# but a malformed template (e.g. keying on a near-unique column) could
# collect millions of rows at scale — cap it with a clear error and point
# at the distributed path. Overridable for callers that genuinely want
# huge documents.
MAX_REDUCE_DOCS = int(_os.environ.get("RM_MAX_REDUCE_DOCS", "100000"))


def reduce_express_spark(ip, bsets: SparkBindingSets, e):
    """$reduce(binding-set DataFrame, express) -> nested document(s):
    a vector of documents when a top-level Type-1 keyed body has more
    than one distinct key tuple (reference query_test.cljc:1013-1024).

    Driver-size guard: raises when the distinct top-key group count
    exceeds MAX_REDUCE_DOCS (env RM_MAX_REDUCE_DOCS) — use
    reduce_express_frame for the distributed document-per-row shape."""
    spec = analyze(e.body)
    b = _Builder(bsets.df)
    frame, vcol = b.build(spec, [])
    keys = _top_keys(spec)
    if keys:
        # limit+1 caps what can ever reach the driver: the collect itself
        # is bounded, and one extra row proves the overflow
        rows = (frame.select(*keys, vcol).distinct().orderBy(*keys)
                .limit(MAX_REDUCE_DOCS + 1).collect())
        if len(rows) > MAX_REDUCE_DOCS:
            raise ValueError(
                f"$reduce would assemble more than {MAX_REDUCE_DOCS} "
                f"top-level key groups on the driver; use "
                f"reduce_express_frame (document-per-row DataFrame) for "
                f"results this large, or raise RM_MAX_REDUCE_DOCS")
        docs = [_plain(r[vcol]) for r in rows]
        if not docs:
            return None
        return docs[0] if len(docs) == 1 else docs
    rows = frame.select(vcol).collect()
    if not rows:
        return None
    return _plain(rows[0][vcol])


def map_express_spark(ip, bsets: SparkBindingSets, e) -> DataFrame:
    """$map(binding-set DataFrame, express): one document per row —
    a pure projection, no shuffle."""
    spec = analyze(e.body)
    col = _row_col(spec)
    return bsets.df.select(col.alias("doc"))


def _row_col(spec):
    if isinstance(spec, Field):
        return F.col(spec.qvar)
    if isinstance(spec, Const):
        if isinstance(spec.value, list):
            return F.array(*[_row_col(s) for s in spec.value])
        return F.lit(spec.value)
    if isinstance(spec, StaticObj):
        return F.struct(*[_row_col(s).alias(str(n)) for n, s in spec.entries])
    if isinstance(spec, KeyedArray):
        return F.array(_row_col(spec.elem))
    if isinstance(spec, QvarMap):
        return F.create_map(F.col(spec.key_var), _row_col(spec.val))
    raise ValueError(f"cannot compile spec {spec}")


def _plain(v):
    """Row/struct -> plain Python."""
    from pyspark.sql import Row
    if isinstance(v, Row):
        return {k: _plain(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    return v
