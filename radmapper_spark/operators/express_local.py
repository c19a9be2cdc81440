"""`express{}` instantiation and `$reduce` deep-merge (driver side).

Reference semantics (builtin.cljc:1865-2209, query.cljc:186-242): an
express body is a JSON template over query variables; `$map` instantiates
one document per binding set; `$reduce` merges all instantiated documents —
objects sharing the same `key(?q)` value (within the same template path)
merge; qvar-in-key-position maps union their keys; keyed arrays come out
sorted by key value. The reference does this by transacting into a fresh
Datahike DB with unique-identity concatenated keys; here it is a plain
recursive merge (and on a binding-set DataFrame, a groupBy cascade —
operators/express_spark.py).
"""

from __future__ import annotations

from typing import Any

from ..lang import ast as A
from ..lang.values import JSeq, NOMATCH, is_nomatch, jflatten


class Keyed(dict):
    """An instantiated keyed-array: {key_value: instantiated_obj}; rendered
    as a sorted array after merging."""

    __slots__ = ()


class QvarMap(dict):
    """An instantiated qvar-in-key-position map; merges by key union."""

    __slots__ = ()


def _bset_env(ip, e, bset: dict):
    frame = {}
    for k, v in bset.items():
        frame["?" + str(k).lstrip("?")] = v
    if e.param_subs:
        frame.update(e.param_subs)
    return e.env.child(frame)


def instantiate_body(ip, e, bset: dict, keyed: bool):
    """Instantiate the express body for one binding set. With keyed=True the
    result keeps Keyed/QvarMap wrappers for merging."""
    env = _bset_env(ip, e, bset)
    out = _inst(ip, e.body, env, keyed)
    return _strip_wrappers(out) if not keyed else out


def _inst(ip, node: A.Node, env, keyed: bool):
    if isinstance(node, A.ObjLit):
        has_qvar_key = any(isinstance(k, A.QVar) for k, _ in node.pairs)
        out: dict = QvarMap() if (has_qvar_key and keyed) else {}
        for k_node, v_node in node.pairs:
            k = jflatten(ip.eval(k_node, env))
            if is_nomatch(k):
                continue
            v = _inst(ip, v_node, env, keyed)
            if is_nomatch(v):
                continue
            out[k] = v
        return out
    if isinstance(node, A.ArrayLit):
        items = []
        key_vals = []
        for item in node.items:
            v = _inst(ip, item, env, keyed)
            if is_nomatch(v):
                continue
            kv = _find_key_value(ip, item, env) if keyed else None
            key_vals.append(kv)
            items.append(v)
        if keyed and items and all(kv is not None for kv in key_vals):
            kd = Keyed()
            for kv, v in zip(key_vals, items):
                kd[_hashable(kv)] = v
            return kd
        return items
    if isinstance(node, A.KeyCall):
        return jflatten(ip.eval(node.expr, env))
    # any other expression: evaluate with qvars bound
    v = jflatten(ip.eval(node, env))
    if isinstance(v, JSeq):
        v = list(v)
    return v


def _find_key_value(ip, node: A.Node, env):
    """If node is an object template containing a key(?x) attribute
    (possibly nested under non-key attrs at this level), return the key
    value for identity-based merging."""
    if not isinstance(node, A.ObjLit):
        return None
    for k_node, v_node in node.pairs:
        if isinstance(v_node, A.KeyCall):
            return jflatten(ip.eval(v_node.expr, env))
    return None


def _hashable(v):
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((str(k), _hashable(x)) for k, x in v.items()))
    return v


def _merge(a, b):
    if isinstance(a, Keyed) and isinstance(b, Keyed):
        out = Keyed(a)
        for k, v in b.items():
            out[k] = _merge(out[k], v) if k in out else v
        return out
    if isinstance(a, QvarMap) and isinstance(b, QvarMap):
        out = QvarMap(a)
        for k, v in b.items():
            out[k] = _merge(out[k], v) if k in out else v
        return out
    if isinstance(a, dict) and isinstance(b, dict) and not isinstance(a, (Keyed, QvarMap)):
        out = dict(a)
        for k, v in b.items():
            out[k] = _merge(out[k], v) if k in out else v
        return out
    if isinstance(a, list) and isinstance(b, list):
        out = list(a)
        for x in b:
            if not any(_deep_eq_strip(x, y) for y in out):
                out.append(x)
        return out
    return b


def _deep_eq_strip(a, b) -> bool:
    from ..lang.values import deep_eq
    return deep_eq(_strip_wrappers(a), _strip_wrappers(b))


def _sort_key(v):
    if isinstance(v, bool):
        return (2, str(v))
    if isinstance(v, (int, float)):
        return (0, v)
    if isinstance(v, str):
        return (1, v)
    return (3, str(v))


def _strip_wrappers(v):
    """Keyed -> sorted array; QvarMap -> plain dict (sorted by key)."""
    if isinstance(v, Keyed):
        return [_strip_wrappers(v[k]) for k in sorted(v.keys(), key=_sort_key)]
    if isinstance(v, QvarMap):
        return {k: _strip_wrappers(v[k]) for k in sorted(v.keys(), key=_sort_key)}
    if isinstance(v, dict):
        return {k: _strip_wrappers(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_strip_wrappers(x) for x in v]
    return v


def reduce_express(ip, bsets, e):
    """$reduce(bsets, expressFn): merge per-bset instantiations.

    A TOP-LEVEL Type-1 body (literal keys with a direct key() mark, not
    wrapped in an array) groups by its key() qvar values: one output
    document per distinct key tuple, a VECTOR (sorted by key) when there
    is more than one group (reference query_test.cljc:1013-1024 'produces
    a vector'; the single-group case stays a bare map)."""
    from .spark_bridge import SparkBindingSets
    if isinstance(bsets, SparkBindingSets):
        from .express_spark import reduce_express_spark
        return reduce_express_spark(ip, bsets, e)
    from ..lang.values import as_array
    items = as_array(bsets)
    top_keys = [v for _k, v in e.body.pairs
                if isinstance(v, A.KeyCall)] if isinstance(e.body, A.ObjLit) else []
    if top_keys:
        groups: dict = {}
        for b in items:
            if not isinstance(b, dict):
                continue
            env = _bset_env(ip, e, b)
            kt = tuple(_hashable(jflatten(ip.eval(kc.expr, env)))
                       for kc in top_keys)
            doc = instantiate_body(ip, e, b, keyed=True)
            groups[kt] = doc if kt not in groups else _merge(groups[kt], doc)
        if not groups:
            return NOMATCH
        if len(groups) == 1:
            return _strip_wrappers(next(iter(groups.values())))
        return [_strip_wrappers(groups[k])
                for k in sorted(groups, key=lambda t: tuple(_sort_key(x) for x in t))]
    acc = None
    for b in items:
        if not isinstance(b, dict):
            continue
        doc = instantiate_body(ip, e, b, keyed=True)
        acc = doc if acc is None else _merge(acc, doc)
    if acc is None:
        return NOMATCH
    return _strip_wrappers(acc)


def e_ident(ip, data):
    """Generate the identity express body for data captured by $qIdent
    (reference builtin.cljc:2290-2304)."""
    vcnt = [0]

    def ei(obj):
        if isinstance(obj, dict):
            pairs = []
            for k, v in obj.items():
                if isinstance(v, dict):
                    pairs.append((A.Lit(str(k)), ei(v)))
                else:
                    vcnt[0] += 1
                    pairs.append((A.Lit(str(k)), A.QVar(f"?v{vcnt[0]}")))
            return A.ObjLit(pairs)
        vcnt[0] += 1
        return A.QVar(f"?v{vcnt[0]}")

    from ..lang.interp import ExpressFnV, Env
    body = ei(data if isinstance(data, dict) else (data[0] if isinstance(data, (list, JSeq)) and data else {}))
    return ExpressFnV([], body, {}, Env({"$": NOMATCH, "$$": NOMATCH}))
