"""Canonical, interoperable AST serialization (parity with the reference's
rwast exchange form — reference: rwast.cljc:17-27 type2name table; the node
vocabulary matches: Conditional / FieldAccess / FnCall / BinaryExp / FnDef /
VarDef / KVpair / Array / Object / FilterExp / MapExp).

``to_rwast(parse(src))`` produces JSON-able dicts; ``from_rwast`` restores
an evaluatable AST — round-trip tested.
"""

from __future__ import annotations

from typing import Any

from . import ast as A


def to_rwast(node: A.Node) -> Any:
    t = type(node).__name__
    if isinstance(node, A.Lit):
        return node.value if not isinstance(node.value, (list, dict)) else {
            "type": "Literal", "value": node.value}
    if isinstance(node, A.RegexLit):
        return {"type": "Regex", "pattern": node.pattern, "flags": node.flags}
    if isinstance(node, A.Var):
        return {"type": "VarRef", "name": node.name}
    if isinstance(node, A.QVar):
        return {"type": "QueryVar", "name": node.name}
    if isinstance(node, A.FieldRef):
        return {"type": "FieldAccess", "field": node.name}
    if isinstance(node, A.ArrayLit):
        return {"type": "Array", "elem": [to_rwast(i) for i in node.items]}
    if isinstance(node, A.ObjLit):
        return {"type": "Object",
                "kvPairs": [{"type": "KVpair", "key": to_rwast(k), "val": to_rwast(v)}
                            for k, v in node.pairs]}
    if isinstance(node, A.Block):
        return {"type": "StatementBlock", "body": [to_rwast(e) for e in node.exprs]}
    if isinstance(node, A.Assign):
        return {"type": "VarDef", "varName": node.name, "varValue": to_rwast(node.expr)}
    if isinstance(node, A.FunDef):
        return {"type": "FnDef", "params": list(node.params), "body": to_rwast(node.body)}
    if isinstance(node, A.Call):
        return {"type": "FnCall", "fnName": to_rwast(node.fn),
                "args": [to_rwast(a) for a in node.args]}
    if isinstance(node, A.BinOp):
        return {"type": "BinaryExp", "exp1": to_rwast(node.left), "bop": node.op,
                "exp2": to_rwast(node.right)}
    if isinstance(node, A.UnOp):
        return {"type": "UniOpExp", "uop": node.op, "exp": to_rwast(node.expr)}
    if isinstance(node, A.Cond):
        return {"type": "Conditional", "predicate": to_rwast(node.test),
                "exp1": to_rwast(node.then),
                "exp2": to_rwast(node.other) if node.other is not None else None}
    if isinstance(node, A.Path):
        return {"type": "PathExp", "steps": [_step_rwast(s) for s in node.steps]}
    if isinstance(node, A.QueryDef):
        return {"type": "QueryDef", "params": list(node.params),
                "patterns": [to_rwast(p) for p in node.patterns],
                "options": dict(node.options)}
    if isinstance(node, A.TriplePattern):
        return {"type": "QueryPattern", "db": node.db, "ent": to_rwast(node.e),
                "rel": to_rwast(node.a), "val": to_rwast(node.v)}
    if isinstance(node, A.PredPattern):
        return {"type": "QueryPredicate", "exp": to_rwast(node.call)}
    if isinstance(node, A.ExpressDef):
        return {"type": "ExpressDef", "params": list(node.params),
                "body": to_rwast(node.body), "options": dict(node.options)}
    if isinstance(node, A.KeyCall):
        return {"type": "ExpressKey", "exp": to_rwast(node.expr)}
    raise ValueError(f"no rwast mapping for {t}")


def _step_rwast(step: A.PathStep) -> dict:
    kind = {"get": "GetStep", "map": "MapExp", "value": "ValueStep",
            "reduce": "ReduceStep"}[step.kind]
    return {"type": kind, "exp": to_rwast(step.expr),
            "filters": [{"type": "FilterExp", "pred": to_rwast(f)}
                        for f in step.filters]}


def from_rwast(d: Any) -> A.Node:
    if not isinstance(d, dict):
        return A.Lit(d)
    t = d.get("type")
    if t == "Literal":
        return A.Lit(d["value"])
    if t == "Regex":
        return A.RegexLit(d["pattern"], d["flags"])
    if t == "VarRef":
        return A.Var(d["name"])
    if t == "QueryVar":
        return A.QVar(d["name"])
    if t == "FieldAccess":
        return A.FieldRef(d["field"])
    if t == "Array":
        return A.ArrayLit([from_rwast(x) for x in d["elem"]])
    if t == "Object":
        return A.ObjLit([(from_rwast(p["key"]), from_rwast(p["val"]))
                         for p in d["kvPairs"]])
    if t == "StatementBlock":
        return A.Block([from_rwast(x) for x in d["body"]])
    if t == "VarDef":
        return A.Assign(d["varName"], from_rwast(d["varValue"]))
    if t == "FnDef":
        return A.FunDef(list(d["params"]), from_rwast(d["body"]))
    if t == "FnCall":
        return A.Call(from_rwast(d["fnName"]), [from_rwast(a) for a in d["args"]])
    if t == "BinaryExp":
        return A.BinOp(d["bop"], from_rwast(d["exp1"]), from_rwast(d["exp2"]))
    if t == "UniOpExp":
        return A.UnOp(d["uop"], from_rwast(d["exp"]))
    if t == "Conditional":
        return A.Cond(from_rwast(d["predicate"]), from_rwast(d["exp1"]),
                      from_rwast(d["exp2"]) if d["exp2"] is not None else None)
    if t == "PathExp":
        return A.Path([_step_from(s) for s in d["steps"]])
    if t == "QueryDef":
        return A.QueryDef(list(d["params"]),
                          [from_rwast(p) for p in d["patterns"]],
                          dict(d.get("options") or {}))
    if t == "QueryPattern":
        return A.TriplePattern(d.get("db"), from_rwast(d["ent"]),
                               from_rwast(d["rel"]), from_rwast(d["val"]))
    if t == "QueryPredicate":
        return A.PredPattern(from_rwast(d["exp"]))
    if t == "ExpressDef":
        return A.ExpressDef(list(d["params"]), from_rwast(d["body"]),
                            dict(d.get("options") or {}))
    if t == "ExpressKey":
        return A.KeyCall(from_rwast(d["exp"]))
    raise ValueError(f"unknown rwast node {t}")


def _step_from(s: dict) -> A.PathStep:
    kind = {"GetStep": "get", "MapExp": "map", "ValueStep": "value",
            "ReduceStep": "reduce"}[s["type"]]
    return A.PathStep(from_rwast(s["exp"]),
                      [from_rwast(f["pred"]) for f in s.get("filters", [])],
                      kind)
