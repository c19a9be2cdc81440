"""AST node types for the RM language.

The shapes mirror the reference's parse tree tags (reference:
parse.cljc :BinOpSeq/:ObjExp/:FnCall/:QueryDef/:ExpressDef and the rewrite
stage's :Path grouping, rewrite.cljc:551-584) but are plain Python
dataclasses produced directly by our Pratt parser — there is no separate
rewrite pass; precedence is resolved during parsing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


class Node:
    pass


@dataclass
class Lit(Node):
    value: Any


@dataclass
class RegexLit(Node):
    pattern: str
    flags: str


@dataclass
class Var(Node):
    name: str  # includes '$'; '$' itself = context, '$$' = root


@dataclass
class QVar(Node):
    name: str  # includes '?'


@dataclass
class FieldRef(Node):
    name: str


@dataclass
class ArrayLit(Node):
    items: list


@dataclass
class ObjLit(Node):
    pairs: list  # list[(Node, Node)]


@dataclass
class Block(Node):
    exprs: list


@dataclass
class Assign(Node):
    name: str
    expr: Node


@dataclass
class FunDef(Node):
    params: list  # ['$x', ...]
    body: Node


@dataclass
class Call(Node):
    fn: Node
    args: list


@dataclass
class BinOp(Node):
    op: str
    left: Node
    right: Node


@dataclass
class UnOp(Node):
    op: str
    expr: Node


@dataclass
class Cond(Node):
    test: Node
    then: Node
    other: Optional[Node]


# ---- paths ----

@dataclass
class PathStep(Node):
    """One step of a path; filters bind to the step (non-compositional
    a.b[i] semantics, reference builtin.cljc:206-236)."""
    expr: Node            # FieldRef | Var | Call | ParenExpr(map-step) | ...
    filters: list = field(default_factory=list)   # list[Node] predicates/indexes
    kind: str = "get"     # get | map (parenthesized) | value ([expr] step) | reduce ({} step)


@dataclass
class Path(Node):
    steps: list  # list[PathStep]; steps[0].expr is the head expression


# ---- query / express ----

@dataclass
class TriplePattern(Node):
    db: Optional[str]   # '$db' var name or None
    e: Node
    a: Node
    v: Node


@dataclass
class PredPattern(Node):
    call: Call


@dataclass
class PatternSplice(Node):
    """query{$qIdent($data)} — an expression in pattern position whose
    value (a query fn or pattern list) splices into the :where."""
    expr: Node


@dataclass
class QueryDef(Node):
    params: list        # parameter var names
    patterns: list      # TriplePattern | PredPattern | RuleCall
    options: dict = field(default_factory=dict)


@dataclass
class RuleDef(Node):
    """Named datalog rule: rule{(name ?a ...) [clauses...]}
    (reference parse.cljc:1168-1206; execution NYI there — here a rule is
    a reusable clause group, spliceable into query{} where-patterns)."""
    name: str
    args: list          # qvar names ['?c', ...]
    clauses: list       # TriplePattern list


@dataclass
class RuleCall(Node):
    """Rule invocation inside a query's :where — [(name ?x ...)]."""
    name: str
    args: list          # QVar | Lit nodes


@dataclass
class ExpressDef(Node):
    params: list
    body: Node          # ObjLit tree, possibly containing KeyCall / QVar
    options: dict = field(default_factory=dict)


@dataclass
class KeyCall(Node):
    expr: Node
