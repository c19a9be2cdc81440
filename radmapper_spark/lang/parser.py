"""Pratt parser for the RM language.

Grammar follows the reference's surface syntax (reference: parse.cljc
defparse rules :698-1287) with precedence per the reference table
(rewrite.cljc:698-719, inverted to binding powers: higher binds tighter):

    or < and < comparisons < in,~> < +,-,&,.. < *,/,% < path ops (.,[],{})

Unlike the reference's parse-then-rewrite pipeline, precedence is resolved
during parsing and path segments are gathered directly into `Path` nodes
(the reference does this in rewrite.cljc:551-584 `gather-steps`).
"""

from __future__ import annotations

from .ast import (
    ArrayLit, Assign, BinOp, Block, Call, Cond, ExpressDef, FieldRef, FunDef,
    KeyCall, Lit, Node, ObjLit, Path, PathStep, PatternSplice, PredPattern,
    QVar, QueryDef, RegexLit, RuleCall, RuleDef, TriplePattern, UnOp, Var,
)
from .tokens import Tok, tokenize

BP = {
    "or": 10, "and": 15,
    "<": 20, "<=": 20, ">": 20, ">=": 20, "=": 20, "!=": 20,
    "in": 25, "~>": 25,
    "+": 30, "-": 30, "&": 30, "..": 30,
    "*": 40, "/": 40, "%": 40,
    ".": 80, "[": 80, "{": 80, "(": 90,
}

RIGHT_ASSOC: set[str] = set()


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers --
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_op(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.val in vals

    def at_kw(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "keyword" and t.val in vals

    def expect_op(self, val: str) -> Tok:
        t = self.next()
        if t.kind != "op" or t.val != val:
            raise ParseError(f"expected {val!r}, got {t.kind}:{t.val!r} at {t.pos}")
        return t

    # -- entry --
    def parse_program(self) -> Node:
        e = self.parse_expr(0)
        t = self.peek()
        if t.kind != "eof":
            raise ParseError(f"trailing input at {t.pos}: {t.kind}:{t.val!r}")
        return e

    # -- Pratt core --
    def parse_expr(self, min_bp: int) -> Node:
        left = self.parse_prefix()
        while True:
            t = self.peek()
            if t.kind == "op" and t.val == "?" and min_bp <= 5:
                self.next()
                then = self.parse_expr(6)
                other = None
                if self.at_op(":"):
                    self.next()
                    other = self.parse_expr(6)
                left = Cond(left, then, other)
                continue
            op = None
            if t.kind == "op" and t.val in BP:
                op = t.val
            elif t.kind == "keyword" and t.val in BP:
                op = t.val
            if op is None:
                return left
            bp = BP[op]
            if bp < min_bp:
                return left
            if op == ".":
                self.next()
                left = self.parse_path_step(left)
                continue
            if op == "[":
                # postfix filter — binds to the last path step
                if not self._filter_ahead():
                    return left
                self.next()
                pred = self.parse_expr(0)
                self.expect_op("]")
                left = self.attach_filter(left, pred)
                continue
            if op == "{":
                self.next()
                obj = self.parse_object_body()
                left = self.make_reduce_step(left, obj)
                continue
            if op == "(":
                if not isinstance(left, (Var, FunDef, QueryDef, ExpressDef, Call)):
                    return left
                self.next()
                args = self.parse_args()
                left = Call(left, args)
                continue
            self.next()
            rhs = self.parse_expr(bp if op in RIGHT_ASSOC else bp + 1)
            left = BinOp(op, left, rhs)

    def _filter_ahead(self) -> bool:
        """'[' after a complete expression is a filter; a standalone array
        literal can only appear in prefix position, so this is always true
        here."""
        return True

    # -- prefix / primaries --
    def parse_prefix(self) -> Node:
        t = self.peek()
        if t.kind == "num":
            self.next()
            return Lit(t.val)
        if t.kind == "str":
            self.next()
            # a string can head a path ('a'.x is rare but legal as field?) — keep literal
            return Lit(t.val)
        if t.kind == "regex":
            self.next()
            return RegexLit(t.val[0], t.val[1])
        if t.kind == "keyword":
            if t.val == "true":
                self.next()
                return Lit(True)
            if t.val == "false":
                self.next()
                return Lit(False)
            if t.val == "null":
                self.next()
                return Lit(None)
            if t.val == "function":
                return self.parse_function()
            if t.val == "query":
                return self.parse_query()
            if t.val == "express":
                return self.parse_express()
            if t.val == "rule":
                return self.parse_rule()
            if t.val == "key":
                self.next()
                self.expect_op("(")
                inner = self.parse_expr(0)
                self.expect_op(")")
                return KeyCall(inner)
            raise ParseError(f"unexpected keyword {t.val} at {t.pos}")
        if t.kind == "var":
            self.next()
            v = Var(t.val)
            if self.at_op("(") :
                self.next()
                args = self.parse_args()
                return Call(v, args)
            if self.at_op(":="):
                self.next()
                expr = self.parse_expr(6)
                return Assign(t.val, expr)
            return v
        if t.kind == "qvar":
            self.next()
            return QVar(t.val)
        if t.kind == "ident":
            self.next()
            return FieldRef(t.val)
        if t.kind == "op":
            if t.val == "(":
                self.next()
                exprs = [self.parse_expr(0)]
                while self.at_op(";"):
                    self.next()
                    if self.at_op(")"):
                        break
                    exprs.append(self.parse_expr(0))
                self.expect_op(")")
                return exprs[0] if len(exprs) == 1 else Block(exprs)
            if t.val == "[":
                self.next()
                items = []
                if not self.at_op("]"):
                    items.append(self.parse_expr(0))
                    while self.at_op(","):
                        self.next()
                        items.append(self.parse_expr(0))
                self.expect_op("]")
                return ArrayLit(items)
            if t.val == "{":
                self.next()
                return self.parse_object_body()
            if t.val == "-":
                self.next()
                return UnOp("-", self.parse_expr(45))
            if t.val == "+":
                self.next()
                return self.parse_expr(45)
        raise ParseError(f"unexpected token {t.kind}:{t.val!r} at {t.pos}")

    def parse_args(self) -> list:
        args = []
        if not self.at_op(")"):
            args.append(self.parse_expr(0))
            while self.at_op(","):
                self.next()
                args.append(self.parse_expr(0))
        self.expect_op(")")
        return args

    def parse_object_body(self) -> ObjLit:
        """Caller consumed '{'. Parses pairs up to '}'."""
        pairs = []
        if not self.at_op("}"):
            while True:
                k = self.parse_expr(6)
                self.expect_op(":")
                v = self.parse_expr(6)
                pairs.append((k, v))
                if self.at_op(","):
                    self.next()
                    continue
                break
        self.expect_op("}")
        return ObjLit(pairs)

    # -- paths --
    def parse_path_step(self, left: Node) -> Path:
        path = left if isinstance(left, Path) else Path([PathStep(left)])
        t = self.peek()
        if t.kind == "ident":
            self.next()
            step = PathStep(FieldRef(t.val))
        elif t.kind == "str":
            self.next()
            step = PathStep(FieldRef(t.val))
        elif t.kind == "qvar":
            # binding-set column access: $q($db).?name
            self.next()
            step = PathStep(FieldRef(t.val[1:]))
        elif t.kind == "var":
            self.next()
            v: Node = Var(t.val)
            if self.at_op("("):
                self.next()
                v = Call(v, self.parse_args())
            step = PathStep(v)
        elif t.kind == "op" and t.val == "(":
            self.next()
            exprs = [self.parse_expr(0)]
            while self.at_op(";"):
                self.next()
                if self.at_op(")"):
                    break
                exprs.append(self.parse_expr(0))
            self.expect_op(")")
            inner = exprs[0] if len(exprs) == 1 else Block(exprs)
            step = PathStep(inner, kind="map")
        elif t.kind == "op" and t.val == "[":
            # value-step: .[expr,...] produces an ARRAY per element
            # (reference rewrite.cljc:341-365 wraps the body in a vector)
            self.next()
            items = []
            if not self.at_op("]"):
                items.append(self.parse_expr(0))
                while self.at_op(","):
                    self.next()
                    items.append(self.parse_expr(0))
            self.expect_op("]")
            step = PathStep(ArrayLit(items), kind="value")
        elif t.kind == "op" and t.val == "{":
            self.next()
            obj = self.parse_object_body()
            step = PathStep(obj, kind="map")
        elif t.kind == "num":
            raise ParseError(f"number cannot follow '.' at {t.pos}")
        else:
            raise ParseError(f"bad path step at {t.pos}: {t.kind}:{t.val!r}")
        return Path(path.steps + [step])

    def attach_filter(self, left: Node, pred: Node) -> Node:
        if isinstance(left, Path):
            steps = list(left.steps)
            last = steps[-1]
            steps[-1] = PathStep(last.expr, last.filters + [pred], last.kind)
            return Path(steps)
        return Path([PathStep(left, [pred])])

    def make_reduce_step(self, left: Node, obj: ObjLit) -> Node:
        step = PathStep(obj, kind="reduce")
        if isinstance(left, Path):
            return Path(left.steps + [step])
        return Path([PathStep(left), step])

    # -- function / query / express --
    def parse_function(self) -> FunDef:
        self.next()  # 'function'
        self.expect_op("(")
        params = []
        if not self.at_op(")"):
            t = self.next()
            if t.kind != "var":
                raise ParseError(f"function param must be $var at {t.pos}")
            params.append(t.val)
            while self.at_op(","):
                self.next()
                t = self.next()
                if t.kind != "var":
                    raise ParseError(f"function param must be $var at {t.pos}")
                params.append(t.val)
        self.expect_op(")")
        self.expect_op("{")
        body = self.parse_expr(0)
        self.expect_op("}")
        return FunDef(params, body)

    def _parse_param_list(self) -> list:
        params = []
        if self.at_op("("):
            self.next()
            if not self.at_op(")"):
                t = self.next()
                if t.kind != "var":
                    raise ParseError(f"param must be $var at {t.pos}")
                params.append(t.val)
                while self.at_op(","):
                    self.next()
                    t = self.next()
                    params.append(t.val)
            self.expect_op(")")
        return params

    def _parse_options(self) -> dict:
        opts: dict = {}
        if self.at_op("<|"):
            self.next()
            while not self.at_op("|>"):
                t = self.next()
                if t.kind not in ("ident", "str"):
                    raise ParseError(f"bad option key at {t.pos}")
                self.expect_op(":")
                v = self.parse_expr(6)
                if not isinstance(v, Lit):
                    raise ParseError(f"option value must be literal at {t.pos}")
                opts[t.val] = v.value
                if self.at_op(","):
                    self.next()
            self.expect_op("|>")
        return opts

    def parse_query(self) -> QueryDef:
        self.next()  # 'query'
        params = self._parse_param_list()
        self.expect_op("{")
        patterns = []
        while not self.at_op("}"):
            if self.at_op("["):
                patterns.append(self.parse_pattern())
            else:
                # expression in pattern position: its VALUE supplies the
                # patterns — query{$qIdent($data)} (reference
                # query_test.cljc:1056-1062 ident-code)
                patterns.append(PatternSplice(self.parse_expr(0)))
            if self.at_op(","):
                self.next()
        self.expect_op("}")
        opts = self._parse_options()
        return QueryDef(params, patterns, opts)

    def parse_rule(self) -> RuleDef:
        """rule{(name ?a ...) [clause]*} — reference parse.cljc:1168-1206."""
        self.next()  # 'rule'
        self.expect_op("{")
        self.expect_op("(")
        name = self._rule_name()
        args = []
        while not self.at_op(")"):
            t = self.next()
            if t.kind != "qvar":
                raise ParseError(f"rule head args must be qvars, got {t.val!r} at {t.pos}")
            args.append(t.val)
        self.next()  # ')'
        clauses = []
        while not self.at_op("}"):
            clauses.append(self.parse_pattern())
        self.expect_op("}")
        return RuleDef(name, args, clauses)

    def _rule_name(self) -> str:
        t = self.next()
        if t.kind not in ("ident", "keyword"):
            raise ParseError(f"expected rule name at {t.pos}")
        name = str(t.val)
        if self.at_op("?"):  # datalog-style predicate names: twitter?
            self.next()
            name += "?"
        return name

    def parse_pattern(self) -> Node:
        self.expect_op("[")
        if self.at_op("("):
            self.next()
            # rule invocation form: (name ?x ...) — a bare ident followed
            # by qvars is not an RM expression, so detect it first
            if self.peek().kind == "ident":
                save = self.i
                try:
                    name = self._rule_name()
                    rargs = []
                    while not self.at_op(")"):
                        t = self.next()
                        if t.kind == "qvar":
                            rargs.append(QVar(t.val))
                        elif t.kind in ("num", "str"):
                            rargs.append(Lit(t.val))
                        else:
                            raise ParseError("not a rule call")
                    self.next()  # ')'
                    self.expect_op("]")
                    return RuleCall(name, rargs)
                except ParseError:
                    self.i = save
            call = self.parse_expr(0)
            self.expect_op(")")
            self.expect_op("]")
            if not isinstance(call, Call):
                raise ParseError("predicate pattern must be a function call")
            return PredPattern(call)
        parts = []
        while not self.at_op("]"):
            t = self.peek()
            if t.kind == "qvar":
                self.next()
                parts.append(QVar(t.val))
            elif t.kind == "op" and t.val == ":":
                # :attr or :ns/attr datalog attribute keyword
                self.next()
                name = self.next()
                if name.kind not in ("ident", "keyword"):
                    raise ParseError(f"expected attribute name at {name.pos}")
                attr = str(name.val)
                while self.at_op("/") or self.at_op(".") or self.at_op("-"):
                    sep = self.next().val
                    nxt = self.next()
                    attr += sep + str(nxt.val)
                parts.append(Lit(":" + attr))
            elif t.kind == "kw":
                self.next()
                parts.append(Lit(t.val))
            elif t.kind == "var":
                self.next()
                parts.append(Var(t.val))
            elif t.kind in ("num", "str"):
                self.next()
                parts.append(Lit(t.val))
            elif t.kind == "keyword" and t.val in ("true", "false"):
                self.next()
                parts.append(Lit(t.val == "true"))
            elif t.kind == "op" and t.val == ".":
                # :a.b attr written without keyword colon — not supported
                raise ParseError(f"bad pattern element at {t.pos}")
            elif t.kind == "ident":
                self.next()
                parts.append(Lit(":" + t.val))
            else:
                raise ParseError(f"bad pattern element {t.kind}:{t.val!r} at {t.pos}")
        self.expect_op("]")
        db = None
        if parts and isinstance(parts[0], Var):
            db = parts[0].name
            parts = parts[1:]
        if len(parts) == 2:
            # [?e :attr] existence pattern — bind value to fresh ignored var
            parts = parts + [QVar("?_")]
        if len(parts) != 3:
            raise ParseError(f"triple pattern needs 3 elements, got {len(parts)}")
        return TriplePattern(db, parts[0], parts[1], parts[2])

    def parse_express(self) -> ExpressDef:
        self.next()  # 'express'
        params = self._parse_param_list()
        self.expect_op("{")
        body = self.parse_expr(0)
        self.expect_op("}")
        opts = self._parse_options()
        return ExpressDef(params, body, opts)


def parse(src: str) -> Node:
    return Parser(src).parse_program()
